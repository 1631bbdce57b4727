#!/usr/bin/env python
"""Acceptance sweep: run a seeded random sample of the reference's own
stateless test files through the CH frontend and bucket the failures.

This mirrors the round-7 judge's acceptance measurement (80 files, seed
42): a file PASSES when every statement in it executes through ch_sql
without raising.  Output comparison is NOT attempted here — the driver's
oracle harness owns value correctness; this tool measures the DIALECT
SURFACE a migrating user hits on day one.

Usage:
    python tools/ref_sweep.py [N] [SEED] [--verbose]

Notes:
  * Statements are split on ';' outside quotes/comments (the reference's
    clickhouse-test does the same).
  * Files whose statements need server features that cannot exist here
    (remote(), cluster DDL 'ON CLUSTER', system.zookeeper, ...) still
    count as failures — the point is an honest number, not a flattering
    one.  A small skip-list exists only for NON-SQL content (shell test
    fixtures etc.).
"""

from __future__ import annotations

import glob
import os
import random
import re
import sys
import traceback
from collections import Counter

REF_DIR = "/root/reference/tests/queries/4_cnch_stateless"


def split_statements(sql: str, with_raw: bool = False):
    """Split on top-level ';' — quote- and comment-aware.  A
    clickhouse-test error annotation (``-- { serverError N }`` /
    ``{ clientError N }``) attaches to the statement it follows: the
    reference's own harness EXPECTS that statement to raise, so the sweep
    marks it with a leading ``--EXPECT_ERROR `` sentinel.  with_raw also
    returns each statement's RAW source segment (comments and blank
    lines included) for clickhouse-test echo mode."""
    out, cur = [], []
    raws: list[str] = []
    seg_start = 0
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            comment = sql[i : n if j < 0 else j]
            # the annotation must LEAD the comment: a commented-OUT
            # statement line `-- CREATE ...; -- { serverError N }` is
            # dead text, not an expectation on the previous statement
            # (01004_resource_manager_ddl)
            if re.match(r"--\s*\{\s*(serverError|clientError)", comment):
                if "".join(cur).strip():
                    cur.insert(0, "--EXPECT_ERROR ")  # pre-';' placement
                elif out and not out[-1].startswith("--EXPECT_ERROR "):
                    out[-1] = "--EXPECT_ERROR " + out[-1]  # post-';'
            i = n if j < 0 else j
            continue
        if c == "#":
            # MySQL-style line comment (the reference lexer accepts it)
            j = sql.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and sql[i : i + 2] == "//":
            # C++-style line comment (00943_test_bitmap_with_non_filter
            # uses them; quotes are handled below so URLs are safe)
            j = sql.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i)
            i = n if j < 0 else j + 2
            cur.append(" ")  # a comment separates tokens (ORDER/**/BY)
            continue
        if c in ("'", "`", '"'):
            q = c
            cur.append(c)
            i += 1
            while i < n:
                if sql[i] == "\\" and q == "'":
                    cur.append(sql[i : i + 2])
                    i += 2
                    continue
                cur.append(sql[i])
                if sql[i] == q:
                    if q == "'" and sql[i + 1 : i + 2] == "'":
                        cur.append("'")
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if c == ";":
            st = "".join(cur).strip()
            seg_end = i + 1
            if st:
                # echo mode prints trailing same-line comments too
                # (02006 `...; -- { serverError 43 }`)
                k = sql.find("\n", i + 1)
                line_rest = sql[i + 1:(n if k < 0 else k)]
                if re.match(r"\s*--", line_rest):
                    seg_end = n if k < 0 else k
                out.append(st)
                raws.append(sql[seg_start:seg_end])
            seg_start = seg_end
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    st = "".join(cur).strip()
    if st:
        out.append(st)
        raws.append(sql[seg_start:])
    if with_raw:
        return list(zip(out, raws))
    return out


class _F32(float):
    """Marker: this float came from a FloatType (float32) column — render
    with the shortest decimal that round-trips to float32, like the
    reference's Float32 serializeText (00745 `1.9`, not the double
    repr 1.899999976158142)."""


class _NTZ:
    """Marker: a TIMESTAMP_NTZ value (DateTime64/DateTimeWithoutTz) with
    its declared scale — CH renders a FIXED-width fraction (10081
    `.000000` at scale 6), never trimmed."""

    def __init__(self, dt, scale: int):
        self.dt = dt
        self.scale = scale


def ch_fmt_cell(v, nested: bool = False) -> str:
    """Render one value the way clickhouse-client's TabSeparated output
    does (reference src/Formats + DataTypes serializeText*): NULL -> \\N,
    integral floats without the .0, nested strings quoted, arrays/tuples
    in bracket/paren notation, datetimes second-resolution."""
    import datetime
    import decimal

    if v is None:
        # top-level TSV NULL is \N; inside tuples/arrays CH prints NULL
        return "NULL" if nested else "\\N"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, _NTZ):
        t = v.dt.strftime("%Y-%m-%d %H:%M:%S")
        if v.scale > 0:
            frac = f"{v.dt.microsecond:06d}"
            frac = (frac[: v.scale] if v.scale <= 6
                    else frac + "0" * (v.scale - 6))
            t += "." + frac
        return f"'{t}'" if nested else t
    if isinstance(v, float):
        if isinstance(v, _F32):
            import numpy as np

            # collapse to the float32-shortest value, then fall through
            # to the shared float text rules
            v = float(repr(np.float32(v)))
        if v != v:
            return "nan"
        if v == float("inf"):
            return "inf"
        if v == float("-inf"):
            return "-inf"
        if v == int(v) and abs(v) < 1e16:
            return str(int(v))
        r = repr(v)
        if "e" in r:  # CH prints 1e+20 as 1e20
            m, e = r.split("e")
            e = e.lstrip("+")
            if e.startswith("-"):
                e = "-" + e[1:].lstrip("0")
            else:
                e = e.lstrip("0")
            if m.endswith(".0"):
                m = m[:-2]
            r = f"{m}e{e}"
        return r
    if isinstance(v, decimal.Decimal):
        if v == v.to_integral_value():
            return str(int(v))
        return format(v.normalize(), "f")
    if isinstance(v, datetime.datetime):
        t = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            # DateTime64 fraction: trailing-zero-trimmed, min 3 digits
            # (scale-3 is the common reference declaration)
            frac = f"{v.microsecond:06d}".rstrip("0")
            t += "." + frac.ljust(3, "0")
        return f"'{t}'" if nested else t
    if isinstance(v, datetime.date):
        return f"'{v.isoformat()}'" if nested else v.isoformat()
    if isinstance(v, str):
        if nested:
            return ("'" + v.replace("\\", "\\\\").replace("'", "\\'")
                    .replace("\x00", "\\0") + "'")
        return (
            v.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("'", "\\'")
            .replace("\x00", "\\0")
        )
    if isinstance(v, (bytes, bytearray)):
        return ch_fmt_cell(v.decode("utf-8", "replace"), nested)
    if isinstance(v, list):
        return "[" + ",".join(ch_fmt_cell(x, True) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{ch_fmt_cell(k, True)}:{ch_fmt_cell(x, True)}"
            for k, x in v.items()
        ) + "}"
    if hasattr(v, "asDict"):  # Row / struct -> CH tuple
        vals = list(v)
        return "(" + ",".join(ch_fmt_cell(x, True) for x in vals) + ")"
    if isinstance(v, tuple):
        return "(" + ",".join(ch_fmt_cell(x, True) for x in v) + ")"
    return str(v)


_OUTPUT_STMT = re.compile(
    r"(?is)^\s*(SELECT|WITH|SHOW|DESCRIBE|DESC|EXISTS|CHECK|EXPLAIN|"
    r"CREATE\s+STATS)\b"
)
# FORMAT Null discards the result entirely (clickhouse-client prints
# nothing for it)
_FORMAT_NULL = re.compile(r"(?is)\bFORMAT\s+Null\s*;?\s*$")


def _ntz_scale(colname: str, st: str | None) -> int:
    """Declared DateTime64/DateTimeWithoutTz scale for an output column:
    the session DDL ledger knows table columns; a lone scale mentioned in
    the statement covers CAST expressions; CH default scale is 3."""
    try:
        from byconity_spark.frontend.sql import _TABLE_CH_DDL
        # the statement's own FROM tables take precedence — distinct
        # tables may declare the same column name at different scales
        froms = re.findall(r"(?i)\bFROM\s+`?(\w+)`?", st or "")
        ordered = [
            _TABLE_CH_DDL[t] for t in froms if t in _TABLE_CH_DDL
        ] + [d for n, d in _TABLE_CH_DDL.items() if n not in froms]
        for ddl in ordered:
            for name, ch_type, _k, _e in ddl.get("columns", ()):
                if name != colname or not ch_type:
                    continue
                m = re.search(
                    r"(?i)(?:DateTime64|DateTimeWithoutTz)\s*\(\s*(\d+)",
                    ch_type,
                )
                if m:
                    return int(m.group(1))
                if re.match(
                    r"(?i)\s*(?:Nullable\s*\(\s*)?"
                    r"(?:DateTime64|DateTimeWithoutTz)\b", ch_type
                ):
                    return 3  # declared without scale: CH default
    except Exception:
        pass
    if st:
        ms = set(re.findall(
            r"(?i)(?:DateTime64|DateTimeWithoutTz)\s*\(\s*(\d+)", st
        ) + re.findall(
            r"(?i)toDateTime64\s*\([^,()]*,\s*(\d+)", st
        ))
        if len(ms) == 1:
            return int(ms.pop())
    return 3


def _select_items(st: str) -> list:
    """Top-level select-list item texts of the statement's outermost
    SELECT (after WITH), split on depth-0 commas — used for per-column
    fraction-scale resolution."""
    depth, i, n = 0, 0, len(st)
    sel_end = None
    while i < n:
        c = st[i]
        if c == "'":
            j = i + 1
            while j < n and st[j] != "'":
                j += 1
            i = j + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0 and st[i:i + 6].upper() == "SELECT" and (
            i == 0 or not (st[i - 1].isalnum() or st[i - 1] == "_")
        ) and (i + 6 >= n or not (st[i + 6].isalnum()
                                  or st[i + 6] == "_")):
            sel_end = i + 6
        i += 1
    if sel_end is None:
        return []
    items, cur, depth, i = [], [], 0, sel_end
    while i < n:
        c = st[i]
        if c == "'":
            j = i + 1
            while j < n and st[j] != "'":
                j += 1
            cur.append(st[i:j + 1])
            i = j + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if depth == 0:
            if c == ",":
                items.append("".join(cur))
                cur = []
                i += 1
                continue
            m = re.match(
                r"(?i)(FROM|FORMAT|SETTINGS|ORDER|LIMIT|GROUP|HAVING|"
                r"WHERE|UNION|INTO)\b", st[i:],
            )
            if m and cur and not (st[i - 1].isalnum() or st[i - 1] == "_"):
                break
        cur.append(c)
        i += 1
    if cur and "".join(cur).strip():
        items.append("".join(cur))
    return [x.strip() for x in items]


_SECOND_PRECISION_HEADS = re.compile(
    r"(?i)\b(fromUnixTimestampMilli|fromUnixTimestamp|toDateTime|"
    r"now|toStartOf\w+|timeSlot)\s*\("
)


def _item_scale(item: str, st: str) -> "int | None":
    """Fraction scale of ONE select item: explicit DateTime64(N) /
    toDateTime64(..., N) wins; second-precision DateTime producers
    (fromUnixTimestampMilli, toDateTime, ...) are scale 0; bare alias
    identifiers resolve through their `expr AS name` definition.  None →
    caller falls back to the statement-level heuristic.  This keeps a
    statement that MIXES DateTime64 and DateTime outputs exact (01277:
    `dt64, fromUnixTimestampMilli(...)` renders `.345` then none)."""
    e = item.strip()
    # strip a trailing user alias
    e = re.sub(r"(?is)\s+AS\s+`?\w+`?\s*$", "", e)
    if re.fullmatch(r"\w+", e):
        m = re.search(
            rf"(?is)(\w+\s*\((?:[^()]|\([^()]*\))*\))\s+AS\s+{e}\b", st
        )
        if not m:
            return None
        e = m.group(1)
    m = re.search(
        r"(?i)(?:DateTime64|DateTimeWithoutTz)\s*\(\s*(\d+)", e
    ) or re.search(r"(?i)toDateTime64\s*\([^,()]*,\s*(\d+)", e)
    if m:
        return int(m.group(1))
    if re.search(r"(?i)\btoDateTime64\s*\(", e):
        return None
    if _SECOND_PRECISION_HEADS.search(
        re.sub(r"(?i)\btoUnixTimestamp\w*\s*\(", "(", e)
    ):
        return 0
    am = re.match(
        r"(?i)^(add|subtract)(Years|Quarters|Months|Weeks|Days|Hours|"
        r"Minutes|Seconds)\s*\(\s*(.*)$", e,
    )
    if am and re.match(
        r"(?i)^('|concat\s*\(|toFixedString\s*\(|toString\s*\()",
        am.group(3),
    ):
        # string datetime input → DateTime64(3) result (11662)
        return 3
    return None


def _ddl_scale(colname: str, st: "str | None") -> "int | None":
    """A column declared DateTime64(S) in a session table's CH DDL
    fixes the fraction width of its TIMESTAMP result even when the
    statement text never mentions DateTime64 (01947 SELECT *)."""
    if not st:
        return None
    try:
        from byconity_spark.frontend.sql import _TABLE_CH_DDL
    except Exception:
        return None
    words = set(re.findall(r"[A-Za-z_]\w*", st.lower()))
    for key, ddl in _TABLE_CH_DDL.items():
        if key.split(".")[-1].lower() not in words:
            continue
        for row in ddl.get("columns", ()):
            cn, ct = row[0], row[1]
            if cn == colname and ct:
                m = re.match(r"(?i)\s*DateTime64\s*\(\s*(\d+)", ct)
                if m:
                    return int(m.group(1))
    return None


def _schema_convs(schema, st: str | None):
    """Per-column value converters wrapping float32 leaves (_F32) and
    timestamp-ntz leaves (_NTZ) so ch_fmt_cell renders them the CH way;
    None = identity (zero overhead for the common case)."""
    from pyspark.sql.types import (ArrayType, FloatType, MapType,
                                   StructType, TimestampNTZType,
                                   TimestampType)

    # a DateTime64/toDateTime64 scale declared in the statement also
    # fixes the fraction width of tz'd TIMESTAMP results (01802
    # toDateTime64(..., 6, tz) renders .000000; scale 0 renders none)
    stmt_scale = None
    if st and re.search(
        r"(?i)toDateTime64\s*\(|DateTime64\s*\(\s*\d", st
    ):
        ms = set(re.findall(
            r"(?i)(?:DateTime64|DateTimeWithoutTz)\s*\(\s*(\d+)", st
        ) + re.findall(
            r"(?i)toDateTime64\s*\([^,()]*,\s*(\d+)", st
        ))
        if len(ms) == 1:
            stmt_scale = int(ms.pop())

    # explicit session_timezone: stored UTC walls render as the
    # session zone's wall clock (02738)
    sess_tz = None
    try:
        from byconity_spark.frontend.sql import _session_tz
        tzname = _session_tz()
        if tzname and tzname != "UTC":
            from zoneinfo import ZoneInfo
            sess_tz = ZoneInfo(tzname)
    except Exception:
        pass

    def _tz_shift(v):
        import datetime as _dtm
        return v.replace(tzinfo=_dtm.timezone.utc).astimezone(
            sess_tz
        ).replace(tzinfo=None)

    def conv(dt, scale, iscale=None):
        # iscale: this column's own select-item scale (01277 mixes
        # DateTime64(3) and second-precision DateTime in one SELECT —
        # the per-item resolution overrides the statement heuristic)
        ts_scale = iscale if iscale is not None else stmt_scale
        if isinstance(dt, FloatType):
            return lambda v: _F32(v) if isinstance(v, float) else v
        if isinstance(dt, TimestampNTZType):
            return lambda v: _NTZ(v, scale if iscale is None else iscale)
        if isinstance(dt, TimestampType) and sess_tz is not None:
            if ts_scale is not None and ts_scale > 0:
                return lambda v: _NTZ(_tz_shift(v), ts_scale)
            return _tz_shift
        if isinstance(dt, TimestampType) and ts_scale is not None:
            if ts_scale == 0:
                return None
            return lambda v: _NTZ(v, ts_scale)
        if isinstance(dt, ArrayType):
            c = conv(dt.elementType, scale)
            if c is None:
                return None
            return lambda v: [
                c(x) if x is not None else None for x in v
            ]
        if isinstance(dt, MapType):
            ck0 = conv(dt.keyType, scale)
            cv0 = conv(dt.valueType, scale)
            if ck0 is None and cv0 is None:
                return None
            ck = ck0 or (lambda x: x)
            cv = cv0 or (lambda x: x)
            return lambda v: {
                ck(k): (cv(x) if x is not None else None)
                for k, x in v.items()
            }
        if isinstance(dt, StructType):
            cs = [conv(f.dataType, scale) for f in dt.fields]
            if all(c is None for c in cs):
                return None
            return lambda v: tuple(
                (c(x) if (c is not None and x is not None) else x)
                for c, x in zip(cs, list(v))
            )
        return None

    def is_byte_map(col: str) -> bool:
        try:
            from byconity_spark.frontend.sql import _TABLE_BYTE_MAPS
            return any(col in c for c in _TABLE_BYTE_MAPS.values())
        except Exception:
            return False

    items = _select_items(st) if st else []
    out = []
    for idx, f in enumerate(schema.fields):
        iscale = (_item_scale(items[idx], st)
                  if st and len(items) == len(schema.fields) else None)
        if iscale is None and isinstance(
            f.dataType, (TimestampType, TimestampNTZType)
        ):
            iscale = _ddl_scale(f.name, st)
        c = conv(f.dataType, _ntz_scale(f.name, st), iscale)
        if isinstance(f.dataType, MapType) and is_byte_map(f.name):
            # BYTE maps store one implicit column per key and
            # reconstruct key-sorted; the Arrow collect conversion
            # scrambles primitive-key map entry order, so re-sort here
            base = c or (lambda v: v)
            c = (lambda b: lambda v: dict(
                sorted(b(v).items(), key=lambda kv: kv[0])
            ))(base)
        out.append(c)
    return out


def golden_rows(df, st: str | None = None) -> list[str]:
    """Format a result DataFrame as clickhouse-client TabSeparated lines."""
    convs = _schema_convs(df.schema, st)
    rows = df.limit(10001).collect()
    return [
        "\t".join(
            ch_fmt_cell(c(v) if (c is not None and v is not None) else v)
            for c, v in zip(convs, r)
        )
        for r in rows
    ]


_PRETTY_FMT = re.compile(
    r"(?is)\bFORMAT\s+(Pretty\w*|Vertical)\s*;?\s*$"
)


def _ch_literal_name(item: str) -> str | None:
    """CH display name of an UNALIASED string-literal select item: the
    literal re-quoted with backslash escaping (the normalized AST
    rendering clickhouse-client shows as the header)."""
    t = item.strip()
    if not (t.startswith("'") and t.endswith("'")):
        return None
    # parse the CH literal (backslash escapes + '' doubling)
    val = []
    i = 1
    while i < len(t) - 1:
        c = t[i]
        if c == "\\" and i + 1 < len(t) - 1:
            val.append(t[i + 1])
            i += 2
            continue
        if c == "'" and t[i + 1 : i + 2] == "'":
            val.append("'")
            i += 2
            continue
        val.append(c)
        i += 1
    v = "".join(val)
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _spark_to_ch_type(dt) -> str:
    from pyspark.sql.types import (ArrayType, BooleanType, ByteType,
                                   DateType, DoubleType, FloatType,
                                   IntegerType, LongType, MapType,
                                   ShortType, StringType, StructType,
                                   TimestampNTZType, TimestampType)

    if isinstance(dt, ArrayType):
        return f"Array({_spark_to_ch_type(dt.elementType)})"
    if isinstance(dt, MapType):
        return (f"Map({_spark_to_ch_type(dt.keyType)}, "
                f"{_spark_to_ch_type(dt.valueType)})")
    if isinstance(dt, StructType):
        return ("Tuple(" + ", ".join(
            _spark_to_ch_type(f.dataType) for f in dt.fields) + ")")
    return {
        StringType: "String", TimestampType: "DateTime",
        TimestampNTZType: "DateTime", DateType: "Date",
        LongType: "Int64", IntegerType: "Int32", ShortType: "Int16",
        ByteType: "Int8", DoubleType: "Float64", FloatType: "Float32",
        BooleanType: "UInt8",
    }.get(type(dt), dt.simpleString())


def golden_xml(df, st: str) -> list[str]:
    """FORMAT XML output (00307): raw select-item spellings name the
    columns, CH type names fill the meta."""
    from byconity_spark.engine.pretty import render_xml
    try:
        from byconity_spark.frontend.sql import _infer_ch_type
    except Exception:
        _infer_ch_type = lambda _e: None  # noqa: E731

    names = list(df.columns)
    m = re.match(r"(?is)^\s*SELECT\s+(.*)$", st)
    if m:
        txt = m.group(1)
        items, depth, cur, i = [], 0, [], 0
        end = len(txt)
        while i < end:
            c = txt[i]
            if c == "'":
                j = i + 1
                while j < end:
                    if txt[j] == "\\":
                        j += 2
                        continue
                    if txt[j] == "'":
                        break
                    j += 1
                cur.append(txt[i:j + 1])
                i = j + 1
                continue
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            elif depth == 0:
                km = re.match(
                    r"(?i)(FROM|SETTINGS|FORMAT|WHERE|GROUP|ORDER|"
                    r"LIMIT)\b", txt[i:],
                )
                if km and (i == 0 or not txt[i - 1].isalnum()):
                    break
                if c == ",":
                    items.append("".join(cur).strip())
                    cur = []
                    i += 1
                    continue
            cur.append(c)
            i += 1
        if "".join(cur).strip():
            items.append("".join(cur).strip())
        if len(items) == len(names):
            out_names = []
            for it, fallback in zip(items, names):
                am = re.search(r"(?is)\s+AS\s+(`[^`]+`|\w+)\s*$", it)
                out_names.append(
                    am.group(1).strip("`") if am else it
                )
            names = out_names
    types = []
    for it_name, fld in zip(names, df.schema.fields):
        t = _infer_ch_type(it_name)
        types.append(t or _spark_to_ch_type(fld.dataType))
    extremes = bool(re.search(r"(?i)\bextremes\s*=\s*1\b", st))
    rows = [list(r) for r in df.limit(10001).collect()]
    return render_xml(names, types, rows, extremes)


def golden_pretty(df, st: str, fmt: str) -> list[str]:
    """Render a FORMAT Pretty*/Vertical statement like clickhouse-client
    (engine/pretty.py owns the box layout)."""
    from byconity_spark.engine.pretty import render
    from pyspark.sql.types import (
        ByteType, DateType, DecimalType, DoubleType, FloatType,
        IntegerType, LongType, ShortType, TimestampNTZType,
        TimestampType,
    )

    # shouldAlignRightInPrettyFormats: numbers AND dates/datetimes
    numeric = (ByteType, ShortType, IntegerType, LongType, FloatType,
               DoubleType, DecimalType, DateType, TimestampType,
               TimestampNTZType)
    aligns = [
        "r" if isinstance(f.dataType, numeric) else "l"
        for f in df.schema.fields
    ]
    names = list(df.columns)
    # unaliased string-literal items display their normalized quoting
    m = re.match(r"(?is)^\s*SELECT\s+(.*?)\s*FORMAT\s+\w+\s*;?\s*$", st)
    if m and "\n" not in m.group(1):
        items, depth, cur = [], 0, []
        txt = m.group(1)
        i = 0
        while i < len(txt):
            c = txt[i]
            if c == "'":
                j = i + 1
                while j < len(txt):
                    if txt[j] == "\\":
                        j += 2
                        continue
                    if txt[j] == "'":
                        if txt[j + 1 : j + 2] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                cur.append(txt[i : j + 1])
                i = j + 1
                continue
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            if c == "," and depth == 0:
                items.append("".join(cur))
                cur = []
                i += 1
                continue
            cur.append(c)
            i += 1
        items.append("".join(cur))
        if len(items) == len(names):
            for k, it in enumerate(items):
                lit = _ch_literal_name(it)
                if lit is not None:
                    names[k] = lit
    if len(set(names)) < len(names):
        # CH qualifies ambiguous SELECT-* output columns by table alias
        # (01018: one.dummy / A.dummy / B.dummy)
        als = []
        for tm in re.finditer(
            r"(?is)\b(?:FROM|JOIN)\s+([\w.]+)(?:\s+(?:AS\s+)?"
            r"(?!ON\b|USING\b|JOIN\b|LEFT\b|RIGHT\b|INNER\b|CROSS\b|"
            r"FORMAT\b|WHERE\b)(\w+))?",
            st,
        ):
            als.append(tm.group(2) or tm.group(1).rsplit(".", 1)[-1])
        if len(als) == len(names):
            names = [f"{a}.{c}" for a, c in zip(als, names)]
    convs = _schema_convs(df.schema, st)
    rows = [
        [ch_fmt_cell(c(v) if (c is not None and v is not None) else v,
                     nested=False)
         if (not isinstance(v, str) or c is not None) else v
         for c, v in zip(convs, r)]
        for r in df.limit(10001).collect()
    ]
    return render(fmt, names, rows, aligns)


def bucket(err: str) -> str:
    """Collapse an error message into a coarse failure bucket."""
    e = err.lower()
    for pat, b in [
        (r"create table: unparsed tail", "create-tail"),
        (r"unknown setting", "set-unknown"),
        (r"arrayjoin\(\) inside", "arrayjoin-subquery"),
        (r"unsupported function", "missing-function"),
        (r"unresolved", "unresolved-name"),
        (r"syntax error", "spark-syntax"),
        (r"parse_syntax_error", "spark-syntax"),
        (r"table or view not found|table_or_view_not_found", "missing-table"),
        (r"cannot resolve|unresolved_column", "unresolved-name"),
        (r"doesn't exist|does not exist", "missing-object"),
    ]:
        if re.search(pat, e):
            return b
    return "other"


def main() -> None:
    argv = [a for a in sys.argv[1:]
            if a not in ("--verbose", "--golden", "--dump")]
    verbose = "--verbose" in sys.argv
    golden = "--golden" in sys.argv
    dump = "--dump" in sys.argv
    if argv and argv[0] == "--file":
        # single-file debug mode: every matching file, always verbose
        sample = []
        for pat in argv[1:]:
            sample.extend(sorted(glob.glob(os.path.join(REF_DIR, f"*{pat}*.sql"))))
        verbose = True
        n_files, seed = len(sample), -1
    else:
        n_files = int(argv[0]) if argv else 80
        seed = int(argv[1]) if len(argv) > 1 else 42
        files = sorted(glob.glob(os.path.join(REF_DIR, "*.sql")))
        sample = random.Random(seed).sample(files, n_files)

    sys.path.insert(0, "/root/repo")
    from byconity_spark import get_spark
    from byconity_spark.frontend import ch_sql

    spark = get_spark(app_name="ref-sweep")

    passed, failed = [], []
    buckets: Counter = Counter()
    details: dict[str, tuple[str, str, str]] = {}
    golden_ok: list[str] = []
    golden_diff: dict[str, str] = {}

    for fp in sample:
        name = os.path.basename(fp)
        # clickhouse-test runs each file in its own session: USE / SET
        # state must not leak between files
        try:
            ch_sql(spark, "USE default")
        except Exception:
            pass
        try:
            from byconity_spark.engine.limits import session_limits
            from byconity_spark.frontend.sql import _SESSION_SETTINGS
            session_limits.reset()
            _SESSION_SETTINGS.clear()
        except Exception:
            pass
        try:
            # clickhouse-test runs every file in its own DATABASE —
            # session tables from earlier files must not leak into
            # wildcard statements (45004 `create stats *`)
            from byconity_spark.frontend.sql import (
                _SESSION_TABLE_ENGINES,
            )
            for leftover in list(_SESSION_TABLE_ENGINES):
                try:
                    ch_sql(
                        spark, f"DROP TABLE IF EXISTS `{leftover}`"
                    )
                except Exception:
                    pass
        except Exception:
            pass
        try:
            text = open(fp, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        stmts = split_statements(text, with_raw=True)
        if not stmts:
            continue
        err = None
        out_lines: list[str] = []
        echo_on = False
        for st, raw in stmts:
            # clickhouse-test echo mode: from the statement whose raw
            # text carries `-- { echo }` / `{ echoOn }` on, every
            # statement's raw text (internal comments kept, outer
            # whitespace stripped) prints before its output
            if re.search(r"\{\s*echo\s*\}|\{\s*echoOn\s*\}", raw):
                echo_on = True
            elif re.search(r"\{\s*echoOff\s*\}", raw):
                echo_on = False
            if echo_on and golden:
                out_lines.extend(raw.strip().splitlines())
            expect_error = st.startswith("--EXPECT_ERROR ")
            if expect_error:
                st = st[len("--EXPECT_ERROR "):].strip()
            try:
                df = ch_sql(spark, st)
                if df is not None and hasattr(df, "collect"):
                    pf = _PRETTY_FMT.search(st)
                    if (golden and _OUTPUT_STMT.match(st)
                            and not _FORMAT_NULL.search(st)):
                        rowfmt = re.search(
                            r"(?is)\bFORMAT\s+(TSV|TabSeparated|CSV|"
                            r"JSONEachRow|NDJSON)\s*;?\s*$", st,
                        )
                        if pf:
                            out_lines.extend(
                                golden_pretty(df, st, pf.group(1))
                            )
                        elif re.search(
                            r"(?is)\bFORMAT\s+XML\s*;?\s*$", st
                        ):
                            out_lines.extend(golden_xml(df, st))
                        elif re.search(
                            r"(?is)\bFORMAT\s+(TSV|TabSeparated)"
                            r"WithNames\s*;?\s*$", st,
                        ):
                            out_lines.append("\t".join(df.columns))
                            out_lines.extend(golden_rows(df, st))
                        elif rowfmt and df.columns == ["line"]:
                            # pre-serialized row-output lines print RAW
                            # (real tabs/quotes — 00700 FORMAT TSV)
                            out_lines.extend(
                                str(r[0])
                                for r in df.limit(10001).collect()
                            )
                        else:
                            lines = golden_rows(df, st)
                            if lines and re.search(
                                r"(?i)\bWITH\s+TOTALS\b", st
                            ):
                                # clickhouse-client separates the totals
                                # row with a blank line (10720)
                                lines = lines[:-1] + [""] + lines[-1:]
                            out_lines.extend(lines)
                    else:
                        df.limit(100).collect()
                if expect_error:
                    err = (st, "EXPECTED an error (reference test marks "
                               "this statement serverError) but it ran")
                    break
            except Exception as exc:  # noqa: BLE001 — bucket everything
                if expect_error:
                    continue  # the reference expects this raise too
                err = (st, f"{type(exc).__name__}: {exc}")
                break
        if err is None:
            passed.append(name)
            if golden:
                ref_fp = fp[:-4] + ".reference"
                try:
                    want = open(ref_fp, encoding="utf-8",
                                errors="replace").read()
                except OSError:
                    want = None
                if want is not None:
                    # strip exactly ONE trailing newline — an empty final
                    # row ('' from substring) is real output
                    if want.endswith("\n"):
                        want = want[:-1]
                    w_lines = want.split("\n") if want else []
                    if dump:
                        base = f"/tmp/golden_{name[:-4]}"
                        with open(base + ".want", "w") as fh:
                            fh.write("\n".join(w_lines))
                        with open(base + ".got", "w") as fh:
                            fh.write("\n".join(out_lines))
                        print(f"  [dump] {base}.want / .got")
                    if w_lines == out_lines:
                        golden_ok.append(name)
                    else:
                        # first differing line for the divergence report
                        fd = ""
                        for li in range(max(len(w_lines), len(out_lines))):
                            a = w_lines[li] if li < len(w_lines) else "<EOF>"
                            b = out_lines[li] if li < len(out_lines) else "<EOF>"
                            if a != b:
                                fd = (f"line {li + 1}: want {a[:90]!r} "
                                      f"got {b[:90]!r}")
                                break
                        golden_diff[name] = fd
        else:
            failed.append(name)
            b = bucket(err[1])
            buckets[b] += 1
            details[name] = (b, err[0][:200], err[1][:300])

    print(f"\n=== SWEEP: {len(passed)}/{len(passed) + len(failed)} files "
          f"fully clean (n={n_files}, seed={seed}) ===")
    print("\nfailure buckets:")
    for b, c in buckets.most_common():
        print(f"  {c:3d}  {b}")
    print("\nfailed files:")
    for name in sorted(failed):
        b, st, e = details[name]
        print(f"  [{b}] {name}")
        if verbose:
            print(f"      stmt: {st}")
            print(f"      err:  {e}")
    if golden:
        print(f"\n=== GOLDEN: {len(golden_ok)}/{len(passed)} exec-clean "
              f"files also OUTPUT-EXACT vs .reference ===")
        print("\noutput-diff files:")
        for name in sorted(golden_diff):
            print(f"  [output-diff] {name}")
            if verbose or True:
                print(f"      {golden_diff[name]}")
    spark.stop()


if __name__ == "__main__":
    main()
