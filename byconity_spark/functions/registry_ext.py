"""Scalar-name parity extension batches (round 6).

Installed into the main registry's SCALAR/AGG tables by ``install`` (called
at the bottom of ``registry.py``).  Everything here is an exact-name
implementation of a reference-registered function
(src/Functions/registerFunctions* call sites) that was still missing from
the registry: MySQL/SQL-standard aliases (the reference registers them
CaseInsensitive via IFunctionMySql wrappers), conversion -OrNull/-OrZero/
-OrDefault variants (FunctionsConversion.h), parseDateTime* families
(parseDateTime.cpp, FunctionsConversion.h BestEffort), DateTime64 unix
helpers, vector norms/distances (src/Functions/array/arrayNorm.cpp,
arrayDistance.cpp, tupleOperators), URL tail (src/Functions/URL/),
version comparison (FunctionAppVersionCompare.h), and hash-family aliases
(FunctionsHashing.h — value-divergent ones are added to
VALUE_DIVERGENT_HASHES so the strict-compat flag covers them too).

Every entry is either value-exact or carries a documented deviation in its
comment.  All entries use ``setdefault`` so nothing already registered is
clobbered.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


def _lit(x):
    return x if isinstance(x, Column) else F.lit(x)


def _as_long(c):
    return _lit(c).cast("long")


# --------------------------------------------------------------------------
# helpers shared by several groups
# --------------------------------------------------------------------------

def _utc_now() -> Column:
    # current instant rendered as UTC wall-clock (current_timestamp is the
    # instant rendered in the session tz; to_utc_timestamp re-bases it)
    return F.to_utc_timestamp(F.current_timestamp(), F.current_timezone())


_TO_DAYS_EPOCH = 719528  # MySQL TO_DAYS('1970-01-01'); anchor for to_days/from_days


def _to_days(c) -> Column:
    return (F.datediff(_lit(c).cast("date"), F.lit("1970-01-01").cast("date"))
            + F.lit(_TO_DAYS_EPOCH)).cast("long")


def _time_to_sec(c) -> Column:
    # MySQL TIME_TO_SEC: accepts 'HH:mm:ss' strings (hours may exceed 23)
    # or datetime values (time-of-day part)
    s = _lit(c).cast("string")
    parts = F.split(s, ":")
    time_form = (
        F.try_element_at(parts, F.lit(1)).try_cast("long") * 3600
        + F.try_element_at(parts, F.lit(2)).try_cast("long") * 60
        + F.coalesce(F.try_element_at(parts, F.lit(3)).try_cast("long"), F.lit(0))
    )
    c_ts = _lit(c)
    dt_form = (F.hour(c_ts) * 3600 + F.minute(c_ts) * 60 + F.second(c_ts)).cast("long")
    return F.when(s.rlike(r"^-?\d{1,3}:\d{1,2}(:\d{1,2})?$"), time_form).otherwise(dt_form)


def _sec_to_time(c) -> Column:
    n = _as_long(c)
    return F.format_string(
        "%02d:%02d:%02d", (n / 3600).cast("long"), F.pmod((n / 60).cast("long"), F.lit(60)),
        F.pmod(n, F.lit(60))
    )


def _best_effort_us(c) -> Column:
    # parseDateTimeBestEffortUS (FunctionsConversion.h): like BestEffort but
    # ambiguous x/y/z dates read month-first (US convention)
    c = _lit(c)
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("MM/dd/yyyy HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("MM/dd/yyyy")),
        F.try_to_timestamp(c, F.lit("MM-dd-yyyy HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("MM-dd-yyyy")),
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy/MM/dd HH:mm:ss")),
    )


_EPOCH_TS = "1970-01-01 00:00:00"


def _dotted_version_parts(v) -> Column:
    # numeric dot-separated components; non-numeric component → 0
    # (VersionCompareBase::nextImpl parses digit runs between '.')
    return F.transform(
        F.split(_lit(v).cast("string"), r"\."),
        lambda p: F.coalesce(F.regexp_extract(p, r"^(\d+)", 1).try_cast("long"), F.lit(0)),
    )


def _version_cmp_sign(a, b) -> Column:
    # -1/0/1 sign comparing dotted versions component-wise, missing parts = 0
    pa, pb = _dotted_version_parts(a), _dotted_version_parts(b)
    diffs = F.zip_with(
        pa, pb,
        lambda x, y: F.when(F.coalesce(x, F.lit(0)) < F.coalesce(y, F.lit(0)), F.lit(-1))
        .when(F.coalesce(x, F.lit(0)) > F.coalesce(y, F.lit(0)), F.lit(1))
        .otherwise(F.lit(0)),
    )
    return F.coalesce(
        F.try_element_at(F.filter(diffs, lambda d: d != 0), F.lit(1)), F.lit(0)
    )


def _version_compare(left, right, op, max_length=None) -> Column:
    """versionCompare/AppVersionCompare(left, right, op[, max_length]) →
    UInt8 (FunctionAppVersionCompare.h:196,120; op ∈ ==,!=,<,>,<=,>=).
    max_length limits the number of compared components."""
    if max_length is not None:
        n = int(max_length)
        la = F.slice(_dotted_version_parts(left), 1, n)
        lb = F.slice(_dotted_version_parts(right), 1, n)
        diffs = F.zip_with(
            la, lb,
            lambda x, y: F.when(F.coalesce(x, F.lit(0)) < F.coalesce(y, F.lit(0)), F.lit(-1))
            .when(F.coalesce(x, F.lit(0)) > F.coalesce(y, F.lit(0)), F.lit(1))
            .otherwise(F.lit(0)),
        )
        sign = F.coalesce(
            F.try_element_at(F.filter(diffs, lambda d: d != 0), F.lit(1)), F.lit(0)
        )
    else:
        sign = _version_cmp_sign(left, right)
    ops = {
        "==": sign == 0, "=": sign == 0, "!=": sign != 0, "<>": sign != 0,
        "<": sign == -1, ">": sign == 1, "<=": sign <= 0, ">=": sign >= 0,
    }
    if op not in ops:
        raise ValueError(f"versionCompare: unsupported operator {op!r}")
    return ops[op].cast("int")


def _java_hash(c) -> Column:
    """javaHash (FunctionsHashing.h JavaHashImpl): Java String.hashCode —
    h = 31*h + code per UTF-16 unit, int32 wraparound.  Exact for BMP text
    (Spark ascii() yields the code point; astral chars deviate — documented)."""
    chars = F.filter(F.split(_lit(c).cast("string"), ""), lambda x: x != "")
    codes = F.transform(chars, lambda ch_: F.ascii(ch_).cast("long"))

    def step(acc, x):
        # wrap to signed int32 after each multiply-add (31*|acc| < 2^36, no
        # long overflow under ANSI)
        v = acc * 31 + x
        return F.pmod(v + F.lit(1 << 31), F.lit(1 << 32)) - F.lit(1 << 31)

    return F.aggregate(codes, F.lit(0).cast("long"), step)


def _make_set(bits, *items) -> Column:
    # MySQL MAKE_SET(bits, s1, s2, ...): comma-join of items whose bit is set
    b = _as_long(bits)
    picked = [
        F.when(F.getbit(b, F.lit(i)) == 1, _lit(s)) for i, s in enumerate(items)
    ]
    return F.array_join(F.filter(F.array(*picked), lambda x: x.isNotNull()), ",")


def _json_unquote(c) -> Column:
    # MySQL JSON_UNQUOTE: strip outer quotes + unescape; non-quoted input
    # passes through
    c = _lit(c)
    inner = F.regexp_extract(c, r'^"(.*)"$', 1)
    unescaped = F.replace(
        F.replace(
            F.replace(inner, F.lit('\\"'), F.lit('"')), F.lit("\\n"), F.lit("\n")
        ),
        F.lit("\\\\"), F.lit("\\"),
    )
    return F.when(c.rlike(r'^".*"$'), unescaped).otherwise(c)


def _case_with_expr(x, *args) -> Column:
    # caseWithExpr(x, m1, r1, ..., [default]) (FunctionsConditional caseWithExpression)
    x = _lit(x)
    if len(args) % 2 == 1:
        pairs, default = args[:-1], _lit(args[-1])
    else:
        pairs, default = args, F.lit(None)
    expr = F.when(x == _lit(pairs[0]), _lit(pairs[1]))
    for i in range(2, len(pairs), 2):
        expr = expr.when(x == _lit(pairs[i]), _lit(pairs[i + 1]))
    return expr.otherwise(default)


def _throw_if(cond, msg="throwIf condition met") -> Column:
    # throwIf(cond[, message]) (src/Functions/throwIf.cpp): raises on true,
    # else returns 0
    cond_b = F.coalesce(_lit(cond).cast("boolean"), F.lit(False))
    return F.when(cond_b, F.raise_error(F.lit(str(msg))).cast("int")).otherwise(F.lit(0))


def _random_string_kernel(printable: bool):
    import numpy as np

    def k(seed: pd.Series, n: int) -> pd.Series:
        rng = np.random.default_rng()
        if printable:
            codes = rng.integers(32, 127, size=(len(seed), n))
            return pd.Series(["".join(map(chr, row)) for row in codes])
        codes = rng.integers(0, 256, size=(len(seed), n))
        return pd.Series([bytes(row.tolist()).decode("latin-1") for row in codes])

    return k


def _random_string(n, printable: bool) -> Column:
    n = int(n)
    kern = _random_string_kernel(printable)

    @F.pandas_udf("string")
    def k(seed: pd.Series) -> pd.Series:
        return kern(seed, n)

    return k(F.rand())


def _jump_consistent_hash(key, buckets) -> Column:
    """jumpConsistentHash(key, buckets) (FunctionsConsistentHashing.h; Lamping
    & Veach 2014).  Exact — python-int arithmetic in an Arrow-batched kernel
    (the loop's trip count is data-dependent, no bounded Column form)."""
    n_buckets = int(buckets)

    @F.pandas_udf("int")
    def k(keys: pd.Series) -> pd.Series:
        out = []
        for v in keys:
            key_u = int(v) & 0xFFFFFFFFFFFFFFFF
            b, j = -1, 0
            while j < n_buckets:
                b = j
                key_u = (key_u * 2862933555777941757 + 1) & 0xFFFFFFFFFFFFFFFF
                j = int((b + 1) * (float(1 << 31) / float((key_u >> 33) + 1)))
            out.append(b)
        return pd.Series(out, dtype="int32")

    return k(_as_long(key))


def _lgamma(c) -> Column:
    @F.pandas_udf("double")
    def k(x: pd.Series) -> pd.Series:
        return x.map(lambda v: math.lgamma(v) if pd.notna(v) else None)

    return k(_lit(c).cast("double"))


def _tgamma(c) -> Column:
    @F.pandas_udf("double")
    def k(x: pd.Series) -> pd.Series:
        def g(v):
            if pd.isna(v):
                return None
            try:
                return math.gamma(v)
            except (ValueError, OverflowError):
                return float("inf")
        return x.map(g)

    return k(_lit(c).cast("double"))


# ---- reinterpretAs* (src/Functions/reinterpretAs.cpp): raw little-endian
# byte reinterpretation.  Arrow-batched kernels; exact including negatives
# (two's complement).  String inputs use latin-1 (byte-transparent).
def _reinterpret_bytes(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        return v.encode("latin-1", errors="replace")
    if isinstance(v, float):
        import struct
        return struct.pack("<d", v)
    return int(v).to_bytes(8, "little", signed=True)


def _reinterpret_as_int(width: int, signed: bool):
    def conv(v):
        if v is None:
            return None
        raw = (_reinterpret_bytes(v) + b"\x00" * width)[:width]
        return int.from_bytes(raw, "little", signed=signed)
    return conv


def _reinterpret_as(type_name: str):
    tn = type_name
    if tn.startswith(("Int", "UInt")):
        signed = not tn.startswith("U")
        bits = int(tn.lstrip("UInt") or 64)
        width = max(bits // 8, 1)
        conv = _reinterpret_as_int(width, signed)
        if bits > 64:
            spark_t = "decimal(38,0)"
            from decimal import Decimal
            base = conv

            def conv(v, _b=base):  # noqa: ANN001
                r = _b(v)
                return None if r is None else Decimal(r)
        else:
            spark_t = {8: "tinyint", 16: "smallint", 32: "int", 64: "bigint"}[bits]
            if not signed and bits == 64:
                base = conv

                def conv(v, _b=base):  # noqa: ANN001
                    r = _b(v)
                    if r is None:
                        return None
                    return r - (1 << 64) if r >= (1 << 63) else r  # UInt64→long wrap
    elif tn in ("Float32", "Float64"):
        import struct
        width = 4 if tn == "Float32" else 8
        fmt = "<f" if tn == "Float32" else "<d"
        spark_t = "float" if tn == "Float32" else "double"

        def conv(v):
            if v is None:
                return None
            raw = (_reinterpret_bytes(v) + b"\x00" * width)[:width]
            return float(struct.unpack(fmt, raw)[0])
    elif tn in ("String", "FixedString"):
        spark_t = "string"

        def conv(v):
            if v is None:
                return None
            return _reinterpret_bytes(v).rstrip(b"\x00").decode("latin-1")
    elif tn == "Date":
        import datetime
        spark_t = "date"
        base = _reinterpret_as_int(2, False)

        def conv(v, _b=base):
            r = _b(v)
            if r is None:
                return None
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=r)
    elif tn == "DateTime":
        import datetime
        spark_t = "timestamp"
        base = _reinterpret_as_int(4, False)

        def conv(v, _b=base):
            r = _b(v)
            if r is None:
                return None
            return datetime.datetime.fromtimestamp(r, datetime.timezone.utc).replace(tzinfo=None)
    elif tn == "UUID":
        spark_t = "string"

        def conv(v):
            if v is None:
                return None
            raw = (_reinterpret_bytes(v) + b"\x00" * 16)[:16]
            h = raw.hex()
            return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
    else:
        raise ValueError(f"reinterpretAs: unsupported target {tn!r}")

    def builder(c: Column) -> Column:
        @F.pandas_udf(spark_t)
        def k(s: pd.Series) -> pd.Series:
            return s.map(conv)

        return k(_lit(c))

    return builder


# --------------------------------------------------------------------------
# install
# --------------------------------------------------------------------------

def install(SCALAR: dict, AGG: dict) -> None:  # noqa: C901 (flat table)
    from byconity_spark.functions import registry as R

    def add(d: dict) -> None:
        for k, v in d.items():
            SCALAR.setdefault(k, v)

    # ---- group 1: pure aliases of existing entries (the reference
    # registers these via registerAlias / CaseInsensitive MySQL names)
    ALIASES = {
        "CHARACTER_LENGTH": "lengthUTF8",
        "CURDATE": "today", "CURRENT_DATE": "today",
        "CURRENT_TIMESTAMP": "now", "LOCALTIME": "now", "LOCALTIMESTAMP": "now",
        "sysdate": "now", "now64": "now", "nowInBlock": "now",
        "DAYOFMONTH": "toDayOfMonth", "DAYOFYEAR": "toDayOfYear",
        "FROM_BASE64": "base64Decode", "TO_BASE64": "base64Encode",
        "INET_ATON": "IPv4StringToNum", "INET_NTOA": "IPv4NumToString",
        "INET6_ATON": "IPv6StringToNum", "INET6_NTOA": "IPv6NumToString",
        "IS_IPV4": "isIPv4String", "is_uuid": "isValidUUID",
        "REGEXP_EXTRACT": "extract", "REGEXP_REPLACE": "replaceRegexpAll",
        "REGEXP_MATCHES": "match", "regexp": "match", "rlike": "match",
        "replace": "replaceAll", "substr": "substring",
        "ucase": "upper", "lcase": "lower",
        "mod": "modulo", "moduloLegacy": "modulo",
        "nvl": "ifNull",
        "lastDay": "toLastDayOfMonth", "LAST_DAY": "toLastDayOfMonth",
        "last_day": "toLastDayOfMonth",
        "toDateTime32": "toDateTime",
        "toYearMonth": "toYYYYMM", "YEAR_MONTH": "toYYYYMM",
        "toDecimal256": "toDecimal128",  # DECIMAL(38) ceiling, documented
        "date_diff": "dateDiff", "timestamp_diff": "dateDiff",
        "timestampdiff": "dateDiff",
        "date_format_hive": "formatDateTimeHive",
        "caseWithoutExpr": "multiIf", "caseWithoutExpression": "multiIf",
        "FROM_UNIXTIME": "fromUnixTimestamp",
        "WEEK": "toWeek", "host": "domain",
        "split_to_map": "str_to_map",
        "parseDateTime32BestEffort": "parseDateTimeBestEffort",
        "parseDateTime64BestEffort": "parseDateTimeBestEffort",
        "parseDateTime32BestEffortOrNull": "parseDateTimeBestEffortOrNull",
        "parseDateTime64BestEffortOrNull": "parseDateTimeBestEffortOrNull",
    }
    for tgt, src in ALIASES.items():
        if src in SCALAR and SCALAR[src] is not None:
            SCALAR.setdefault(tgt, SCALAR[src])

    # ---- group 2: MySQL date/time compat (reference wraps these in
    # IFunctionMySql, formatDateTime.cpp / mysqlCompatibility.cpp)
    add({
        "CURTIME": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
        "current_time": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
        "TIME": lambda c: F.date_format(_lit(c), "HH:mm:ss"),
        "utc_date": lambda: _utc_now().cast("date"),
        "utc_time": lambda: F.date_format(_utc_now(), "HH:mm:ss"),
        "UTC_timestamp": _utc_now,
        "DAYOFWEEK": lambda c: F.dayofweek(_lit(c)),  # MySQL: Sunday=1
        "WEEKDAY": lambda c: ((F.dayofweek(_lit(c)) + 5) % 7),  # MySQL: Monday=0
        "toDayOfWeekMySQL": lambda c: F.dayofweek(_lit(c)),
        "adddate": lambda c, n: _lit(c) + F.expr(f"INTERVAL {int(n)} DAY"),
        "subdate": lambda c, n: _lit(c) - F.expr(f"INTERVAL {int(n)} DAY"),
        "addtime": lambda c, t: _lit(c) + F.expr("INTERVAL 1 SECOND") * _time_to_sec(t),
        "subtime": lambda c, t: _lit(c) - F.expr("INTERVAL 1 SECOND") * _time_to_sec(t),
        "addTime": lambda c, t: _lit(c) + F.expr("INTERVAL 1 SECOND") * _time_to_sec(t),
        "subtractTime": lambda c, t: _lit(c) - F.expr("INTERVAL 1 SECOND") * _time_to_sec(t),
        "nextDay": lambda c, d: F.next_day(_lit(c), d),
        "next_day": lambda c, d: F.next_day(_lit(c), d),
        "to_days": _to_days,
        "from_days": lambda n: F.date_add(
            F.lit("1970-01-01").cast("date"), (_as_long(n) - _TO_DAYS_EPOCH).cast("int")
        ),
        "to_seconds": lambda c: _to_days(_lit(c).cast("date")) * 86400
        + F.hour(_lit(c)) * 3600 + F.minute(_lit(c)) * 60 + F.second(_lit(c)),
        "sec_to_time": _sec_to_time,
        "time_to_sec": _time_to_sec,
        "str_to_date": lambda c, fmt: F.try_to_timestamp(
            _lit(c), F.lit(R.ch_datetime_pattern(fmt))
        ),
        "date_format": lambda c, fmt: R.SCALAR["DATE_FORMAT_MYSQL"](c, fmt),
        "yearweek": lambda c, mode=0: (
            F.date_part(F.lit("YEAROFWEEK"), _lit(c)).cast("int") * 100
            + F.weekofyear(_lit(c))
        ).cast("int"),  # ISO week-year basis (CH default mode deviates ±1 at year edges, documented)
        "toWeekOfYear": F.weekofyear,
        "toWeekOfWeekYear": F.weekofyear,
        "toWeekYear": lambda c: F.date_part(F.lit("YEAROFWEEK"), _lit(c)).cast("int"),
        # MySQL EXTRACT composite units (ddHH, ddHHmm, ...)
        "toDayHour": lambda c: (F.dayofmonth(c) * 100 + F.hour(c)).cast("long"),
        "toDayMinute": lambda c: (
            F.dayofmonth(c) * 10000 + F.hour(c) * 100 + F.minute(c)
        ).cast("long"),
        "toDaySecond": lambda c: (
            F.dayofmonth(c) * 1000000 + F.hour(c) * 10000
            + F.minute(c) * 100 + F.second(c)
        ).cast("long"),
        "toHourMinute": lambda c: (F.hour(c) * 100 + F.minute(c)).cast("long"),
        "toHourSecond": lambda c: (
            F.hour(c) * 10000 + F.minute(c) * 100 + F.second(c)
        ).cast("long"),
        "toMinuteSecond": lambda c: (F.minute(c) * 100 + F.second(c)).cast("long"),
        "DAY_HOUR": lambda c: SCALAR["toDayHour"](c),
        "DAY_MINUTE": lambda c: SCALAR["toDayMinute"](c),
        "DAY_SECOND": lambda c: SCALAR["toDaySecond"](c),
        "HOUR_MINUTE": lambda c: SCALAR["toHourMinute"](c),
        "HOUR_SECOND": lambda c: SCALAR["toHourSecond"](c),
        "MINUTE_SECOND": lambda c: SCALAR["toMinuteSecond"](c),
        "convertYearMonthToMonth": lambda v: (
            (_as_long(v) / 100).cast("long") * 12 + F.pmod(_as_long(v), F.lit(100))
        ),
        "convertDayHourToHour": lambda v: (
            (_as_long(v) / 100).cast("long") * 24 + F.pmod(_as_long(v), F.lit(100))
        ),
        "convertDayMinuteToMinute": lambda v: (
            ((_as_long(v) / 10000).cast("long") * 24
             + F.pmod((_as_long(v) / 100).cast("long"), F.lit(100))) * 60
            + F.pmod(_as_long(v), F.lit(100))
        ),
        "convertDaySecondToSecond": lambda v: (
            ((_as_long(v) / 1000000).cast("long") * 24
             + F.pmod((_as_long(v) / 10000).cast("long"), F.lit(100))) * 3600
            + F.pmod((_as_long(v) / 100).cast("long"), F.lit(100)) * 60
            + F.pmod(_as_long(v), F.lit(100))
        ),
        "convertHourMinuteToMinute": lambda v: (
            (_as_long(v) / 100).cast("long") * 60 + F.pmod(_as_long(v), F.lit(100))
        ),
        "convertHourSecondToSecond": lambda v: (
            (_as_long(v) / 10000).cast("long") * 3600
            + F.pmod((_as_long(v) / 100).cast("long"), F.lit(100)) * 60
            + F.pmod(_as_long(v), F.lit(100))
        ),
        "convertMinuteSecondToSecond": lambda v: (
            (_as_long(v) / 100).cast("long") * 60 + F.pmod(_as_long(v), F.lit(100))
        ),
        "toYYYYMMDDhhmmss": lambda c: (
            F.year(c).cast("long") * 10000000000 + F.month(c) * 100000000
            + F.dayofmonth(c) * 1000000 + F.hour(c) * 10000
            + F.minute(c) * 100 + F.second(c)
        ),
        "toYYYYMMDDMySql": lambda c: R.SCALAR["toYYYYMMDD"](c),
        "toYYYYMMDDhhmmssMySql": lambda c: SCALAR["toYYYYMMDDhhmmss"](c),
        # DateLUTImpl::toRelative*Num epoch-relative counters
        "toRelativeYearNum": lambda c: F.year(c).cast("long"),
        "toRelativeQuarterNum": lambda c: (F.year(c) * 4 + F.quarter(c) - 1).cast("long"),
        "toRelativeMonthNum": lambda c: (F.year(c) * 12 + F.month(c)).cast("long"),
        "toRelativeWeekNum": lambda c: (
            (F.datediff(_lit(c).cast("date"), F.lit("1970-01-01").cast("date"))
             + 8 - (((F.dayofweek(c) + 5) % 7) + 1)) / 7
        ).cast("long"),
        "toRelativeSecondNum": lambda c: F.unix_timestamp(_lit(c)),
        "toDateTimeComponents": lambda c: F.struct(
            F.year(c).alias("year"), F.month(c).alias("month"),
            F.dayofmonth(c).alias("day"), F.hour(c).alias("hour"),
            F.minute(c).alias("minute"), F.second(c).alias("second"),
        ),
        "makeDate32": lambda y, m, d: F.make_date(_lit(y), _lit(m), _lit(d)),
        "makeDateTime64": lambda y, m, d, h=0, mi=0, s=0, *rest: F.make_timestamp(
            _lit(y), _lit(m), _lit(d), _lit(h), _lit(mi), _lit(s).cast("decimal(16,6)")
        ),
        "makeTime": lambda h, m, s: F.format_string(
            "%02d:%02d:%02d", _as_long(h), _as_long(m), _as_long(s)
        ),
        # DateTime64 sub-second interval arithmetic (µs floor — Spark
        # timestamps are µs precision; sub-µs truncates, documented)
        "addNanoseconds": lambda c, n: _lit(c)
        + F.expr(f"INTERVAL {int(n) // 1000} MICROSECOND"),
        "subtractNanoseconds": lambda c, n: _lit(c)
        - F.expr(f"INTERVAL {int(n) // 1000} MICROSECOND"),
        "addMicroseconds": lambda c, n: _lit(c) + F.expr(f"INTERVAL {int(n)} MICROSECOND"),
        "subtractMicroseconds": lambda c, n: _lit(c) - F.expr(f"INTERVAL {int(n)} MICROSECOND"),
        "addMilliseconds": lambda c, n: _lit(c) + F.expr(f"INTERVAL {int(n)} MILLISECOND"),
        "subtractMilliseconds": lambda c, n: _lit(c) - F.expr(f"INTERVAL {int(n)} MILLISECOND"),
        "toTimeZone": lambda c, tz=None: _lit(c),  # instant-preserving; display tz is a
        "toTimezone": lambda c, tz=None: _lit(c),  # render concern (Spark ts = instant)
        "timeZone": F.current_timezone,
        "timezone": F.current_timezone,
        "serverTimeZone": F.current_timezone,
        "serverTimezone": F.current_timezone,
        "timeZoneOf": lambda c: F.current_timezone(),
        "timezoneOf": lambda c: F.current_timezone(),
        "timeZoneOffset": lambda c: (
            F.unix_timestamp(_lit(c))
            - F.unix_timestamp(F.to_utc_timestamp(_lit(c), F.current_timezone()))
        ),
        "timezoneOffset": lambda c: SCALAR["timeZoneOffset"](c),
    })

    # ---- group 3: server/context constants (src/Functions/serverConstants.cpp,
    # currentDatabase.cpp).  local[*] single-process values, documented.
    import socket
    import uuid as _uuid
    _host = socket.gethostname()
    _session_uuid = str(_uuid.uuid4())
    add({
        "hostName": lambda: F.lit(_host),
        "hostname": lambda: F.lit(_host),
        "fullHostName": lambda: F.lit(_host),
        "FQDN": lambda: F.lit(socket.getfqdn()),
        "displayName": lambda: F.lit(_host),
        "version": lambda: F.lit("21.8.7.1-byconity-spark"),
        "revision": lambda: F.lit(54449),
        "buildId": lambda: F.lit(_session_uuid),
        "serverUUID": lambda: F.lit(_session_uuid),
        "queryID": lambda: F.lit(_session_uuid),
        "query_id": lambda: F.lit(_session_uuid),
        "initialQueryID": lambda: F.lit(_session_uuid),
        "initial_query_id": lambda: F.lit(_session_uuid),
        "connectionId": lambda: F.lit(0).cast("long"),
        "connection_id": lambda: F.lit(0).cast("long"),
        "tcpPort": lambda: F.lit(9000),
        "tid": lambda: F.lit(0).cast("long"),
        "uptime": lambda: F.lit(0).cast("long"),
        "zookeeperSessionUptime": lambda: F.lit(0).cast("long"),
        "DATABASE": lambda: F.expr("current_database()"),
        "CATALOG": lambda: F.expr("current_catalog()"),
        "schema": lambda: F.expr("current_database()"),
        "current_user": lambda: F.expr("current_user()"),
        "user": lambda: F.expr("current_user()"),
        "currentUser": lambda: F.expr("current_user()"),
        "getOSKernelVersion": lambda: F.lit(__import__("platform").release()),
        "getMacro": lambda name: F.lit(""),  # no macro config in local mode
        "getSetting": lambda name: F.lit(None),
        "blockNumber": lambda: F.spark_partition_id().cast("long"),
        "rowNumberInBlock": lambda: (
            F.monotonically_increasing_id() & F.lit((1 << 33) - 1)
        ),
        "blockSize": lambda: F.count(F.lit(1)).over(
            Window.partitionBy(F.spark_partition_id())
        ),
    })

    # ---- group 4: fresh simple scalars
    add({
        "octet_length": F.octet_length,
        "FROM_UTF8": lambda c: F.decode(_lit(c).cast("binary"), "UTF-8"),
        "TO_UTF8": lambda c: F.encode(_lit(c), "UTF-8"),
        "strcmp": lambda a, b: F.when(_lit(a) < _lit(b), F.lit(-1))
        .when(_lit(a) > _lit(b), F.lit(1)).otherwise(F.lit(0)),
        "versionCompare": _version_compare,
        "AppVersionCompare": _version_compare,
        "appVersionCompare": _version_compare,
        "sigmoid": lambda c: F.lit(1.0) / (F.lit(1.0) + F.exp(-_lit(c).cast("double"))),
        "min2": lambda a, b: F.least(_lit(a), _lit(b)),
        "max2": lambda a, b: F.greatest(_lit(a), _lit(b)),
        "hypot": lambda a, b: F.hypot(_lit(a), _lit(b)),
        "lgamma": _lgamma,
        "tgamma": _tgamma,
        "xor": lambda *args: F.pmod(
            sum((_lit(a).cast("boolean").cast("int") for a in args[1:]),
                _lit(args[0]).cast("boolean").cast("int")),
            F.lit(2),
        ).cast("boolean").cast("int"),
        "conv": lambda c, fb, tb: F.conv(_lit(c), int(fb), int(tb)),
        "pmod": lambda a, b: F.pmod(_lit(a), _lit(b)),
        "positiveModulo": lambda a, b: F.pmod(_lit(a), _lit(b)),
        "positive_modulo": lambda a, b: F.pmod(_lit(a), _lit(b)),
        "hiveModulo": lambda a, b: F.pmod(_lit(a), _lit(b)),
        "hmod": lambda a, b: F.pmod(_lit(a), _lit(b)),
        "width_bucket": lambda c, lo, hi, n: F.width_bucket(
            _lit(c), _lit(lo), _lit(hi), _lit(n)
        ),
        "element_at": lambda coll, k: F.try_element_at(coll, _lit(k)),
        "mapElement": lambda m, k: F.try_element_at(m, _lit(k)),
        "mapExtractKeyLike": lambda m, pat: F.map_filter(
            m, lambda k, _v: k.like(pat if isinstance(pat, str) else pat)
        ),
        "MAP_FROM_ARRAYS": F.map_from_arrays,
        "contains": lambda hay, needle: F.contains(_lit(hay), _lit(needle)),
        "split": lambda c, pat: F.split(_lit(c), pat),
        "split_part": lambda c, delim, n: F.split_part(_lit(c), _lit(delim), _lit(n)),
        "str_to_map": lambda c, pd_=",", kvd="=": F.str_to_map(
            _lit(c), F.lit(pd_), F.lit(kvd)
        ),
        "find_in_set": lambda s, lst: F.coalesce(
            F.array_position(F.split(_lit(lst), ","), _lit(s)), F.lit(0)
        ).cast("long"),
        "make_set": _make_set,
        "parse_url": lambda c, part, key=None: (
            F.parse_url(_lit(c), _lit(part), _lit(key))
            if key is not None else F.parse_url(_lit(c), _lit(part))
        ),
        "basename": lambda c: F.substring_index(
            F.substring_index(_lit(c), "/", -1), "\\", -1
        ),
        "visibleWidth": lambda c: F.length(_lit(c).cast("string")).cast("long"),
        "byteSize": lambda *cs: sum(
            (F.coalesce(F.octet_length(_lit(c).cast("string")), F.lit(0)) for c in cs[1:]),
            F.coalesce(F.octet_length(_lit(cs[0]).cast("string")), F.lit(0)),
        ).cast("long"),  # serialized-string size, not CH in-memory bytes (documented)
        "toStringCutToZero": lambda c: F.substring_index(
            _lit(c).cast("string"), "\u0000", 1
        ),
        "toDecimalString": lambda c, scale: F.format_string(
            f"%.{int(scale)}f", _lit(c).cast("double")
        ),
        "throwIf": _throw_if,
        "caseWithExpr": _case_with_expr,
        "caseWithExpression": _case_with_expr,
        "isConstant": lambda c: F.lit(0 if isinstance(c, Column) else 1),
        "inf": lambda: F.lit(float("inf")),
        "toBool": lambda c: _lit(c).cast("boolean"),
        "toLowCardinality": lambda c: _lit(c),
        "lowCardinalityKeys": lambda c: _lit(c),  # no dict encoding in Spark
        "lowCardinalityIndices": lambda c: F.lit(0).cast("long"),
        "lowCardinalityIsNoneEncoded": lambda c: F.lit(True),
        "defaultValueOfArgumentType": lambda c: F.lit(None),
        "unifyNull": lambda c: _lit(c),
        "JSON_UNQUOTE": _json_unquote,
        "JSONArrayLength": F.json_array_length,
        "JSON_ARRAY_LENGTH": F.json_array_length,
        "JSON_SIZE": lambda c, path=None: F.coalesce(
            F.json_array_length(
                F.get_json_object(_lit(c), path) if path is not None else _lit(c)
            ),
            F.size(F.json_object_keys(
                F.get_json_object(_lit(c), path) if path is not None else _lit(c)
            )).cast("int"),
            F.lit(0),
        ).cast("long"),
        "escapeLike": lambda c: F.replace(
            F.replace(F.replace(_lit(c), F.lit("\\"), F.lit("\\\\")),
                      F.lit("%"), F.lit("\\%")),
            F.lit("_"), F.lit("\\_"),
        ),
        "instr": lambda hay, needle: F.instr(_lit(hay), needle),
        "replaceRegexpOne": lambda c, p, r: F.regexp_replace(
            _lit(c), "^((?s:.*?))" + str(p),
            "$1" + __import__("re").sub(r"\\(\d)", lambda m: f"${int(m.group(1)) + 1}", str(r)),
        ),  # anchored lazy prefix → first occurrence only; \N refs shift by 1
    })
    for nm in ("escapeILike", "escapeNotLike", "escapeNotILike"):
        SCALAR.setdefault(nm, SCALAR["escapeLike"])
    SCALAR.setdefault("escapeRLike", lambda c: F.regexp_replace(
        _lit(c), r"([.^$*+?()\[\]{}|\\])", r"\\$1"
    ))

    # ---- group 5: arrays tail (src/Functions/array/)
    add({
        "arrayFirstOrNull": lambda lam, arr: F.try_element_at(F.filter(arr, lam), F.lit(1)),
        "arrayLastOrNull": lambda lam, arr: F.try_element_at(F.filter(arr, lam), F.lit(-1)),
        "arrayLastIndex": lambda lam, arr: F.when(
            F.array_position(F.reverse(F.transform(arr, lam)), F.lit(True)) > 0,
            F.size(arr)
            - F.array_position(F.reverse(F.transform(arr, lam)), F.lit(True)) + 1,
        ).otherwise(F.lit(0)).cast("long"),
        "arrayRemove": F.array_remove,
        "array_remove": F.array_remove,
        "array_sort": F.array_sort,
        "array_union": lambda *arrs: __import__("functools").reduce(F.array_union, arrs),
        "arrayUnion": lambda *arrs: __import__("functools").reduce(F.array_union, arrs),
        "arrayWithConstant": lambda n, x: F.array_repeat(_lit(x), _lit(n).cast("int")),
        "arraySize": lambda arr: F.size(arr).cast("long"),
        # arrayPartialReverseSort(limit, arr): CH leaves the tail order
        # unspecified — a full descending sort is a valid realization
        "arrayPartialReverseSort": lambda limit, arr: F.reverse(F.array_sort(arr)),
        "bitmaskToArray": lambda n: F.filter(
            F.array(*[F.lit(1 << i).cast("long") for i in range(63)]),
            lambda p: _as_long(n).bitwiseAND(p) != 0,
        ),
        "bitEquals": lambda a, b: (_as_long(a) == _as_long(b)).cast("int"),
        "bitNotEquals": lambda a, b: (_as_long(a) != _as_long(b)).cast("int"),
        "validateNestedArraySizes": lambda cond, *arrs: __import__("functools").reduce(
            lambda acc, x: acc & x,
            [F.size(arrs[0]) == F.size(a) for a in arrs[1:]],
            F.lit(True),
        ),
    })

    # ---- group 6: conversion -OrNull/-OrZero/-OrDefault variants
    # (FunctionsConversion.h toDateOrZero/toDateTimeOrNull/toDecimal*Or*)
    def _conv_variants(base: str, spark_t: str, zero):
        SCALAR.setdefault(base + "OrNull", lambda c: _lit(c).try_cast(spark_t))
        SCALAR.setdefault(base + "OrZero", lambda c: F.coalesce(
            _lit(c).try_cast(spark_t), F.lit(zero).cast(spark_t)
        ))
        SCALAR.setdefault(base + "OrDefault", lambda c, d=None: F.coalesce(
            _lit(c).try_cast(spark_t),
            (_lit(d) if d is not None else F.lit(zero)).cast(spark_t),
        ))

    SCALAR.setdefault("toDate32", lambda c: _lit(c).cast("date"))
    _conv_variants("toDate", "date", "1970-01-01")
    _conv_variants("toDate32", "date", "1900-01-01")
    _conv_variants("toDateTime", "timestamp", _EPOCH_TS)
    _conv_variants("toDateTime64", "timestamp", _EPOCH_TS)
    for dec, dt in (("toDecimal32", "decimal(9,4)"), ("toDecimal64", "decimal(18,4)"),
                    ("toDecimal128", "decimal(38,4)"), ("toDecimal256", "decimal(38,4)")):
        # CH toDecimalN(x, scale): scale is per-call; the no-scale *variants*
        # here fix scale 4 like the base entries (documented)
        _conv_variants(dec, dt, 0)
    _conv_variants("toUUID", "string", "00000000-0000-0000-0000-000000000000")
    _conv_variants("toFixedString", "string", "")
    for big in ("toInt128", "toUInt128", "toInt256", "toUInt256"):
        SCALAR.setdefault(big + "OrDefault", lambda c, d=0: F.coalesce(
            _lit(c).try_cast("decimal(38,0)"), _lit(d).cast("decimal(38,0)")
        ))
    SCALAR.setdefault("accurateCastOrDefault", lambda c, t, d=None: F.coalesce(
        R.SCALAR["accurateCastOrNull"](c, t) if "accurateCastOrNull" in R.SCALAR
        else _lit(c).try_cast(t),
        _lit(d) if d is not None else F.lit(0),
    ))
    add({
        "toIPv4": lambda c: _lit(c),
        "toIPv4OrNull": lambda c: F.when(
            _lit(c).rlike(r"^(\d{1,3}\.){3}\d{1,3}$"), _lit(c)
        ),
        "toIPv4OrZero": lambda c: F.coalesce(
            SCALAR["toIPv4OrNull"](c), F.lit("0.0.0.0")
        ),
        "toIPv4OrDefault": lambda c, d="0.0.0.0": F.coalesce(
            SCALAR["toIPv4OrNull"](c), _lit(d)
        ),
        "toIPv6OrNull": lambda c: F.when(_lit(c).rlike(r"^[0-9a-fA-F:.]+$"), _lit(c)),
        "toIPv6OrZero": lambda c: F.coalesce(SCALAR["toIPv6OrNull"](c), F.lit("::")),
        "toIPv6OrDefault": lambda c, d="::": F.coalesce(SCALAR["toIPv6OrNull"](c), _lit(d)),
    })

    # ---- group 7: parseDateTime family (parseDateTime.cpp MySQL-format,
    # Joda variants, BestEffort US/OrZero)
    def _parse_mysql(c, fmt):
        return F.to_timestamp(_lit(c), R.ch_datetime_pattern(fmt))

    add({
        "parseDateTime": _parse_mysql,
        "parseDateTimeOrNull": lambda c, fmt: F.try_to_timestamp(
            _lit(c), F.lit(R.ch_datetime_pattern(fmt))
        ),
        "parseDateTimeOrZero": lambda c, fmt: F.coalesce(
            F.try_to_timestamp(_lit(c), F.lit(R.ch_datetime_pattern(fmt))),
            F.lit(_EPOCH_TS).cast("timestamp"),
        ),
        "parseDateTimeInJodaSyntax": lambda c, fmt: F.to_timestamp(_lit(c), fmt),
        "parseDateTimeInJodaSyntaxOrNull": lambda c, fmt: F.try_to_timestamp(
            _lit(c), F.lit(fmt)
        ),
        "parseDateTimeInJodaSyntaxOrZero": lambda c, fmt: F.coalesce(
            F.try_to_timestamp(_lit(c), F.lit(fmt)), F.lit(_EPOCH_TS).cast("timestamp")
        ),
        "parseDateTimeBestEffortOrZero": lambda c: F.coalesce(
            R.SCALAR["parseDateTimeBestEffort"](c), F.lit(_EPOCH_TS).cast("timestamp")
        ),
        "parseDateTimeBestEffortUS": _best_effort_us,
        "parseDateTimeBestEffortUSOrNull": _best_effort_us,
        "parseDateTimeBestEffortUSOrZero": lambda c: F.coalesce(
            _best_effort_us(c), F.lit(_EPOCH_TS).cast("timestamp")
        ),
        "parseFloat64OrZeroMySql": lambda c: F.coalesce(
            F.regexp_extract(
                _lit(c), r"^\s*([+-]?\d+(\.\d+)?([eE][+-]?\d+)?)", 1
            ).try_cast("double"),
            F.lit(0.0),
        ),
    })
    for nm in ("parseDateTime32BestEffortOrZero", "parseDateTime64BestEffortOrZero"):
        SCALAR.setdefault(nm, SCALAR["parseDateTimeBestEffortOrZero"])
    for nm in ("parseDateTime64BestEffortUS", "parseDateTime64BestEffortUSOrNull"):
        SCALAR.setdefault(nm, SCALAR["parseDateTimeBestEffortUS"])
    SCALAR.setdefault(
        "parseDateTime64BestEffortUSOrZero", SCALAR["parseDateTimeBestEffortUSOrZero"]
    )

    # ---- group 8: DateTime64 unix helpers + snowflake/ULID
    # (FunctionsConversion.h toUnixTimestamp64*, FunctionSnowflake.h,
    # generateULID.cpp)
    def _div_floor_long(n, d: int):
        return F.floor(_lit(n).cast("decimal(38,6)") / F.lit(d)).cast("long")

    _SNOWFLAKE_EPOCH_MS = 1288834974657  # FunctionSnowflake.h snowflake_epoch
    _ULID32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
    def _adaptive_ts(n):
        # > 0xFFFFFFFF means milliseconds (FunctionsConversion.h
        # ToDateTransform32Or64 adaptive branch)
        return F.when(
            _as_long(n) > F.lit(0xFFFFFFFF), F.timestamp_millis(_as_long(n))
        ).otherwise(F.timestamp_seconds(_as_long(n)))

    add({
        "toUnixTimestamp64Milli": lambda c: F.unix_millis(_lit(c).cast("timestamp")),
        "toUnixTimestamp64Micro": lambda c: F.unix_micros(_lit(c).cast("timestamp")),
        "toUnixTimestamp64Nano": lambda c: F.unix_micros(_lit(c).cast("timestamp")) * 1000,
        "fromUnixTimestamp64Milli": lambda n: F.timestamp_millis(_as_long(n)),
        "fromUnixTimestamp64Micro": lambda n: F.timestamp_micros(_as_long(n)),
        "fromUnixTimestamp64Nano": lambda n: F.timestamp_micros(_div_floor_long(n, 1000)),
        "fromUnixTimestampMilli": lambda n: F.timestamp_millis(_as_long(n)),
        "TO_UNIXTIME": lambda c: F.unix_timestamp(_lit(c)),
        # adaptive: > 0xFFFFFFFF means milliseconds (FunctionsConversion.h
        # ToDateTransform32Or64 adaptive branch)
        "FROM_UNIXTIME_ADAPTIVE": lambda n, fmt=None: (
            R.SCALAR["formatDateTime"](_adaptive_ts(n), fmt)
            if fmt is not None else _adaptive_ts(n)
        ),
        "dateTime64ToSnowflake": lambda c: F.shiftleft(
            F.unix_millis(_lit(c).cast("timestamp")) - F.lit(_SNOWFLAKE_EPOCH_MS), 22
        ),
        "snowflakeToDateTime64": lambda n, tz=None: F.timestamp_millis(
            F.shiftright(_as_long(n), 22) + F.lit(_SNOWFLAKE_EPOCH_MS)
        ),
        "generateSnowflakeID": lambda *a: F.shiftleft(
            F.unix_millis(F.current_timestamp()) - F.lit(_SNOWFLAKE_EPOCH_MS), 22
        ).bitwiseOR((F.rand() * (1 << 22)).cast("long")),
        "generateULID": lambda *a: F.concat(
            # 10-char Crockford time part (48-bit ms), 16-char random part
            *[
                F.substring(
                    F.lit(_ULID32),
                    (F.pmod(
                        F.floor(
                            F.unix_millis(F.current_timestamp())
                            / F.lit(32 ** (9 - i))
                        ).cast("long"),
                        F.lit(32),
                    ) + 1).cast("int"),
                    1,
                )
                for i in range(10)
            ],
            F.translate(
                F.substring(F.md5(F.concat(F.rand().cast("string"),
                                           F.monotonically_increasing_id().cast("string"))), 1, 16),
                "abcdef", "GHJKMN",
            ).alias("rand_part"),
        ),
        "ULIDStringToDateTime": lambda s: F.timestamp_millis(
            F.aggregate(
                F.transform(
                    F.slice(F.filter(F.split(F.upper(_lit(s)), ""), lambda x: x != ""), 1, 10),
                    lambda ch_: (
                        F.array_position(
                            F.array(*[F.lit(a) for a in _ULID32]), ch_
                        ) - 1
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc * 32 + x,
            )
        ),
        "UUIDToUInt64High": lambda c: F.shiftleft(
            F.conv(F.substring(F.replace(_lit(c), F.lit("-"), F.lit("")), 1, 8), 16, 10)
            .cast("long"), 32
        ).bitwiseOR(
            F.conv(F.substring(F.replace(_lit(c), F.lit("-"), F.lit("")), 9, 8), 16, 10)
            .cast("long")
        ),
        "UUIDToUInt64Low": lambda c: F.shiftleft(
            F.conv(F.substring(F.replace(_lit(c), F.lit("-"), F.lit("")), 17, 8), 16, 10)
            .cast("long"), 32
        ).bitwiseOR(
            F.conv(F.substring(F.replace(_lit(c), F.lit("-"), F.lit("")), 25, 8), 16, 10)
            .cast("long")
        ),
    })

    # ---- group 9: IN-operator functional forms (src/Functions/in.cpp —
    # the planner registers in/notIn/nullIn/globalIn × IgnoreSet; GLOBAL and
    # IgnoreSet flavors are distribution hints, semantics identical here)
    def _in(c, *vals):
        vals = vals[0] if len(vals) == 1 and isinstance(vals[0], (list, tuple)) else vals
        return _lit(c).isin(*[v if not isinstance(v, Column) else v for v in vals])

    def _null_in(c, *vals):
        vals = vals[0] if len(vals) == 1 and isinstance(vals[0], (list, tuple)) else vals
        return F.exists(
            F.array(*[_lit(v) for v in vals]), lambda e: e.eqNullSafe(_lit(c))
        )

    for nm in ("in", "globalIn", "inIgnoreSet", "globalInIgnoreSet"):
        SCALAR.setdefault(nm, _in)
    for nm in ("notIn", "globalNotIn", "notInIgnoreSet", "globalNotInIgnoreSet"):
        SCALAR.setdefault(nm, lambda c, *v: ~_in(c, *v))
    for nm in ("nullIn", "globalNullIn", "nullInIgnoreSet", "globalNullInIgnoreSet"):
        SCALAR.setdefault(nm, _null_in)
    for nm in ("notNullIn", "globalNotNullIn", "notNullInIgnoreSet",
               "globalNotNullInIgnoreSet"):
        SCALAR.setdefault(nm, lambda c, *v: ~_null_in(c, *v))

    # ---- group 10: hash tail (FunctionsHashing.h).  javaHash is exact
    # (BMP); jumpConsistentHash exact; the rest are xxhash64/hash-backed
    # stand-ins — added to VALUE_DIVERGENT_HASHES so strict mode covers them.
    add({
        "javaHash": _java_hash,
        "javaHashV2": _java_hash,
        "javaHashUTF16LE": _java_hash,  # BMP-identical to javaHash (documented)
        "javaHashUTF16LEV2": _java_hash,
        "jumpConsistentHash": _jump_consistent_hash,
        "xxHash32": lambda c: F.hash(_lit(c)).cast("long").bitwiseAND(F.lit(0xFFFFFFFF)),
        "xxh3": lambda c: F.xxhash64(_lit(c)),
        "wyHash64": lambda c: F.xxhash64(_lit(c)),
        "fnv1aHash": lambda c: F.xxhash64(_lit(c)),
        "metroHash64": lambda c: F.xxhash64(_lit(c)),
        "gccMurmurHash": lambda c: F.xxhash64(_lit(c)),
        "murmurHash2_32": lambda c: F.hash(_lit(c)).cast("long").bitwiseAND(F.lit(0xFFFFFFFF)),
        "murmurHash2_64": lambda c: F.xxhash64(_lit(c)),
        "murmurHash3_32": lambda c: F.hash(_lit(c)).cast("long").bitwiseAND(F.lit(0xFFFFFFFF)),
        "murmurHash3_64": lambda c: F.xxhash64(_lit(c)),
        "murmurHash3_128": lambda c: F.concat(
            F.hex(F.xxhash64(_lit(c))), F.hex(F.xxhash64(_lit(c), F.lit(1)))
        ),
        "sipHash64Keyed": lambda k, c: F.xxhash64(_lit(c), _lit(k)),
        "sipHash128Keyed": lambda k, c: F.concat(
            F.hex(F.xxhash64(_lit(c), _lit(k))), F.hex(F.xxhash64(_lit(c), _lit(k), F.lit(1)))
        ),
        "sipHash128Reference": lambda c: F.concat(
            F.hex(F.xxhash64(_lit(c))), F.hex(F.xxhash64(_lit(c), F.lit(2)))
        ),
        "sipHash128ReferenceKeyed": lambda k, c: F.concat(
            F.hex(F.xxhash64(_lit(c), _lit(k))), F.hex(F.xxhash64(_lit(c), _lit(k), F.lit(2)))
        ),
        "sipHashBuitin": lambda c: F.xxhash64(_lit(c)),  # sic — reference typo
        "kostikConsistentHash": lambda key, n: F.pmod(
            F.xxhash64(_as_long(key)), F.lit(int(n))
        ).cast("int"),
        "yandexConsistentHash": lambda key, n: F.pmod(
            F.xxhash64(_as_long(key)), F.lit(int(n))
        ).cast("int"),
        "fuzzBits": lambda c, ratio=0.1: _lit(c),  # no-op stand-in (documented)
    })
    for seeded in ("murmurHash2_32WithSeed", "murmurHash2_64WithSeed",
                   "murmurHash3_32WithSeed", "murmurHash3_64WithSeed",
                   "murmurHash3_128WithSeed"):
        SCALAR.setdefault(seeded, lambda c, seed: F.xxhash64(_lit(c), _lit(seed)))
    for v2 in ("cityHash64V2", "farmHash64V2", "farmFingerprint64V2", "halfMD5V2",
               "hiveHashV2", "hiveCityHash64", "hiveCityHash64V2", "intHash32V2",
               "murmurHash2_32V2", "murmurHash2_64V2", "murmurHash3_32V2",
               "murmurHash3_64V2", "murmurHash2_32WithSeedV2",
               "murmurHash2_64WithSeedV2", "murmurHash3_32WithSeedV2",
               "murmurHash3_64WithSeedV2", "sipHash64V2", "xxHash32V2", "xxHash64V2",
               "sparkHashSimple", "flinkFieldHash", "fnv1aHashV2", "metroHash64V2"):
        base = v2[:-2] if v2.endswith("V2") else v2
        if base in SCALAR:
            SCALAR.setdefault(v2, SCALAR[base])
        else:
            SCALAR.setdefault(v2, lambda c: F.xxhash64(_lit(c)))
    R.VALUE_DIVERGENT_HASHES = frozenset(
        set(R.VALUE_DIVERGENT_HASHES) | {
            "xxHash32", "xxh3", "wyHash64", "fnv1aHash", "metroHash64",
            "gccMurmurHash", "murmurHash2_32", "murmurHash2_64", "murmurHash3_32",
            "murmurHash3_64", "murmurHash3_128", "sipHash64Keyed", "sipHash128Keyed",
            "sipHash128Reference", "sipHash128ReferenceKeyed", "sipHashBuitin",
            "kostikConsistentHash", "yandexConsistentHash", "cityHash64V2",
            "farmHash64V2", "farmFingerprint64V2", "halfMD5V2", "hiveHashV2",
            "hiveCityHash64", "hiveCityHash64V2", "sparkHashSimple", "flinkFieldHash",
        }
    )

    # ---- group 11: reinterpretAs* (reinterpretAs.cpp)
    for tn in ("Int8", "Int16", "Int32", "Int64", "Int128", "Int256",
               "UInt8", "UInt16", "UInt32", "UInt64", "UInt128", "UInt256",
               "Float32", "Float64", "String", "FixedString", "Date",
               "DateTime", "UUID"):
        SCALAR.setdefault(f"reinterpretAs{tn}", _reinterpret_as(tn))
    SCALAR.setdefault(
        "reinterpret", lambda c, t: _reinterpret_as(str(t).strip("'\""))(c)
    )

    # ---- group 12: random generators (FunctionsRandom.h, generateUUIDv4.cpp
    # neighborhood).  Rows-only by nature.
    add({
        "rand32": lambda *a: (F.rand() * (1 << 32)).cast("long"),
        "rand64": lambda *a: F.xxhash64(F.expr("uuid()")),
        "randCanonical": lambda *a: F.rand(),
        "randZeroToOne": lambda *a: F.rand(),
        "randomString": lambda n: _random_string(n, printable=False),
        "randomPrintableASCII": lambda n: _random_string(n, printable=True),
        "randomFixedString": lambda n: _random_string(n, printable=False),
        "randomStringUTF8": lambda n: _random_string(n, printable=True),
    })

    _install_batch2(SCALAR, AGG)
    _install_batch3(SCALAR, AGG)
    _install_batch4(SCALAR, AGG)
    _install_batch5(SCALAR, AGG)
    _install_batch6(SCALAR, AGG)
    _install_batch7(SCALAR, AGG)
    _install_batch8(SCALAR, AGG)


# --------------------------------------------------------------------------
# batch 2: vector math, morton codes, URL tail, token/match families,
# sample-size/z-test statistics, array fill/split folds, MAC/IP tail
# --------------------------------------------------------------------------

def _dot(a, b) -> "Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _l1(a) -> "Column":
    return F.aggregate(
        F.transform(a, lambda x: F.abs(x.cast("double"))), F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2sq(a) -> "Column":
    return _dot(a, a)


def _linf(a) -> "Column":
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))


def _lp(a, p) -> "Column":
    pf = float(p)
    return F.pow(
        F.aggregate(
            F.transform(a, lambda x: F.pow(F.abs(x.cast("double")), F.lit(pf))),
            F.lit(0.0), lambda acc, v: acc + v,
        ),
        F.lit(1.0 / pf),
    )


def _morton_encode(*cols) -> "Column":
    """mortonEncode (mortonEncode.cpp, MortonND LUT): bit i of argument j
    lands at position i*N + j (verified: mortonEncode(1,2,3) = 53).
    Literal-shift terms OR-folded (Spark shifts take literal counts only)."""
    n = len(cols)
    bits = 64 // n
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = _as_long(c)
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.getbit(cl, F.lit(i)).cast("long"), i * n + j)
            )
    return out


def _morton_decode(n, code) -> "Column":
    """mortonDecode(N, code) → array<long> of the N de-interleaved fields
    (reference returns a tuple; array here — documented deviation)."""
    n = int(n)
    bits = 64 // n
    cl = _as_long(code)
    fields = []
    for j in range(n):
        v = F.lit(0).cast("long")
        for i in range(bits):
            v = v.bitwiseOR(
                F.shiftleft(F.getbit(cl, F.lit(i * n + j)).cast("long"), i)
            )
        fields.append(v)
    return F.array(*fields)


def _norm_quantile(p: float) -> float:
    from statistics import NormalDist
    return NormalDist().inv_cdf(p)


def _phi(x: "Column") -> "Column":
    # standard normal CDF via erf identity; erf as Spark-side polynomial
    # (Abramowitz–Stegun 7.1.26, |err| < 1.5e-7 — matches the registry's erf)
    from byconity_spark.functions import registry as R
    return F.lit(0.5) * (F.lit(1.0) + R.SCALAR["erf"](x / F.lit(math.sqrt(2.0))))


def _proportions_ztest(sx, sy, tx, ty, conf, usevar="unpooled") -> "Column":
    """proportionsZTest (ztest.cpp): two-sample proportions z-test →
    struct(z_statistic, p_value, confidence_interval_low/high).  Quantile of
    the constant confidence level computed driver-side (exact); CDF via erf."""
    sx, sy, tx, ty = (_lit(v).cast("double") for v in (sx, sy, tx, ty))
    px, py = sx / tx, sy / ty
    diff = px - py
    se = F.sqrt(px * (1 - px) / tx + py * (1 - py) / ty)
    if str(usevar) == "pooled":
        p_pool = (sx + sy) / (tx + ty)
        z = diff / F.sqrt(p_pool * (1 - p_pool) * (1 / tx + 1 / ty))
    else:
        z = diff / se
    pval = F.lit(2.0) * (F.lit(1.0) - _phi(F.abs(z)))
    zq = F.lit(-_norm_quantile((1.0 - float(conf)) / 2.0))
    bad = (sx == 0) | (sy == 0) | (sx > tx) | (sy > ty)
    nan = F.lit(float("nan"))
    return F.struct(
        F.when(bad, nan).otherwise(z).alias("z_statistic"),
        F.when(bad, nan).otherwise(pval).alias("p_value"),
        F.when(bad, nan).otherwise(diff - zq * se).alias("confidence_interval_low"),
        F.when(bad, nan).otherwise(diff + zq * se).alias("confidence_interval_high"),
    )


def _min_sample_size_continous(baseline, sigma, mde, power, alpha) -> "Column":
    """minSampleSizeContinous (minSampleSize.cpp ContinousImpl):
    2σ²(Z_{1-α/2}+Z_{power})²/Δ², Δ = baseline·mde; mde/power/alpha are
    constant args (reference const_args={2,3,4})."""
    b = _lit(baseline).cast("double")
    s = _lit(sigma).cast("double")
    zsum = _norm_quantile(1.0 - float(alpha) / 2.0) + _norm_quantile(float(power))
    delta = b * F.lit(float(mde))
    n = F.lit(2.0) * s * s * F.lit(zsum ** 2) / (delta * delta)
    return F.struct(
        n.alias("minimum_sample_size"),
        (b - delta).alias("detect_range_lower"),
        (b + delta).alias("detect_range_upper"),
    )


def _min_sample_size_conversion(p1, mde, power, alpha) -> "Column":
    """minSampleSizeConversion (minSampleSize.cpp ConversionImpl):
    (Z_{1-α/2}·√(2p̄q̄) + Z_{power}·√(p1q1+p2q2))² / mde²."""
    p1c = _lit(p1).cast("double")
    mde_f, power_f, alpha_f = float(mde), float(power), float(alpha)
    q1 = 1 - p1c
    p2 = p1c + F.lit(mde_f)
    q2 = 1 - p2
    p_bar = (p1c + p2) / 2
    q_bar = 1 - p_bar
    za = F.lit(_norm_quantile(1.0 - alpha_f / 2.0))
    zp = F.lit(_norm_quantile(power_f))
    n = F.pow(za * F.sqrt(2 * p_bar * q_bar) + zp * F.sqrt(p1c * q1 + p2 * q2), F.lit(2.0)) \
        / F.lit(mde_f ** 2)
    return F.struct(
        n.alias("minimum_sample_size"),
        (p1c - F.lit(mde_f)).alias("detect_range_lower"),
        (p1c + F.lit(mde_f)).alias("detect_range_upper"),
    )


def _has_token(hay, tok, ci=False) -> "Column":
    # hasToken (hasToken.cpp, HasTokenImpl.h isTokenSeparator): token must be
    # bounded by ASCII non-alphanumerics (underscore IS a separator there;
    # non-ASCII chars are NOT separators)
    import re as _re
    bound_l = "(?<![A-Za-z0-9\u0080-\uffff])"
    bound_r = "(?![A-Za-z0-9\u0080-\uffff])"
    pat = bound_l + _re.escape(str(tok)) + bound_r
    if ci:
        pat = "(?i)" + pat
    return _lit(hay).rlike(pat).cast("int")


def _token_valid(tok) -> bool:
    # hasTokenOrNull returns NULL when the needle itself contains a token
    # separator (enable_separator_inside=false)
    import re as _re
    return bool(_re.fullmatch(r"[A-Za-z0-9]+", str(tok)))


def _array_fill(lam, arr, reverse=False) -> "Column":
    """arrayFill / arrayReverseFill (array/arrayFill.cpp): carry the last
    element that satisfied the predicate forward (backward for Reverse);
    leading (trailing) non-satisfying elements keep their value."""
    src = F.reverse(arr) if reverse else arr
    filled = F.aggregate(
        src,
        F.slice(src, 1, 0),  # empty array of the element type
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(
                    lam(x) | (F.size(acc) == 0), x
                ).otherwise(F.try_element_at(acc, F.lit(-1)))
            ),
        ),
    )
    return F.reverse(filled) if reverse else filled


def _array_split(lam, arr, reverse=False) -> "Column":
    """arraySplit / arrayReverseSplit (array/arraySplit.cpp): cut BEFORE
    each element where the predicate fires (AFTER, for Reverse)."""
    idx = F.sequence(F.lit(1), F.size(arr))
    if reverse:
        # cut after i ⇔ next group starts at i+1
        cut_starts = F.filter(
            idx, lambda i: (i == 1) | lam(F.element_at(arr, i - 1))
        )
    else:
        cut_starts = F.filter(
            idx, lambda i: (i == 1) | lam(F.element_at(arr, i))
        )
    bounds = F.concat(cut_starts, F.array(F.size(arr) + 1))
    return F.when(F.size(arr) == 0, F.slice(F.array(arr), 1, 0)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(cut_starts)),
            lambda k: F.slice(
                arr,
                F.element_at(bounds, k),
                F.element_at(bounds, k + 1) - F.element_at(bounds, k),
            ),
        )
    )


def _url_hierarchy(c, path_only=False) -> "Column":
    """URLHierarchy / URLPathHierarchy (URL/URLPathHierarchy.cpp):
    progressively longer prefixes cut at '/' boundaries; intermediate
    entries keep the trailing '/'."""
    url = _lit(c)
    proto = F.concat(F.parse_url(url, F.lit("PROTOCOL")), F.lit("://"))
    hostp = F.parse_url(url, F.lit("HOST"))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    prefix = F.lit("") if path_only else F.concat(proto, hostp)
    levels = F.transform(
        F.sequence(F.lit(1), F.size(segs)),
        lambda k: F.concat(
            prefix, F.lit("/"), F.array_join(F.slice(segs, 1, k), "/"),
            F.when(k < F.size(segs), F.lit("/")).otherwise(
                # final entry keeps trailing slash only if the path had one
                F.when(F.endswith(path, F.lit("/")), F.lit("/")).otherwise(F.lit(""))
            ),
        ),
    )
    if path_only:
        first = F.slice(F.array(F.lit("")), 1, 0)  # empty array<string>
    else:
        first = F.array(F.concat(prefix, F.lit("/")))
    return F.when(F.size(segs) == 0, first).otherwise(F.concat(first, levels))


def _mac_num_to_string(n) -> "Column":
    nl = _as_long(n)
    parts = [
        F.lpad(F.lower(F.hex(F.shiftright(nl, 8 * i).bitwiseAND(F.lit(255)))), 2, "0")
        for i in range(5, -1, -1)
    ]
    return F.concat_ws(":", *parts)


def _mac_string_to_num(s) -> "Column":
    parts = F.split(F.lower(_lit(s)), "[:-]")
    return F.aggregate(
        F.transform(parts, lambda p: F.conv(p, 16, 10).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: F.shiftleft(acc, 8).bitwiseOR(x),
    )


def _install_batch2(SCALAR: dict, AGG: dict) -> None:
    from byconity_spark.functions import registry as R

    def add(d: dict) -> None:
        for k, v in d.items():
            SCALAR.setdefault(k, v)

    # ---- vector norms/distances (array/arrayNorm.cpp kernels L1/L2/
    # L2Squared/Lp/Linf; arrayDistance.cpp adds Cosine; tuple aliases from
    # tupleOperators via registerAlias)
    norm_entries = {
        "L1Norm": _l1,
        "L2Norm": lambda a: F.sqrt(_l2sq(a)),
        "L2SquaredNorm": _l2sq,
        "LinfNorm": _linf,
        "LpNorm": lambda a, p: _lp(a, p),
        "L1Distance": lambda a, b: _l1(F.zip_with(a, b, lambda x, y: x - y)),
        "L2Distance": lambda a, b: F.sqrt(_l2sq(F.zip_with(a, b, lambda x, y: x - y))),
        "L2SquaredDistance": lambda a, b: _l2sq(F.zip_with(a, b, lambda x, y: x - y)),
        "LinfDistance": lambda a, b: _linf(F.zip_with(a, b, lambda x, y: x - y)),
        "LpDistance": lambda a, b, p: _lp(F.zip_with(a, b, lambda x, y: x - y), p),
        "cosineDistance": lambda a, b: F.lit(1.0)
        - _dot(a, b) / (F.sqrt(_l2sq(a)) * F.sqrt(_l2sq(b))),
        "dotProduct": _dot,
        "scalarProduct": _dot,
        "normalizeL1": lambda a: F.transform(a, lambda x: x.cast("double") / _l1(a)),
        "normalizeL2": lambda a: F.transform(
            a, lambda x: x.cast("double") / F.sqrt(_l2sq(a))
        ),
        "normalizeLinf": lambda a: F.transform(a, lambda x: x.cast("double") / _linf(a)),
        "normalizeLp": lambda a, p: F.transform(
            a, lambda x: x.cast("double") / _lp(a, p)
        ),
        "vectorSum": lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
        "vectorDifference": lambda a, b: F.zip_with(a, b, lambda x, y: x - y),
        "tupleNegate": lambda a: F.transform(a, lambda x: -x),
        "tupleHammingDistance": lambda a, b: F.size(
            F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda v: v)
        ).cast("long"),
    }
    add(norm_entries)
    for alias, src in (("normL1", "L1Norm"), ("normL2", "L2Norm"),
                       ("normL2Squared", "L2SquaredNorm"), ("normLinf", "LinfNorm"),
                       ("normLp", "LpNorm"), ("distanceL1", "L1Distance"),
                       ("distanceL2", "L2Distance"),
                       ("distanceL2Squared", "L2SquaredDistance"),
                       ("distanceLinf", "LinfDistance"), ("distanceLp", "LpDistance")):
        SCALAR.setdefault(alias, SCALAR[src])

    # ---- morton codes + consistent-hash-adjacent
    add({
        "mortonEncode": _morton_encode,
        "mortonDecode": _morton_decode,
    })

    # ---- A/B statistics (ztest.cpp, minSampleSize.cpp)
    add({
        "proportionsZTest": _proportions_ztest,
        "minSampleSizeContinous": _min_sample_size_continous,
        "minSampleSizeConversion": _min_sample_size_conversion,
    })

    # ---- token / multi-match families (hasToken.cpp, MultiMatchAnyImpl.h).
    # Needles/patterns are literal lists, matching the reference's
    # const-array requirement.
    add({
        "hasToken": lambda hay, tok: _has_token(hay, tok),
        "hasTokenCaseInsensitive": lambda hay, tok: _has_token(hay, tok, ci=True),
        "hasTokenOrNull": lambda hay, tok: (
            _has_token(hay, tok) if _token_valid(tok) else F.lit(None).cast("int")
        ),
        "hasTokenCaseInsensitiveOrNull": lambda hay, tok: (
            _has_token(hay, tok, ci=True) if _token_valid(tok)
            else F.lit(None).cast("int")
        ),
        # hasTokens = hasToken with enable_separator_inside=true (the needle
        # may be a phrase containing separators; still bounded by separators)
        "hasTokens": lambda hay, tok: _has_token(hay, tok),
        "hasTokenBySeperator": lambda hay, tok, seps: F.exists(
            F.split(_lit(hay), "[" + __import__("re").escape(str(seps)) + "]"),
            lambda e: e == F.lit(str(tok)),
        ).cast("int"),
        "multiMatchAny": lambda hay, pats: __import__("functools").reduce(
            lambda acc, p: acc | _lit(hay).rlike(p), list(pats), F.lit(False)
        ).cast("int"),
        "multiMatchAnyIndex": lambda hay, pats: F.coalesce(
            F.try_element_at(
                F.filter(
                    F.array(*[
                        F.when(_lit(hay).rlike(p), F.lit(i + 1))
                        for i, p in enumerate(pats)
                    ]),
                    lambda v: v.isNotNull(),
                ),
                F.lit(1),
            ),
            F.lit(0),
        ).cast("long"),
        "multiMatchAllIndices": lambda hay, pats: F.filter(
            F.array(*[
                F.when(_lit(hay).rlike(p), F.lit(i + 1).cast("long"))
                for i, p in enumerate(pats)
            ]),
            lambda v: v.isNotNull(),
        ),
    })

    # ---- splitBy* tail (FunctionsStringArray.cpp)
    add({
        "splitByAlpha": lambda c: F.filter(F.split(_lit(c), "[^A-Za-z]+"),
                                           lambda t: t != ""),
        "splitByNonAlpha": lambda c: F.filter(F.split(_lit(c), "[^A-Za-z0-9]+"),
                                              lambda t: t != ""),
        "splitByWhitespace": lambda c: F.filter(F.split(_lit(c), r"\s+"),
                                                lambda t: t != ""),
    })

    # ---- case-insensitive ngram/shingle variants (FunctionsStringHash.cpp,
    # FunctionsStringSimilarity.cpp).  The engine's base impls already
    # lowercase (documented), so CaseInsensitive == base; UTF8 == base
    # (Spark strings are UTF-8 native).
    for base_name in ("ngramDistance", "ngramSearch", "ngramSimHash",
                      "ngramMinHash", "wordShingleSimHash", "wordShingleMinHash"):
        if base_name in SCALAR:
            for suffix in ("CaseInsensitive", "CaseInsensitiveUTF8"):
                SCALAR.setdefault(base_name + suffix, SCALAR[base_name])
            SCALAR.setdefault(base_name + "UTF8", SCALAR[base_name])

    def _minhash_arg(hashes_and_grams, hashnum: int):
        # sort (hash, gram) pairs by hash; return lowest/highest gram sets
        pairs = F.array_sort(hashes_and_grams)
        lows = F.transform(F.slice(pairs, 1, hashnum), lambda s: s["gram"])
        his = F.transform(F.slice(F.reverse(pairs), 1, hashnum), lambda s: s["gram"])
        return F.struct(lows.alias("lowest"), his.alias("highest"))

    def _ngram_pairs(c, n: int):
        grams = R._char_ngrams(F.lower(_lit(c)), n)
        return F.transform(
            grams, lambda g: F.struct(F.xxhash64(g).alias("h"), g.alias("gram"))
        )

    def _shingle_pairs(c, k: int):
        words = F.split(F.lower(F.trim(_lit(c))), r"\s+")
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (k - 1), F.lit(1))),
            lambda i: F.struct(
                F.xxhash64(F.slice(words, i, k)).alias("h"),
                F.array_join(F.slice(words, i, k), " ").alias("gram"),
            ),
        )

    add({
        "ngramMinHashArg": lambda c, n=3, hashnum=6: _minhash_arg(
            _ngram_pairs(c, int(n)), int(hashnum)
        ),
        "wordShingleMinHashArg": lambda c, k=3, hashnum=6: _minhash_arg(
            _shingle_pairs(c, int(k)), int(hashnum)
        ),
    })
    for base_name in ("ngramMinHashArg", "wordShingleMinHashArg"):
        for suffix in ("CaseInsensitive", "CaseInsensitiveUTF8", "UTF8"):
            SCALAR.setdefault(base_name + suffix, SCALAR[base_name])

    # ---- array fill/split folds (array/arrayFill.cpp, arraySplit.cpp)
    add({
        "arrayFill": lambda lam, arr: _array_fill(lam, arr, reverse=False),
        "arrayReverseFill": lambda lam, arr: _array_fill(lam, arr, reverse=True),
        "arraySplit": lambda lam, arr: _array_split(lam, arr, reverse=False),
        "arrayReverseSplit": lambda lam, arr: _array_split(lam, arr, reverse=True),
    })

    # ---- URL tail (src/Functions/URL/).  RFC variants alias the base impl
    # (the RFC flavor differs only on malformed-authority edge cases);
    # Custom variants ignore the custom-TLD-list parameter (documented —
    # no TLD list files ship with this engine).
    add({
        "URLHierarchy": lambda c: _url_hierarchy(c, path_only=False),
        "URLPathHierarchy": lambda c: _url_hierarchy(c, path_only=True),
        "pathFull": lambda c: F.concat(
            F.coalesce(F.parse_url(_lit(c), F.lit("PATH")), F.lit("")),
            F.coalesce(
                F.concat(F.lit("?"), F.parse_url(_lit(c), F.lit("QUERY"))), F.lit("")
            ),
        ),
        "queryStringAndFragment": lambda c: F.concat(
            F.coalesce(F.parse_url(_lit(c), F.lit("QUERY")), F.lit("")),
            F.coalesce(
                F.concat(F.lit("#"), F.parse_url(_lit(c), F.lit("REF"))), F.lit("")
            ),
        ),
        "cutFragment": lambda c: F.substring_index(_lit(c), "#", 1),
        "cutQueryStringAndFragment": lambda c: F.substring_index(
            F.substring_index(_lit(c), "#", 1), "?", 1
        ),
        "cutURLParameter": lambda c, name: F.regexp_replace(
            _lit(c),
            r"(?<=[?&])" + __import__("re").escape(str(name)) + r"=[^&#]*&?",
            "",
        ),
        "decodeURLFormComponent": lambda c: F.url_decode(
            F.replace(_lit(c), F.lit("+"), F.lit("%20"))
        ),
        "encodeURLFormComponent": lambda c: F.replace(
            F.url_encode(_lit(c)), F.lit("%20"), F.lit("+")
        ),
        "port": lambda c, default=0: F.coalesce(
            F.regexp_extract(_lit(c), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:(\d+)", 1)
            .try_cast("int"),
            _lit(default).cast("int"),
        ),
    })
    for rfc, base_name in (
        ("domainRFC", "domain"), ("domainWithoutWWWRFC", "domainWithoutWWW"),
        ("topLevelDomainRFC", "topLevelDomain"), ("portRFC", "port"),
        ("firstSignificantSubdomainRFC", "firstSignificantSubdomain"),
        ("cutToFirstSignificantSubdomainRFC", "cutToFirstSignificantSubdomain"),
    ):
        if base_name in SCALAR:
            SCALAR.setdefault(rfc, SCALAR[base_name])
    # WithWWW variants: keep the www. prefix when present
    if "cutToFirstSignificantSubdomain" in SCALAR:
        base_ctfs = SCALAR["cutToFirstSignificantSubdomain"]
        for nm in ("cutToFirstSignificantSubdomainWithWWW",
                   "cutToFirstSignificantSubdomainWithWWWRFC"):
            SCALAR.setdefault(nm, base_ctfs)
        # Custom variants take (url, tld_list_name) — list ignored, documented
        for nm in ("cutToFirstSignificantSubdomainCustom",
                   "cutToFirstSignificantSubdomainCustomRFC",
                   "cutToFirstSignificantSubdomainCustomWithWWW",
                   "cutToFirstSignificantSubdomainCustomWithWWWRFC"):
            SCALAR.setdefault(nm, (lambda f: lambda c, lst=None: f(c))(base_ctfs))
    if "firstSignificantSubdomain" in SCALAR:
        fss = SCALAR["firstSignificantSubdomain"]
        for nm in ("firstSignificantSubdomainCustom",
                   "firstSignificantSubdomainCustomRFC"):
            SCALAR.setdefault(nm, (lambda f: lambda c, lst=None: f(c))(fss))

    # ---- MAC / IP tail (FunctionsCoding.cpp MACNumToString et al.)
    add({
        "MACNumToString": _mac_num_to_string,
        "MACStringToNum": _mac_string_to_num,
        "MACStringToOUI": lambda s: F.shiftright(_mac_string_to_num(s), 24),
        # IPv4-mapped IPv6 textual form (FunctionsCoding.cpp IPv4ToIPv6
        # produces the ::ffff:a.b.c.d mapping)
        "IPv4ToIPv6": lambda c: F.concat(F.lit("::ffff:"), _lit(c)),
        "isIPAddressInRange": _ip_in_range,
    })


def _ip_in_range(addr, cidr) -> "Column":
    """isIPAddressInRange (isIPAddressContainedIn.cpp) — exact for IPv4
    CIDRs; IPv6 falls back to textual prefix equality at nibble
    granularity (documented)."""
    cidr_s = _lit(cidr).cast("string")
    base_ip = F.substring_index(cidr_s, "/", 1)
    prefix = F.substring_index(cidr_s, "/", -1).try_cast("int")

    def ipv4_num(c):
        parts = F.split(c, r"\.")
        return F.aggregate(
            F.transform(parts, lambda p: p.try_cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: F.shiftleft(acc, 8).bitwiseOR(F.coalesce(x, F.lit(0))),
        )

    is_v4 = _lit(addr).rlike(r"^(\d{1,3}\.){3}\d{1,3}$") & base_ip.rlike(
        r"^(\d{1,3}\.){3}\d{1,3}$"
    )
    # IPv4: compare top `prefix` bits via floor-div by 2^(32-p) (shift
    # builtins need literal counts; division by an element of a literal
    # power array is equivalent)
    pow_arr = F.array(*[F.lit(float(2 ** i)) for i in range(33)])
    shift_div = F.element_at(pow_arr, (F.lit(33) - prefix).cast("int"))
    v4_match = F.floor(ipv4_num(_lit(addr)) / shift_div) == F.floor(
        ipv4_num(base_ip) / shift_div
    )
    # non-IPv4 fallback: exact-address equality (i.e. correct only for /128
    # IPv6 CIDRs — documented)
    return F.when(is_v4, v4_match).otherwise(
        F.lower(_lit(addr)) == F.lower(base_ip)
    ).cast("int")


# --------------------------------------------------------------------------
# batch 3: aggregate-name parity (registerAggregateFunctions.cpp tail) —
# SQL/MySQL-standard aliases, median variants, correlation matrices,
# mapped-array aggregates, two-sample test Column forms
# --------------------------------------------------------------------------

def _sorted_pairs(ts, v) -> "Column":
    return F.array_sort(F.collect_list(F.struct(ts.alias("t"), v.alias("v"))))


def _delta_sum_timestamp(v, ts) -> "Column":
    """deltaSumTimestamp (AggregateFunctionDeltaSumTimestamp.h): sum of
    positive increments taken in timestamp order.  Column form sorts the
    collected (ts, value) pairs — correct under any shuffle order."""
    pairs = _sorted_pairs(_lit(ts), _lit(v).cast("double"))
    return F.aggregate(
        pairs,
        F.struct(F.lit(None).cast("double").alias("last"),
                 F.lit(0.0).alias("total")),
        lambda acc, p: F.struct(
            p["v"].alias("last"),
            (acc["total"] + F.when(
                acc["last"].isNotNull() & (p["v"] > acc["last"]),
                p["v"] - acc["last"],
            ).otherwise(F.lit(0.0))).alias("total"),
        ),
        lambda acc: acc["total"],
    )


def _top_k(k, c, w=None) -> "Column":
    """topK(k)(x) / topKWeighted(k)(x, w) (AggregateFunctionTopK.cpp):
    deterministic exact top-k by (count|weight) desc, value asc tiebreak.
    O(n·d) per group in the Column form — the scale path for huge groups
    is the explode+groupBy top-k in operators/aggregates.py."""
    k = int(k)
    elems = F.collect_list(F.struct(
        _lit(c).cast("string").alias("v"),
        (F.lit(1).cast("double") if w is None else _lit(w).cast("double")).alias("w"),
    ))

    def score(vals):
        distinct = F.array_distinct(F.transform(vals, lambda s: s["v"]))
        return F.transform(
            distinct,
            lambda v: F.struct(
                (-F.aggregate(
                    F.filter(vals, lambda s: s["v"] == v),
                    F.lit(0.0), lambda acc, s: acc + s["w"],
                )).alias("negw"),
                v.alias("v"),
            ),
        )

    return F.transform(F.slice(F.array_sort(score(elems)), 1, k), lambda s: s["v"])


def _median_exact_pick(c, high: bool) -> "Column":
    # medianExactLow/High (QuantileExactLow.h): lower/upper middle ELEMENT
    # of the sorted multiset (no interpolation)
    srt = F.array_sort(F.collect_list(_lit(c)))
    n = F.size(srt)
    idx = F.when(
        n % 2 == 1, (n + 1) / 2
    ).otherwise((n / 2) + (1 if high else 0))
    return F.try_element_at(srt, idx.cast("int"))


def _mapped_arrays(op_name: str):
    """sum/min/maxMappedArrays(keys, values) (AggregateFunctionSumMap.h
    two-array form): per-key aggregation over parallel key/value arrays →
    struct(keys sorted asc, values).  O(n·d) fold per group."""
    ops = {
        "sum": lambda acc, x: acc + x,
        "min": F.least,
        "max": F.greatest,
    }
    op = ops[op_name]

    def builder(keys, values) -> "Column":
        flat = F.flatten(F.collect_list(
            F.zip_with(keys, values,
                       lambda a, b: F.struct(a.alias("k"), b.alias("v")))
        ))
        ks = F.array_sort(F.array_distinct(F.transform(flat, lambda s: s["k"])))
        vals = F.transform(
            ks,
            lambda kk: F.aggregate(
                F.transform(
                    F.filter(flat, lambda s: s["k"] == kk), lambda s: s["v"]
                ),
                F.lit(None).cast("double"),
                lambda acc, x: F.when(acc.isNull(), x.cast("double")).otherwise(
                    op(acc, x.cast("double"))
                ),
            ),
        )
        return F.struct(ks.alias("keys"), vals.alias("values"))

    return builder


def _ranks_with_ties(vals) -> "Column":
    # average-tie ranks of each element within the array (1-based):
    # rank(v) = #(x < v) + (#(x == v) + 1)/2.  O(n²) fold per group.
    return F.transform(
        vals,
        lambda v: F.size(F.filter(vals, lambda x: x < v)).cast("double")
        + (F.size(F.filter(vals, lambda x: x == v)) + 1) / 2.0,
    )


def _mann_whitney_u(c, idx) -> "Column":
    """mannWhitneyUTest(sample, index) (AggregateFunctionMannWhitney.h):
    exact U via average-tie ranks; p-value from the normal approximation
    with tie correction — the same large-sample approximation the
    reference uses."""
    pairs = F.collect_list(F.struct(_lit(c).cast("double").alias("v"),
                                    _lit(idx).cast("int").alias("g")))
    vals = F.transform(pairs, lambda s: s["v"])
    ranks = _ranks_with_ties(vals)
    n = F.size(pairs)
    n1 = F.size(F.filter(pairs, lambda s: s["g"] == 0)).cast("double")
    n2 = n.cast("double") - n1
    r1 = F.aggregate(
        F.zip_with(pairs, ranks,
                   lambda s, r: F.when(s["g"] == 0, r).otherwise(F.lit(0.0))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    u1 = r1 - n1 * (n1 + 1) / 2
    # tie correction: sum over tie groups of (t³ - t)
    counts = F.transform(
        F.array_distinct(vals),
        lambda v: F.size(F.filter(vals, lambda x: x == v)).cast("double"),
    )
    tie_term = F.aggregate(counts, F.lit(0.0),
                           lambda acc, t: acc + t * t * t - t)
    nn = n.cast("double")
    mu = n1 * n2 / 2
    sigma = F.sqrt(n1 * n2 / 12 * ((nn + 1) - tie_term / (nn * (nn - 1))))
    z = (u1 - mu) / sigma
    p = F.lit(2.0) * (F.lit(1.0) - _phi(F.abs(z)))
    return F.struct(u1.alias("u_statistic"), F.least(p, F.lit(1.0)).alias("p_value"))


def _welch_t(c, idx) -> "Column":
    """welchTTest(sample, index) (AggregateFunctionTTest.h WelchTTestData):
    exact t statistic; p-value via the normal approximation of the
    t-distribution (documented deviation — exact for large df)."""
    x0 = F.when(_lit(idx) == 0, _lit(c).cast("double"))
    x1 = F.when(_lit(idx) == 1, _lit(c).cast("double"))
    m0, m1 = F.avg(x0), F.avg(x1)
    v0, v1 = F.var_samp(x0), F.var_samp(x1)
    n0, n1 = F.count(x0).cast("double"), F.count(x1).cast("double")
    se2 = v0 / n0 + v1 / n1
    t = (m0 - m1) / F.sqrt(se2)
    p = F.lit(2.0) * (F.lit(1.0) - _phi(F.abs(t)))
    return F.struct(t.alias("t_statistic"), p.alias("p_value"))


def _mean_z_test(c, idx, pop_var_x=1.0, pop_var_y=1.0, conf=0.95) -> "Column":
    """meanZTest(sample, index)(σx², σy², conf) (meanZTest.cpp): two-sample
    z-test with KNOWN population variances — exact closed form."""
    x0 = F.when(_lit(idx) == 0, _lit(c).cast("double"))
    x1 = F.when(_lit(idx) == 1, _lit(c).cast("double"))
    m0, m1 = F.avg(x0), F.avg(x1)
    n0, n1 = F.count(x0).cast("double"), F.count(x1).cast("double")
    se = F.sqrt(F.lit(float(pop_var_x)) / n0 + F.lit(float(pop_var_y)) / n1)
    z = (m0 - m1) / se
    p = F.lit(2.0) * (F.lit(1.0) - _phi(F.abs(z)))
    zq = F.lit(-_norm_quantile((1.0 - float(conf)) / 2.0))
    return F.struct(
        z.alias("z_statistic"), p.alias("p_value"),
        ((m0 - m1) - zq * se).alias("confidence_interval_low"),
        ((m0 - m1) + zq * se).alias("confidence_interval_high"),
    )


def _rank_corr(x, y) -> "Column":
    """rankCorr(x, y) (AggregateFunctionRankCorr.h): Spearman ρ = Pearson
    correlation of average-tie ranks.  Exact; O(n²) fold per group."""
    pairs = F.collect_list(F.struct(_lit(x).cast("double").alias("x"),
                                    _lit(y).cast("double").alias("y")))
    rx = _ranks_with_ties(F.transform(pairs, lambda s: s["x"]))
    ry = _ranks_with_ties(F.transform(pairs, lambda s: s["y"]))
    n = F.size(pairs).cast("double")
    sx = F.aggregate(rx, F.lit(0.0), lambda a, v: a + v)
    sy = F.aggregate(ry, F.lit(0.0), lambda a, v: a + v)
    sxy = F.aggregate(F.zip_with(rx, ry, lambda a, b: a * b), F.lit(0.0),
                      lambda a, v: a + v)
    sx2 = F.aggregate(rx, F.lit(0.0), lambda a, v: a + v * v)
    sy2 = F.aggregate(ry, F.lit(0.0), lambda a, v: a + v * v)
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sx2 / n - (sx / n) * (sx / n)
    vy = sy2 / n - (sy / n) * (sy / n)
    return cov / F.sqrt(vx * vy)


def _install_batch3(SCALAR: dict, AGG: dict) -> None:
    from byconity_spark.functions import registry as R

    # SQL/MySQL-standard aliases (registerAggregateFunctions.cpp
    # CaseInsensitive registrations; MySQL STD/STDDEV/VARIANCE are the
    # POPULATION forms)
    AGG_ALIASES = {
        "STD": "stddevPop", "STDDEV": "stddevPop", "STDDEV_POP": "stddevPop",
        "STDDEV_SAMP": "stddevSamp", "VARIANCE": "varPop", "VAR_POP": "varPop",
        "VAR_SAMP": "varSamp", "COVAR_POP": "covarPop", "COVAR_SAMP": "covarSamp",
        "BIT_AND": "groupBitAnd", "BIT_OR": "groupBitOr", "BIT_XOR": "groupBitXor",
        "any_value": "any", "first_value": "any", "last_value": "anyLast",
        "groupArbitrary": "arbitrary",
        "sumWithOverflow": "sum",  # UInt64→long wraps anyway (documented)
        "uniqCombined64": "uniqCombined",
        "medianDeterministic": "medianExact",
        "hll": "uniqHLL12",
        # stable (Kahan) flavors: Spark's JVM aggregates are the baseline —
        # same double rounding class (documented)
        "corrStable": "corr", "covarPopStable": "covarPop",
        "covarSampStable": "covarSamp", "stddevPopStable": "stddevPop",
        "stddevSampStable": "stddevSamp", "varPopStable": "varPop",
        "varSampStable": "varSamp",
    }
    for tgt, src in AGG_ALIASES.items():
        if src in AGG:
            AGG.setdefault(tgt, AGG[src])

    def addA(d: dict) -> None:
        for k, v in d.items():
            AGG.setdefault(k, v)

    addA({
        "GROUP_CONCAT": lambda c, sep=",": F.array_join(
            F.array_sort(F.collect_list(_lit(c).cast("string"))), sep
        ),
        # anyHeavy (AggregateFunctionAnyHeavy.h): a frequently-occurring
        # value; the exact mode is a valid (and deterministic) answer
        "anyHeavy": lambda c: F.mode(c),
        "topK": lambda k, c: _top_k(k, c),
        "topKWeighted": lambda k, c, w: _top_k(k, c, w),
        "medianExactLow": lambda c: _median_exact_pick(c, high=False),
        "medianExactHigh": lambda c: _median_exact_pick(c, high=True),
        "medianExactWeighted": lambda c, w: F.percentile(
            _lit(c), F.lit(0.5), _lit(w).cast("long")
        ),
        "medianInterpolatedWeighted": lambda c, w: F.percentile(
            _lit(c), F.lit(0.5), _lit(w).cast("long")
        ),
        "medianTDigest": lambda c: F.percentile_approx(_lit(c), F.lit(0.5)),
        "medianTDigestWeighted": lambda c, w: F.percentile(
            _lit(c), F.lit(0.5), _lit(w).cast("long")
        ),
        "medianTiming": lambda c: F.percentile_approx(_lit(c), F.lit(0.5)),
        "medianTimingWeighted": lambda c, w: F.percentile(
            _lit(c), F.lit(0.5), _lit(w).cast("long")
        ),
        "medianBFloat16": lambda c: F.percentile_approx(_lit(c), F.lit(0.5)),
        "medianBFloat16Weighted": lambda c, w: F.percentile(
            _lit(c), F.lit(0.5), _lit(w).cast("long")
        ),
        # correlation/covariance matrices (AggregateFunctionCorrMatrix.cpp):
        # symmetric matrix as array<array<double>>
        "corrMatrix": lambda *cols: F.array(*[
            F.array(*[F.corr(a, b) for b in cols]) for a in cols
        ]),
        "covarPopMatrix": lambda *cols: F.array(*[
            F.array(*[F.covar_pop(a, b) for b in cols]) for a in cols
        ]),
        "covarSampMatrix": lambda *cols: F.array(*[
            F.array(*[F.covar_samp(a, b) for b in cols]) for a in cols
        ]),
        "sumMappedArrays": _mapped_arrays("sum"),
        "minMappedArrays": _mapped_arrays("min"),
        "maxMappedArrays": _mapped_arrays("max"),
        "sumMapWithOverflow": lambda m: R._apply_map("sum", m),
        "deltaSumTimestamp": _delta_sum_timestamp,
        "groupArrayLast": lambda n, c: F.slice(
            F.collect_list(c), -int(n), int(n)
        ),
        # moving aggregates over the group in sorted order (deterministic —
        # the reference's arrival order is not reproducible under shuffle;
        # documented like groupConcat)
        "groupArrayMovingSum": lambda c, n=None: (
            lambda vals: F.transform(
                F.sequence(F.lit(1), F.size(vals)),
                lambda i: F.aggregate(
                    F.slice(
                        vals,
                        F.greatest(F.lit(1), i - (int(n) - 1)) if n else F.lit(1),
                        (F.least(i, F.lit(int(n))) if n else i).cast("int"),
                    ),
                    F.lit(0.0), lambda acc, x: acc + x.cast("double"),
                ),
            )
        )(F.array_sort(F.collect_list(c))),
        "groupArrayMovingAvg": lambda c, n=None: (
            lambda vals: F.transform(
                F.sequence(F.lit(1), F.size(vals)),
                lambda i: F.aggregate(
                    F.slice(
                        vals,
                        F.greatest(F.lit(1), i - (int(n) - 1)) if n else F.lit(1),
                        (F.least(i, F.lit(int(n))) if n else i).cast("int"),
                    ),
                    F.lit(0.0), lambda acc, x: acc + x.cast("double"),
                ) / (F.least(i, F.lit(int(n))) if n else i).cast("double"),
            )
        )(F.array_sort(F.collect_list(c))),
        "nothing": lambda c=None: F.max(F.lit(None)),
        "mannWhitneyUTest": _mann_whitney_u,
        "welchTTest": _welch_t,
        "meanZTest": _mean_z_test,
        "rankCorr": _rank_corr,
    })


def _install_batch4(SCALAR: dict, AGG: dict) -> None:
    # uniqTheta set-operation scalar names (reference uniqTheta family):
    # operate on theta states produced by udafs/sketches.theta_state.
    def _lazy(fn_name):
        def call(a, b):
            from byconity_spark.udafs import sketches
            return getattr(sketches, fn_name)(a, b)
        return call

    SCALAR.setdefault("uniqThetaUnion", _lazy("theta_union_col"))
    SCALAR.setdefault("uniqThetaIntersect", _lazy("theta_intersect_col"))
    SCALAR.setdefault("uniqThetaNot", _lazy("theta_not_col"))

    def _theta_est(c):
        from byconity_spark.udafs import sketches
        return sketches.theta_set_estimate(c)

    SCALAR.setdefault("uniqThetaSetEstimate", _theta_est)


def _install_batch5(SCALAR: dict, AGG: dict) -> None:
    # groupArraySample(k[, seed])(x) (AggregateFunctionGroupArraySample.h):
    # k-sized sample of the group.  Deterministic here: order by
    # xxhash64(value, seed) and slice — a valid sample draw that is also
    # shuffle-reproducible (the reference's RNG sample is not).
    def _group_array_sample(k, c, seed=0):
        pairs = F.collect_list(F.struct(
            F.xxhash64(_lit(c), F.lit(int(seed))).alias("h"), _lit(c).alias("v")
        ))
        return F.transform(
            F.slice(F.array_sort(pairs), 1, int(k)), lambda s: s["v"]
        )

    AGG.setdefault("groupArraySample", _group_array_sample)
    # histogram(bins)(x) (AggregateFunctionHistogram.h): adaptive
    # bins-by-merging — mapped to Spark's histogram_numeric (same adaptive
    # family, different merge rule; documented stand-in, mirrors the SQL
    # frontend's parametric rule)
    AGG.setdefault(
        "histogram",
        lambda bins, c: F.call_function("histogram_numeric", _lit(c),
                                        F.lit(int(bins))),
    )


def _spark_partition(value, split_number) -> "Column":
    """sparkpartition(x, n) (reference sparkpartition.cpp): bucket id =
    abs(HiveIntHash::intHash64(x) % n), where intHash64 is the fmix64-style
    mix (k0=0xff51afd7ed558ccd, k1=0xc4ceb9fe1a85ec53) computed in
    UNBOUNDED BigInteger precision — the multiplies do NOT wrap to 64 bits
    (hiveIntHash.cpp), so the standard fmix64 is NOT equivalent.  Exact
    python-int replication in an Arrow kernel."""
    n = int(split_number)
    K0 = 18397679294719823053
    K1 = 14181476777654086739

    @F.pandas_udf("long")
    def k(vals: pd.Series) -> pd.Series:
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            x = int(v)
            x ^= x >> 33
            x *= K0
            x ^= x >> 33
            x *= K1
            x ^= x >> 33
            out.append(abs(x % n) if n else 0)
        return pd.Series(out, dtype="object")

    return k(_lit(value).cast("long"))


def _install_batch6(SCALAR: dict, AGG: dict) -> None:
    from byconity_spark.functions import registry as R

    SCALAR.setdefault("sparkpartition", _spark_partition)
    # dtspartition/dmpPartition (dtspartition.cpp, dtsCityHash): city-hash
    # bucket ids — xxhash64-backed stand-ins, flagged value-divergent
    SCALAR.setdefault("dtspartition", lambda v, n: F.pmod(
        F.xxhash64(_lit(v)), F.lit(int(n))
    ))
    SCALAR.setdefault("dmpPartition", SCALAR["dtspartition"])
    R.VALUE_DIVERGENT_HASHES = frozenset(
        set(R.VALUE_DIVERGENT_HASHES) | {"dtspartition", "dmpPartition"}
    )


def _install_batch7(SCALAR: dict, AGG: dict) -> None:
    from byconity_spark.functions import registry as R

    _MJD_EPOCH = "1858-11-17"  # Modified Julian Day 0
    add = SCALAR.setdefault
    add("visitParamExtractUInt", lambda c, key: F.get_json_object(
        _lit(c), f"$.{key}"
    ).try_cast("bigint"))
    add("toModifiedJulianDayOrNull", lambda c: F.datediff(
        _lit(c).try_cast("date"), F.lit(_MJD_EPOCH).cast("date")
    ).cast("long"))
    add("fromModifiedJulianDay", lambda n: F.date_add(
        F.lit(_MJD_EPOCH).cast("date"), _as_long(n).cast("int")
    ))
    add("fromModifiedJulianDayOrNull", lambda n: F.date_add(
        F.lit(_MJD_EPOCH).cast("date"),
        _lit(n).try_cast("long").cast("int"),
    ))
    # multiplyDecimal/divideDecimal(a, b[, result_scale])
    # (FunctionsDecimalArithmetics.h): explicit result scale (default 0 for
    # multiply per the reference; keep the operand scale when omitted here
    # — documented: Spark decimals carry their own scale inference)
    add("multiplyDecimal", lambda a, b, scale=None: (
        (_lit(a) * _lit(b)).cast(f"decimal(38,{int(scale)})")
        if scale is not None else _lit(a) * _lit(b)
    ))
    # isDecimalOverflow(x, precision): |x| needs more than `precision`
    # digits (FunctionsDecimalArithmetics isDecimalOverflow) — digit count
    # via the decimal's string form (exact, no double comparison)
    add("isDecimalOverflow", lambda x, precision=38: (
        F.length(F.abs(_lit(x).cast("decimal(38,0)")).cast("string"))
        > int(precision)
    ).cast("int"))
    # subBitmapStartsFromOne: subBitmap with CH's 1-based offset form
    if "subBitmap" in SCALAR:
        add("subBitmapStartsFromOne",
            lambda bm, o, l: SCALAR["subBitmap"](bm, int(o) - 1, l))


def _extract_all_groups(c, pat: str) -> "Column":
    """extractAllGroups (extractAllGroups.h Horizontal): one array per
    capture group, each holding that group's value from every match.
    Group count read from the compiled pattern driver-side."""
    import re as _re
    n_groups = _re.compile(str(pat)).groups
    return F.array(*[
        F.regexp_extract_all(_lit(c), F.lit(str(pat)), i)
        for i in range(1, n_groups + 1)
    ])


_RTD_ORDER = ["years", "months", "days", "hours", "minutes", "seconds"]
_RTD_SIZES = {"years": 31536000, "months": 2635200, "days": 86400,
              "hours": 3600, "minutes": 60, "seconds": 1}


def _rtd_double_str(v: float) -> str:
    """double-conversion ToShortest as the reference's writeFloatText
    prints it: fixed notation for integral values below 1e21, shortest
    exponent form with NO '+' sign otherwise, inf/-inf/nan spelled."""
    import math

    v = float(v)  # math.floor returns an exact bignum int in py3
    if math.isnan(v):
        return "nan"
    if math.isinf(v):
        return "-inf" if v < 0 else "inf"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    return repr(v).replace("e+", "e")


def rtd_format(value: float, max_unit: str = "years") -> str:
    """Reference-exact formatReadableTimeDelta
    (formatReadableTimeDelta.cpp:135-222): per-unit Duff-device
    decomposition with ', '/' and ' separators, the huge-double
    short-circuit (value + 1.0 == value), 30.5-day months, and
    writeFloatText for non-finite input."""
    import math

    if max_unit not in _RTD_ORDER:
        raise ValueError(
            "BAD_ARGUMENTS (36): Unexpected value of maximum unit "
            f"argument ({max_unit}) for function "
            "formatReadableTimeDelta, the only allowed values are: "
            "'seconds', 'minutes', 'hours', 'days', 'months', 'years'."
        )
    value = float(value)
    if math.isnan(value) or math.isinf(value):
        return _rtd_double_str(value)
    out = []
    if value < 0:
        out.append("-")
        value = -value
    has = False
    for u in _RTD_ORDER[_RTD_ORDER.index(max_unit):]:
        us = _RTD_SIZES[u]
        if value + 1.0 == value:
            # too large for exact smaller units — floor-print and stop
            out.append(_rtd_double_str(math.floor(value / us)))
            out.append(" " + u[:-1] + "s")
            has = True
            value = 0.0
            continue
        num = int(value / us)
        if num == 0 and (us > 1 or has):
            continue
        value -= num * us
        if has:
            out.append(" and " if value < 1 else ", ")
        out.append(str(num) + " " + u[:-1] + ("s" if num != 1 else ""))
        has = True
    return "".join(out)


def rtd_sql_kernel():
    """pandas-UDF kernel for the SQL name chFormatReadableTimeDelta.
    SQL NULL propagates as NULL (the reference's Nullable adaptor —
    r11 ADVICE #5); only a genuine Float64 NaN VALUE prints 'nan'
    like the reference's Float64 serialization (01679)."""
    @F.pandas_udf("string")
    def k(v: pd.Series, u: pd.Series) -> pd.Series:
        return pd.Series([
            None if x is None
            else rtd_format(float(x), "years" if mu is None else mu)
            for x, mu in zip(v.tolist(), u)
        ])

    return k


def _format_readable_time_delta(sec, max_unit="years") -> "Column":
    """formatReadableTimeDelta (formatReadableTimeDelta.cpp) — exact
    reference text via the vectorized rtd_format kernel."""
    unit_col = (_lit(max_unit) if not isinstance(max_unit, str)
                else F.lit(str(max_unit)))

    @F.pandas_udf("string")
    def k(v: pd.Series, u: pd.Series) -> pd.Series:
        return pd.Series([
            None if x is None else rtd_format(x, mu)
            for x, mu in zip(v.astype("float64"), u)
        ])

    return k(_lit(sec).cast("double"), unit_col)


def _point_in_ellipses(x, y, *params) -> "Column":
    """pointInEllipses (pointInEllipses.cpp): true when (x, y) falls inside
    ANY of the (x0, y0, a, b) ellipses."""
    if len(params) % 4 != 0 or not params:
        raise ValueError("pointInEllipses(x, y, x0, y0, a0, b0, ...)")
    xd, yd = _lit(x).cast("double"), _lit(y).cast("double")
    import functools
    terms = []
    for i in range(0, len(params), 4):
        x0, y0, a, b = (_lit(p).cast("double") for p in params[i:i + 4])
        terms.append(
            ((xd - x0) / a) * ((xd - x0) / a) + ((yd - y0) / b) * ((yd - y0) / b)
            <= F.lit(1.0)
        )
    return functools.reduce(lambda p, q: p | q, terms).cast("int")


def _json_merge_patch(*docs) -> "Column":
    """jsonMergePatch (jsonMergePatch.cpp; RFC 7386): right-to-left object
    merge, null values delete keys.  Arrow kernel over the json module —
    exact per the RFC."""
    import json as _json

    def merge(a, b):
        if not isinstance(a, dict) or not isinstance(b, dict):
            return b
        out = dict(a)
        for k, v in b.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = merge(out.get(k), v)
        return out

    @F.pandas_udf("string")
    def k(*cols: pd.Series) -> pd.Series:
        out = []
        for vals in zip(*cols):
            acc = None
            try:
                for v in vals:
                    doc = _json.loads(v) if v is not None else None
                    acc = doc if acc is None else merge(acc, doc)
                out.append(_json.dumps(acc, separators=(",", ":"),
                                       sort_keys=True))
            except (ValueError, TypeError):
                out.append(None)
        return pd.Series(out)

    return k(*[_lit(d) for d in docs])


def _install_batch8(SCALAR: dict, AGG: dict) -> None:
    add = SCALAR.setdefault
    add("extractAllGroups", _extract_all_groups)
    add("extractAllGroupsHorizontal", _extract_all_groups)
    add("formatReadableTimeDelta", _format_readable_time_delta)
    add("pointInEllipses", _point_in_ellipses)
    add("jsonMergePatch", _json_merge_patch)
    add("JSONMergePatch", _json_merge_patch)
    if "concatWithSeparator" in SCALAR:
        add("concatWithSeparatorAssumeInjective", SCALAR["concatWithSeparator"])

    def _has_column_in_table(*args):
        # hasColumnInTable([host, user, pw,] db, table, column) — catalog
        # probe against the ACTIVE session (remote forms resolve locally)
        from pyspark.sql import SparkSession
        db, table, column = (str(a).strip("'\"") for a in args[-3:])
        spark = SparkSession.getActiveSession()
        try:
            cols = [f.name for f in spark.table(f"{db}.{table}").schema.fields] \
                if db else [f.name for f in spark.table(table).schema.fields]
            return F.lit(1 if column in cols else 0)
        except Exception:
            return F.lit(0)

    add("hasColumnInTable", _has_column_in_table)
    add("getEnv", lambda name: F.lit(
        __import__("os").environ.get(str(name).strip("'\""))
    ))
    # arrayEnumerate*Ranked default arity (rank = outermost array) is
    # exactly the unranked form (arrayEnumerate*Ranked.cpp: max_depth=1)
    if "arrayEnumerateUniq" in SCALAR:
        add("arrayEnumerateUniqRanked", SCALAR["arrayEnumerateUniq"])
    if "arrayEnumerateDense" in SCALAR:
        add("arrayEnumerateDenseRanked", SCALAR["arrayEnumerateDense"])
