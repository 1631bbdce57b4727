"""ClickHouse/ByConity function-name registry → PySpark Column builders.

This is the compatibility surface SURVEY §4 calls the "#1 custom piece worth
building": the reference registers ~591 scalar-function files
(src/Functions/, 1185 registerFunction call sites) and an aggregate-function
factory with combinator suffixes
(src/AggregateFunctions/registerAggregateFunctions.cpp:140-152 — -If,
-Distinct, -Array, -OrNull, ...).  Here every CH name maps to a JVM-side
Column expression (whole-stage-codegen'd, never a Python UDF), and the
combinator engine composes aggregate names the same way CH's factory does.

Usage:
    from byconity_spark.functions import ch
    ch("toStartOfHour", F.col("ts"))
    ch("sumIf", F.col("x"), F.col("x") > 0)      # combinator-resolved
    ch("arrayMap", lambda x: x * 2, F.col("arr"))

Byte-compatibility notes (documented deviations):
  * cityHash64/sipHash64 map to Spark's xxhash64 — stable within this
    engine, NOT bit-identical to ClickHouse's hash values.
  * round follows CH's banker's rounding via ``roundBankers``; plain
    ``round`` is half-up like Spark/ANSI.
  * UInt64 maps to LongType (overflow wraps; documented in SURVEY §1.2).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import pandas as pd

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


class UnknownFunctionError(KeyError):
    pass


# =========================================================================
# Scalar functions
# =========================================================================

def _to_day_of_week(c: Column) -> Column:
    # CH: Monday=1..Sunday=7 (ISO); Spark dayofweek: Sunday=1
    return ((F.dayofweek(c) + 5) % 7) + 1


def _multi_if(*args) -> Column:
    # multiIf(c1, v1, c2, v2, ..., default); CH conditions may be UInt8 —
    # the boolean cast coerces nonzero→true like the reference
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("multiIf expects cond1, val1, ..., default")
    conds, default = args[:-1], args[-1]
    expr = F.when(conds[0].cast("boolean"), conds[1])
    for i in range(2, len(conds), 2):
        expr = expr.when(conds[i].cast("boolean"), conds[i + 1])
    return expr.otherwise(default)


_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _date_diff(unit: str, start: Column, end: Column) -> Column:
    """CH dateDiff(unit, a, b): count of unit BOUNDARIES crossed (same
    semantics as DuckDB date_diff)."""
    unit = unit.lower()
    if unit in _UNIT_SECONDS:
        secs = _UNIT_SECONDS[unit]
        return (
            (
                F.unix_timestamp(F.date_trunc(unit, end))
                - F.unix_timestamp(F.date_trunc(unit, start))
            )
            / secs
        ).cast("long")
    if unit == "month":
        return (
            (F.year(end) * 12 + F.month(end)) - (F.year(start) * 12 + F.month(start))
        ).cast("long")
    if unit == "quarter":
        return (
            (F.year(end) * 4 + F.quarter(end)) - (F.year(start) * 4 + F.quarter(start))
        ).cast("long")
    if unit == "year":
        return (F.year(end) - F.year(start)).cast("long")
    raise ValueError(f"dateDiff: unsupported unit {unit!r}")


_CH_FMT = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%c": "M", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss", "%p": "a", "%j": "DDD",
    "%a": "EEE", "%b": "MMM", "%W": "EEEE", "%F": "yyyy-MM-dd",
    "%T": "HH:mm:ss", "%D": "MM/dd/yy", "%R": "HH:mm", "%n": "\n", "%t": "\t",
    "%%": "%",
}


def ch_datetime_pattern(fmt: str) -> str:
    """Translate a ClickHouse %-code datetime format to a Spark pattern,
    quoting literal runs so pattern letters stay literal.  Shared by the
    Column-API formatDateTime and the SQL frontend's rewrite."""
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if literal:
            run = "".join(literal)
            if any(ch_.isalpha() or ch_ == "'" for ch_ in run):
                out.append("'" + run.replace("'", "''") + "'")
            else:
                out.append(run)
            literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i : i + 2]
            if code not in _CH_FMT:
                raise ValueError(f"formatDateTime: unsupported code {code!r}")
            flush_literal()
            out.append(_CH_FMT[code])
            i += 2
        else:
            literal.append(fmt[i])
            i += 1
    flush_literal()
    return "".join(out)


def _format_date_time(c: Column, fmt: str) -> Column:
    """CH formatDateTime via the shared %-code translation."""
    return F.date_format(c, ch_datetime_pattern(fmt))


def _jpath(keys: tuple) -> str:
    """ClickHouse JSONExtract key list -> Spark JSONPath: strings descend
    objects, ints index arrays 1-based (JSONPath is 0-based)."""
    parts = []
    for k in keys:
        if isinstance(k, bool):
            raise TypeError("JSON path keys must be str or int")
        if isinstance(k, int):
            if k <= 0:
                raise ValueError(
                    "JSON array index must be positive (Spark JSONPath has no "
                    "from-the-end indexing)"
                )
            parts.append(f"[{k - 1}]")
        else:
            parts.append(f".{k}")
    return "$" + "".join(parts)


def _split_by_char(sep: str, c: Column) -> Column:
    import re as _re

    return F.split(c, _re.escape(sep))


def _replace_one(c: Column, search: str, repl: str) -> Column:
    pos = F.instr(c, search)
    return F.when(
        pos > 0,
        F.concat(
            F.substring(c, F.lit(1), pos - 1),
            F.lit(repl),
            F.substring(c, pos + len(search), F.length(c)),
        ),
    ).otherwise(c)


def _extract_url_parameter(c: Column, name: str) -> Column:
    return F.coalesce(F.parse_url(c, F.lit("QUERY"), F.lit(name)), F.lit(""))


def _char_ngrams(c: Column, n: int) -> Column:
    """Distinct char n-gram shingles of a string column."""
    return F.when(
        F.length(c) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - (n - 1)),
                lambda i: F.substring(c, i, n),
            )
        ),
    ).otherwise(F.array(c))


def _array_sum(c: Column) -> Column:
    return F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def _array_avg(c: Column) -> Column:
    return _array_sum(c) / F.size(c)


def _gcd_col(a: Column, b: Column) -> Column:
    """gcd via a runtime Euclid fold: F.aggregate over a 96-step sequence
    keeps the expression tree CONSTANT-size (a naive unroll doubles the
    tree per round), and 96 iterations exceed the worst-case step count
    for 64-bit operands (~92, the Fibonacci pair bound).  Once y hits 0
    the state is a fixpoint."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(96)),
        F.struct(
            F.abs(a.cast("long")).alias("x"), F.abs(b.cast("long")).alias("y")
        ),
        lambda acc, _: F.struct(
            F.when(acc.y == 0, acc.x).otherwise(acc.y).alias("x"),
            F.when(acc.y == 0, F.lit(0).cast("long"))
            .otherwise(acc.x % acc.y)
            .alias("y"),
        ),
        lambda acc: acc.x,
    )


def _haversine_m(lon1, lat1, lon2, lat2) -> Column:
    """Great-circle metres via haversine, radius 6371 km."""
    to_c = lambda x: x if isinstance(x, Column) else F.lit(x)  # noqa: E731
    lon1, lat1, lon2, lat2 = to_c(lon1), to_c(lat1), to_c(lon2), to_c(lat2)
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlam / 2), 2)
    return F.lit(2.0 * 6_371_000.0) * F.asin(F.sqrt(a))


SCALAR: dict[str, Callable[..., Column]] = {
    # ---- date/time (src/Functions/DateTimeTransforms.h, date_trunc.cpp,
    # dateDiff.cpp, addSeconds.cpp..addYears.cpp, toYYYYMM et al.)
    "toYear": F.year,
    "toQuarter": F.quarter,
    "toMonth": F.month,
    "toDayOfMonth": F.dayofmonth,
    "toDayOfWeek": _to_day_of_week,
    "toDayOfYear": F.dayofyear,
    "toHour": F.hour,
    "toMinute": F.minute,
    "toSecond": F.second,
    "toMonday": lambda c: F.date_trunc("week", c).cast("date"),
    "toDate": lambda c: c.cast("date"),
    "toDateTime": lambda c: c.cast("timestamp"),
    "toStartOfYear": lambda c: F.date_trunc("year", c),
    "toStartOfQuarter": lambda c: F.date_trunc("quarter", c),
    "toStartOfMonth": lambda c: F.date_trunc("month", c),
    "toStartOfWeek": lambda c: F.date_trunc("week", c),
    "toStartOfDay": lambda c: F.date_trunc("day", c),
    "toStartOfHour": lambda c: F.date_trunc("hour", c),
    "toStartOfMinute": lambda c: F.date_trunc("minute", c),
    "toStartOfFifteenMinutes": lambda c: F.timestamp_seconds(
        (F.unix_timestamp(c) - F.unix_timestamp(c) % 900)
    ),
    "toStartOfFiveMinutes": lambda c: F.timestamp_seconds(
        (F.unix_timestamp(c) - F.unix_timestamp(c) % 300)
    ),
    "toYYYYMM": lambda c: (F.year(c) * 100 + F.month(c)).cast("int"),
    "toYYYYMMDD": lambda c: (
        F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)
    ).cast("int"),
    "toUnixTimestamp": lambda c: F.unix_timestamp(c),
    "fromUnixTimestamp": F.timestamp_seconds,
    "dateDiff": _date_diff,
    # interval arithmetic (not date_add) so DateTime stays DateTime, like CH
    "addYears": lambda c, n: c + F.expr(f"INTERVAL {int(n)} YEAR"),
    "addMonths": lambda c, n: c + F.expr(f"INTERVAL {int(n)} MONTH"),
    "addWeeks": lambda c, n: c + F.expr(f"INTERVAL {7 * int(n)} DAY"),
    "addDays": lambda c, n: c + F.expr(f"INTERVAL {int(n)} DAY"),
    "addHours": lambda c, n: c + F.expr(f"INTERVAL {int(n)} HOUR"),
    "addMinutes": lambda c, n: c + F.expr(f"INTERVAL {int(n)} MINUTE"),
    "addSeconds": lambda c, n: c + F.expr(f"INTERVAL {int(n)} SECOND"),
    "subtractDays": lambda c, n: c - F.expr(f"INTERVAL {int(n)} DAY"),
    "subtractMonths": lambda c, n: c - F.expr(f"INTERVAL {int(n)} MONTH"),
    "date_trunc": lambda unit, c: F.date_trunc(unit, c),
    "formatDateTime": _format_date_time,
    "now": F.current_timestamp,
    "today": F.current_date,
    "parseDateTimeBestEffort": lambda c: F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(c, F.lit("yyyy/MM/dd HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("dd.MM.yyyy HH:mm:ss")),
    ),
    # ---- strings (src/Functions/concat.cpp, substring, position*, trim,
    # FunctionsStringArray.cpp splitByChar, replace*, startsWith/endsWith)
    "length": F.length,
    "lengthUTF8": F.char_length,
    "empty": lambda c: F.length(c) == 0,
    "notEmpty": lambda c: F.length(c) > 0,
    "lower": F.lower,
    "upper": F.upper,
    "lowerUTF8": F.lower,
    "upperUTF8": F.upper,
    "reverse": F.reverse,
    "reverseUTF8": F.reverse,
    "concat": F.concat,
    "concatWs": lambda sep, *cols: F.concat_ws(sep, *cols),
    "substring": lambda c, pos, ln=None: (
        F.substring(c, pos, ln) if ln is not None else F.expr_substr(c, pos)
    ),
    "substringUTF8": lambda c, pos, ln: F.substring(c, pos, ln),
    "position": lambda hay, needle: F.instr(hay, needle),
    "positionCaseInsensitive": lambda hay, needle: F.instr(
        F.lower(hay), needle.lower() if isinstance(needle, str) else F.lower(needle)
    ),
    "locate": lambda needle, hay: F.instr(hay, needle),
    "startsWith": lambda c, p: F.startswith(c, F.lit(p) if isinstance(p, str) else p),
    "endsWith": lambda c, p: F.endswith(c, F.lit(p) if isinstance(p, str) else p),
    "trimBoth": F.trim,
    "trimLeft": F.ltrim,
    "trimRight": F.rtrim,
    "leftPad": lambda c, n, pad=" ": F.lpad(c, n, pad),
    "rightPad": lambda c, n, pad=" ": F.rpad(c, n, pad),
    "repeat": lambda c, n: F.repeat(c, n),
    "replaceAll": lambda c, s, r: F.replace(
        c, F.lit(s) if isinstance(s, str) else s, F.lit(r) if isinstance(r, str) else r
    ),
    "replaceOne": _replace_one,
    "replaceRegexpAll": lambda c, p, r: F.regexp_replace(c, p, r),
    "splitByChar": _split_by_char,
    "splitByString": lambda sep, c: F.split(c, __import__("re").escape(sep)),
    "like": lambda c, p: c.like(p),
    "notLike": lambda c, p: ~c.like(p),
    "ilike": lambda c, p: c.ilike(p),
    "match": lambda c, p: c.rlike(p),
    "extract": lambda c, p, g=0: F.regexp_extract(c, p, g),
    "editDistance": F.levenshtein,
    "levenshteinDistance": F.levenshtein,
    "substringIndex": F.substring_index,
    "yesterday": lambda: F.date_sub(F.current_date(), 1),
    "generateUUIDv4": lambda: F.expr("uuid()"),
    "ngramSearch": lambda a, b: F.when(
        F.size(_char_ngrams(b, 3)) == 0, F.lit(0.0)
    ).otherwise(
        F.size(F.array_intersect(_char_ngrams(a, 3), _char_ngrams(b, 3)))
        / F.size(_char_ngrams(b, 3)).cast("double")
    ),
    "appendTrailingCharIfAbsent": lambda c, ch_: F.when(
        F.endswith(c, F.lit(ch_)), c
    ).otherwise(F.concat(c, F.lit(ch_))),
    "format": None,  # placeholder removed below
    # ---- math (src/Functions/abs.cpp, exp.cpp, log*.cpp, pow.cpp,
    # FunctionsRound.cpp, intDiv/modulo)
    "plus": lambda a, b: a + b,
    "minus": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: F.try_divide(a.cast("double"), b),
    "intDiv": lambda a, b: F.try_divide(
        a.cast("long") - F.try_mod(a.cast("long"), b), b
    ).cast("long"),
    "intDivOrZero": lambda a, b: F.when(
        (b == -1) & (a.cast("long") == -(1 << 63)), F.lit(0)
    ).otherwise(F.coalesce(
        F.try_divide(a.cast("long") - F.try_mod(a.cast("long"), b), b).cast("long"),
        F.lit(0),
    )),
    "modulo": lambda a, b: a % b,
    "moduloOrZero": lambda a, b: F.coalesce(F.try_mod(a, b), F.lit(0)),
    "negate": lambda a: -a,
    "abs": F.abs,
    "exp": F.exp,
    "log": F.log,
    "ln": F.log,
    "exp2": lambda c: F.pow(F.lit(2.0), c),
    "log2": F.log2,
    "exp10": lambda c: F.pow(F.lit(10.0), c),
    "log10": F.log10,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "pow": F.pow,
    "power": F.pow,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "atan2": F.atan2,
    "e": lambda: F.lit(2.718281828459045),
    "pi": lambda: F.lit(3.141592653589793),
    "round": lambda c, n=0: F.round(c, n),
    "roundBankers": lambda c, n=0: F.bround(c, n),
    "floor": lambda c, n=0: (
        F.floor(c) if n == 0 else F.floor(c * F.lit(10.0) ** n) / F.lit(10.0) ** n
    ),
    "ceil": F.ceil,
    "ceiling": F.ceil,
    "trunc": lambda c: c.cast("long"),
    "sign": F.signum,
    # ---- bitwise (src/Functions/bitAnd.cpp et al.)
    "bitAnd": lambda a, b: a.bitwiseAND(b),
    "bitOr": lambda a, b: a.bitwiseOR(b),
    "bitXor": lambda a, b: a.bitwiseXOR(b),
    "bitNot": lambda a: F.expr("-1").cast("long").bitwiseXOR(a.cast("long")),
    "bitShiftLeft": lambda a, n: F.call_function(
        "shiftleft", a.cast("long"), n if isinstance(n, Column) else F.lit(n)
    ),
    "bitShiftRight": lambda a, n: F.call_function(
        "shiftright", a.cast("long"), n if isinstance(n, Column) else F.lit(n)
    ),
    "bitCount": F.bit_count,
    "bitTest": lambda a, n: F.bit_get(a, n if isinstance(n, Column) else F.lit(n)),
    # ---- more math (src/Functions/math*.cpp, greatCommonDivisor.cpp)
    "gcd": _gcd_col,
    "lcm": lambda a, b: F.when(
        (a == 0) | (b == 0), F.lit(0)
    ).otherwise(F.abs(a * b) / _gcd_col(a, b)).cast("long"),
    "log1p": lambda a: F.log(F.lit(1.0) + a.cast("double")),
    "degrees": F.degrees,
    "radians": F.radians,
    "isFinite": lambda a: ~(F.isnan(a) | (F.abs(a) == float("inf"))),
    "isInfinite": lambda a: F.abs(a) == float("inf"),
    "roundToExp2": lambda a: F.when(a <= 0, F.lit(0)).otherwise(
        F.pow(F.lit(2.0), F.floor(F.log2(a))).cast("long")
    ),
    "roundDown": lambda a, arr: F.array_max(
        F.filter(arr, lambda x: x <= a)
    ),
    "least": F.least,
    "greatest": F.greatest,
    "isNaN": F.isnan,
    # ---- conditionals (if.cpp, multiIf.cpp, coalesce.cpp, nullIf, ifNull)
    # CH conditions may be UInt8 — cast coerces nonzero→true like the
    # reference; boolean input casts as a no-op
    "if": lambda c, a, b: F.when(c.cast("boolean"), a).otherwise(b),
    "multiIf": _multi_if,
    "coalesce": F.coalesce,
    "ifNull": lambda a, b: F.coalesce(a, b),
    "nullIf": F.nullif,
    "assumeNotNull": lambda c: c,
    "isNull": lambda c: c.isNull(),
    "isNotNull": lambda c: c.isNotNull(),
    # ---- conversions (FunctionsConversion.cpp)
    "toInt8": lambda c: c.cast("tinyint"),
    "toInt16": lambda c: c.cast("smallint"),
    "toInt32": lambda c: c.cast("int"),
    "toInt64": lambda c: c.cast("bigint"),
    "toUInt8": lambda c: c.cast("smallint"),
    "toUInt16": lambda c: c.cast("int"),
    "toUInt32": lambda c: c.cast("bigint"),
    "toUInt64": lambda c: c.cast("bigint"),  # documented: wraps at 2^63
    "toFloat32": lambda c: c.cast("float"),
    "toFloat64": lambda c: c.cast("double"),
    "toString": lambda c: c.cast("string"),
    "toDecimal64": lambda c, s: c.cast(f"decimal(18,{int(s)})"),
    "toDecimal128": lambda c, s: c.cast(f"decimal(38,{int(s)})"),
    "toDateTime64": lambda c, *prec: c.cast("timestamp"),
    "accurateCast": lambda c, t: c.cast(
        {"UInt64": "bigint", "Int64": "bigint", "Int32": "int",
         "Float64": "double", "String": "string", "Date": "date",
         "DateTime": "timestamp"}.get(t, t.lower())
    ),
    # ---- arrays (src/Functions/array/ — 73 files)
    "array": F.array,
    # 1-based, negative = from end (CH-equal); out-of-range -> NULL (CH
    # returns the type default — documented deviation, try_ avoids ANSI error)
    "arrayElement": F.try_element_at,
    "has": lambda arr, x: F.array_contains(arr, x),
    "hasAll": lambda a, b: F.size(F.array_except(b, a)) == 0,
    "hasAny": F.arrays_overlap,
    "indexOf": lambda arr, x: F.array_position(arr, x),
    "arrayConcat": F.concat,
    "arraySlice": lambda arr, start, ln=None: (
        F.slice(arr, start, ln) if ln is not None else F.slice(arr, start, F.size(arr))
    ),
    "arraySort": F.sort_array,
    "arrayReverseSort": lambda arr: F.sort_array(arr, asc=False),
    "arrayReverse": F.reverse,
    "arrayDistinct": F.array_distinct,
    "arrayIntersect": F.array_intersect,
    "arrayFlatten": F.flatten,
    "arrayZip": F.arrays_zip,
    # arrayReduce('agg', arr) — dynamic aggregate-by-name over an array
    # (src/Functions/array/arrayReduce.cpp); dispatches to the array algebra
    "arrayReduce": lambda name, arr: {
        "sum": _array_sum,
        "avg": _array_avg,
        "min": F.array_min,
        "max": F.array_max,
        "count": F.size,
        "uniq": lambda a: F.size(F.array_distinct(a)),
        "any": lambda a: F.element_at(a, 1),
        "anyLast": lambda a: F.element_at(a, -1),
    }[name](arr),
    "arrayCompact": lambda arr: F.filter(
        arr,
        lambda x, i: (i == 0)
        | (~F.element_at(arr, i + 1).eqNullSafe(F.element_at(arr, i))),
    ),
    "arrayResize": lambda arr, n, *fill: F.when(
        F.size(arr) >= n, F.slice(arr, 1, n)
    ).otherwise(
        F.concat(
            arr,
            F.transform(
                F.sequence(F.lit(1), n - F.size(arr)),
                lambda _: (fill[0] if fill else F.lit(None)),
            ),
        )
    ),
    "arrayPushBack": lambda arr, x: F.concat(arr, F.array(x)),
    "arrayPushFront": lambda arr, x: F.concat(F.array(x), arr),
    "arrayPopBack": lambda arr: F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
    "arrayEnumerateUniq": lambda arr: F.transform(
        F.sequence(F.lit(1), F.size(arr)),
        lambda i: F.size(
            F.filter(
                F.slice(arr, 1, i),
                lambda x: x.eqNullSafe(F.element_at(arr, i)),
            )
        ),
    ),
    "countEqual": lambda arr, x: F.size(F.filter(arr, lambda v: v.eqNullSafe(x))),
    "indexOfAll": lambda arr, x: F.filter(
        F.sequence(F.lit(1), F.size(arr)),
        lambda i: F.element_at(arr, i).eqNullSafe(x),
    ),
    # transform(x, from_arr, to_arr, default) — CH value remap
    # (src/Functions/transform.cpp)
    "transform": lambda x, frm, to, dflt: F.when(
        F.array_position(frm, x) > 0,
        F.element_at(to, F.array_position(frm, x).cast("int")),
    ).otherwise(dflt),
    "arrayStringConcat": lambda arr, sep="": F.array_join(arr, sep),
    "arrayEnumerate": lambda arr: F.sequence(F.lit(1), F.size(arr)),
    "arrayLength": F.size,
    "range": lambda *a: F.sequence(*a) if len(a) > 1 else F.sequence(F.lit(0), a[0] - 1),
    "arrayMap": lambda f, arr: F.transform(arr, f),
    "arrayFilter": lambda f, arr: F.filter(arr, f),
    "arrayExists": lambda f, arr: F.exists(arr, f),
    "arrayAll": lambda f, arr: F.forall(arr, f),
    "arrayCount": lambda f, arr: F.size(F.filter(arr, f)),
    "arrayFirst": lambda f, arr: F.try_element_at(F.filter(arr, f), F.lit(1)),
    "arraySum": _array_sum,
    "arrayAvg": _array_avg,
    "arrayMin": F.array_min,
    "arrayMax": F.array_max,
    "emptyArrayString": lambda: F.array().cast("array<string>"),
    # running sum over array positions; O(n^2) via slice+aggregate (Spark
    # has no scan HOF) — fine for typical in-row arrays, not a hot path.
    # NB pass a plain column ref: inline exprs re-evaluate per element.
    "arrayCumSum": lambda arr: F.when(
        F.size(arr) > 0,  # sequence(1,0) would count DOWN on empty input
        F.transform(
            F.sequence(F.lit(1), F.size(arr)),
            lambda i: F.aggregate(
                F.slice(arr, F.lit(1), i), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
        ),
    ).otherwise(F.array().cast("array<double>")),
    "arrayDifference": lambda arr: F.when(
        F.size(arr) > 0,
        F.zip_with(
            arr,
            F.concat(F.array(F.lit(None)), F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0)))),
            lambda cur, prev: F.coalesce(cur - prev, F.lit(0.0) * cur),
        ),
    ).otherwise(F.array().cast("array<double>")),
    # char 4-gram Jaccard DISTANCE in [0,1] (FunctionsStringSimilarity.cpp
    # ngramDistance analogue; distinct-shingle variant)
    "ngramDistance": lambda a, b: 1
    - F.size(
        F.array_intersect(_char_ngrams(a, 4), _char_ngrams(b, 4))
    ).cast("double")
    / F.greatest(
        F.size(_char_ngrams(a, 4))
        + F.size(_char_ngrams(b, 4))
        - F.size(F.array_intersect(_char_ngrams(a, 4), _char_ngrams(b, 4))),
        F.lit(1),
    ),
    # ---- maps / tuples (map.cpp, mapKeys/mapValues; tuple -> struct)
    "map": F.create_map,
    "mapKeys": F.map_keys,
    "mapValues": F.map_values,
    "mapContains": F.map_contains_key,
    "tuple": F.struct,
    # ---- JSON (FunctionsJSON.cpp JSONExtract*, src/Functions/JSONPath/,
    # FunctionSQLJSON.cpp JSON_VALUE/JSON_QUERY, visitParam*).  JSONExtract*
    # take 1..N path keys like ClickHouse: strings descend objects, integers
    # index arrays 1-based ('a', 'b', 2 -> $.a.b[1]); negative indices are
    # not supported by Spark's JSONPath and raise.
    "JSONExtractString": lambda c, *keys: F.get_json_object(c, _jpath(keys)),
    "JSONExtractInt": lambda c, *keys: F.get_json_object(c, _jpath(keys)).cast("bigint"),
    "JSONExtractFloat": lambda c, *keys: F.get_json_object(c, _jpath(keys)).cast("double"),
    "JSONExtractBool": lambda c, *keys: F.get_json_object(c, _jpath(keys)).cast("boolean"),
    "JSONExtractRaw": lambda c, *keys: F.get_json_object(c, _jpath(keys)),
    "JSONExtractArrayRaw": lambda c, *keys: F.from_json(
        F.get_json_object(c, _jpath(keys)) if keys else c, "array<string>"
    ),
    "JSONExtractKeys": lambda c, *keys: F.json_object_keys(
        F.get_json_object(c, _jpath(keys)) if keys else c
    ),
    "JSONLength": lambda c, *keys: (
        lambda raw: F.coalesce(
            F.json_array_length(raw), F.size(F.json_object_keys(raw))
        )
    )(F.get_json_object(c, _jpath(keys)) if keys else c),
    "JSONHas": lambda c, *keys: F.get_json_object(c, _jpath(keys)).isNotNull(),
    "JSON_VALUE": lambda c, path: F.get_json_object(c, path),
    "JSON_QUERY": lambda c, path: F.get_json_object(c, path),
    "visitParamExtractString": lambda c, key: F.get_json_object(c, f"$.{key}"),
    "visitParamExtractInt": lambda c, key: F.get_json_object(c, f"$.{key}").cast("bigint"),
    "simpleJSONExtractString": lambda c, key: F.get_json_object(c, f"$.{key}"),
    # ---- hashing / encoding (FunctionsHashing.cpp,
    # FunctionsBinaryRepresentation.cpp) — cityHash64/sipHash64 are
    # xxhash64-backed stand-ins (stable, not CH-bit-identical)
    "cityHash64": lambda *cols: F.xxhash64(*cols),
    "sipHash64": lambda *cols: F.xxhash64(*cols),
    # ---- geo (src/Functions/greatCircleDistance.cpp) — haversine on the
    # CH mean-Earth sphere (6371 km); geoDistance's ellipsoid correction is
    # not reproduced (documented deviation, <0.6% everywhere)
    "greatCircleDistance": lambda lon1, lat1, lon2, lat2: _haversine_m(
        lon1, lat1, lon2, lat2
    ),
    "geoDistance": lambda lon1, lat1, lon2, lat2: _haversine_m(
        lon1, lat1, lon2, lat2
    ),
    "xxHash64": lambda *cols: F.xxhash64(*cols),
    "halfMD5": lambda *cols: F.xxhash64(*cols),
    # CH MD5/SHA256 return raw bytes (users wrap in hex()); Spark's return
    # lowercase hex strings already — documented deviation
    "MD5": lambda c: F.md5(c.cast("binary")),
    "SHA256": lambda c: F.sha2(c.cast("binary"), 256),
    "hex": F.hex,
    "unhex": F.unhex,
    "bin": F.bin,
    "space": lambda n: F.repeat(F.lit(" "), n),
    "tupleElement": lambda t, i: t.getField(f"col{i}") if isinstance(i, int) else t[i],
    # ---- IPv4 (src/Functions/FunctionsCoding.h)
    "IPv4NumToString": lambda n: F.concat_ws(
        ".",
        F.call_function("shiftright", n.cast("long"), F.lit(24)).bitwiseAND(F.lit(255)).cast("string"),
        F.call_function("shiftright", n.cast("long"), F.lit(16)).bitwiseAND(F.lit(255)).cast("string"),
        F.call_function("shiftright", n.cast("long"), F.lit(8)).bitwiseAND(F.lit(255)).cast("string"),
        n.cast("long").bitwiseAND(F.lit(255)).cast("string"),
    ),
    "IPv4StringToNum": lambda s: (
        F.split(s, r"\.")[0].cast("long") * 16777216
        + F.split(s, r"\.")[1].cast("long") * 65536
        + F.split(s, r"\.")[2].cast("long") * 256
        + F.split(s, r"\.")[3].cast("long")
    ),
    # IPv4 coding extras (src/Functions/FunctionsCodingIP.cpp)
    "IPv4NumToStringClassC": lambda n: F.concat_ws(
        ".",
        F.call_function("shiftright", n.cast("long"), F.lit(24)).bitwiseAND(F.lit(255)).cast("string"),
        F.call_function("shiftright", n.cast("long"), F.lit(16)).bitwiseAND(F.lit(255)).cast("string"),
        F.call_function("shiftright", n.cast("long"), F.lit(8)).bitwiseAND(F.lit(255)).cast("string"),
        F.lit("xxx"),
    ),
    "isIPv4String": lambda s: (
        s.rlike(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
        & (F.split(s, r"\.")[0].cast("int") <= 255)
        & (F.split(s, r"\.")[1].cast("int") <= 255)
        & (F.split(s, r"\.")[2].cast("int") <= 255)
        & (F.split(s, r"\.")[3].cast("int") <= 255)
    ),
    # IPv4CIDRToRange(ip, prefix) -> (lower, upper) as a struct of longs;
    # prefix is a Python literal, so the 32-bit mask folds at plan time.
    "IPv4CIDRToRange": lambda n, prefix: F.struct(
        n.cast("long")
        .bitwiseAND(F.lit((0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF if prefix else 0))
        .alias("lower"),
        (
            n.cast("long")
            .bitwiseAND(F.lit((0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF if prefix else 0))
            + F.lit((1 << (32 - prefix)) - 1)
        ).alias("upper"),
    ),
    # ---- formatReadable* (src/Functions/formatReadable*.cpp)
    "formatReadableSize": lambda n: F.call_function(
        "format_string",
        F.lit("%.2f %s"),
        n.cast("double")
        / F.element_at(
            F.array(*[F.lit(1024.0 ** i) for i in range(7)]),
            (F.floor(F.log(1024.0, F.greatest(n.cast("double"), F.lit(1.0))))
             .cast("int") + 1),
        ),
        F.element_at(
            F.array(*[F.lit(u) for u in ["B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"]]),
            (F.floor(F.log(1024.0, F.greatest(n.cast("double"), F.lit(1.0))))
             .cast("int") + 1),
        ),
    ),
    "base64Encode": lambda c: F.base64(c.cast("binary")),
    "base64Decode": lambda c: F.unbase64(c).cast("string"),
    "crc32": F.crc32,
    # ---- URL (src/Functions/URL/)
    "protocol": lambda c: F.parse_url(c, F.lit("PROTOCOL")),
    "domain": lambda c: F.parse_url(c, F.lit("HOST")),
    "path": lambda c: F.parse_url(c, F.lit("PATH")),
    "queryString": lambda c: F.parse_url(c, F.lit("QUERY")),
    "fragment": lambda c: F.parse_url(c, F.lit("REF")),
    "extractURLParameter": _extract_url_parameter,
    "cutQueryString": lambda c: F.substring_index(c, "?", 1),
    "topLevelDomain": lambda c: F.substring_index(F.parse_url(c, F.lit("HOST")), ".", -1),
    # ---- misc
    "rand": lambda: (F.rand() * (1 << 32)).cast("long"),
    "randConstant": lambda: (F.rand() * (1 << 32)).cast("long"),
    "ignore": lambda *cols: F.lit(0),
    "identity": lambda c: c,
}

SCALAR["format"] = lambda fmt, *cols: F.format_string(fmt.replace("{}", "%s"), *cols)
SCALAR["substring"] = lambda c, pos, ln=None: (
    F.substring(c, pos, ln) if ln is not None else F.substring(c, pos, 1 << 30)
)

# --- round-4 breadth batch (reference src/Functions/array/*,
# FunctionsStringSearch, FunctionsRound.cpp, FunctionDateOrDateTime*) ---
SCALAR.update(
    {
        "arrayLast": lambda lam, arr: F.try_element_at(F.filter(arr, lam), F.lit(-1)),
        "arrayFirstIndex": lambda lam, arr: F.coalesce(
            F.array_position(
                F.transform(arr, lam), F.lit(True)
            ).cast("long"),
            F.lit(0).cast("long"),
        ),
        "arrayPopFront": lambda arr: F.slice(arr, 2, 1 << 30),
        "arrayUniq": lambda arr: F.size(F.array_distinct(arr)).cast("long"),
        "arrayCumSumNonNegative": lambda arr: F.reverse(
            F.aggregate(
                arr,
                F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
                lambda acc, x: F.concat(
                    F.array(
                        F.greatest(
                            F.lit(0.0),
                            F.coalesce(F.try_element_at(acc, F.lit(1)), F.lit(0.0))
                            + x.cast("double"),
                        )
                    ),
                    acc,
                ),
            )
        ),
        "mapFromArrays": lambda ks, vs: F.map_from_arrays(ks, vs),
        "multiSearchAny": lambda c, needles: F.array_max(
            F.array(*[F.instr(c, n) > 0 for n in needles])
        ),
        "countSubstrings": lambda c, needle: F.when(
            F.length(c) > 0,
            (
                (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
                / len(needle)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
        "alphaTokens": lambda c: F.filter(
            F.split(c, "[^A-Za-z]+"), lambda t: t != ""
        ),
        "tokens": lambda c: F.filter(
            F.split(c, "[^A-Za-z0-9]+"), lambda t: t != ""
        ),
        "isValidUTF8": lambda c: c.isNotNull(),  # Spark strings are validated
        "ascii": lambda c: F.ascii(c),
        "char": lambda *cs: F.concat(*[F.char(c) for c in cs]),
        "translate": lambda c, frm, to: F.translate(c, frm, to),
        "initcap": lambda c: F.initcap(c),
        "soundex": lambda c: F.soundex(c),
        "regexpExtract": lambda c, pat, grp=1: F.regexp_extract(c, pat, grp),
        # CH extractAll: capture group 1 when the pattern has one, else the
        # whole match
        "extractAll": lambda c, pat: F.regexp_extract_all(
            c,
            F.lit(pat),
            1 if __import__("re").compile(pat).groups > 0 else 0,
        ),
        "countMatches": lambda c, pat: F.size(
            F.regexp_extract_all(c, F.lit(pat), 0)
        ).cast("long"),
        "concatWithSeparator": lambda sep, *cols: F.concat_ws(sep, *cols),
        "toLastDayOfMonth": lambda c: F.last_day(c),
        "monthName": lambda c: F.date_format(c, "MMMM"),
        "dateName": lambda part, c: {
            "year": F.date_format(c, "yyyy"),
            "month": F.date_format(c, "MMMM"),
            "weekday": F.date_format(c, "EEEE"),
            "day": F.date_format(c, "d"),
        }[part.lower()],
        "toRelativeDayNum": lambda c: (
            F.unix_timestamp(c.cast("timestamp")) / 86400
        ).cast("long"),
        "toStartOfInterval": lambda c, unit: F.date_trunc(unit, c),
        "roundAge": lambda c: _multi_if(
            c < 1, F.lit(0), c < 18, F.lit(17), c < 25, F.lit(18),
            c < 35, F.lit(25), c < 45, F.lit(35), c < 55, F.lit(45),
            F.lit(55),
        ).cast("long"),
        "roundDuration": lambda c: F.coalesce(
            *[
                F.when(c >= F.lit(v), F.lit(v).cast("long"))
                for v in (36000, 18000, 7200, 3600, 1800, 600, 300, 240,
                          180, 120, 60, 30, 10, 1)
            ],
            F.lit(0).cast("long"),
        ),
        "bitRotateLeft": lambda c, n: F.shiftleft(c, n).bitwiseOR(
            F.shiftrightunsigned(c, 64 - n)
        ),
        "erf": lambda c: _erf_col(c),
        "ifNotFinite": lambda x, alt: F.when(
            F.isnan(x) | (F.abs(x) == float("inf")), alt
        ).otherwise(x),
        "toNullable": lambda c: c,
        "indexHint": lambda *cols: F.lit(True),
    }
)


def _erf_col(c: Column) -> Column:
    """Abramowitz-Stegun 7.1.26 polynomial erf (|err| <= 1.5e-7) — Spark
    has no native erf; this keeps the expression JVM-side."""
    x = c.cast("double")
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * ax)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * t * t
        + F.lit(1.421413741) * t * t * t
        - F.lit(1.453152027) * t * t * t * t
        + F.lit(1.061405429) * t * t * t * t * t
    )
    y = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.when(x < 0, -y).otherwise(y)


# =========================================================================
# Aggregate functions + combinator engine
# =========================================================================

AGG: dict[str, Callable[..., Column]] = {
    "count": lambda c=None: F.count(F.lit(1)) if c is None else F.count(c),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "any": F.first,
    "anyLast": F.last,
    # arbitrary (AggregateFunctionArbitrary.cpp): ANY value of the group is
    # a valid answer; like `any`, this engine picks the first seen —
    # deterministic only under an explicit ordering (use min_by/argMin with
    # a tiebreak key where reproducibility matters).
    "arbitrary": F.first,
    # singleValueOrNull (AggregateFunctionSingleValueOrNull.cpp): the
    # group's value when all non-null inputs agree, NULL on conflict.
    "singleValueOrNull": lambda c: F.when(F.countDistinct(c) == 1, F.max(c)),
    "argMin": F.min_by,
    "argMax": F.max_by,
    "uniq": F.approx_count_distinct,
    "uniqExact": F.countDistinct,
    "uniqHLL12": F.approx_count_distinct,
    "uniqUpTo": lambda n, c: F.least(F.countDistinct(c), F.lit(n + 1)),
    "uniqCombined": F.approx_count_distinct,
    "quantileTiming": lambda level, c: F.percentile_approx(c, level),
    "avgWeighted": lambda x, w: F.sum(x * w) / F.sum(w),
    "boundingRatio": lambda x, y: (F.max(y) - F.min(y)) / (F.max(x) - F.min(x)),
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "quantile": lambda level, c: F.percentile_approx(c, level),
    "quantileExact": lambda level, c: F.percentile(c, F.lit(level)),
    "medianExact": lambda c: F.percentile(c, F.lit(0.5)),
    # weighted quantiles (QuantileExactWeighted.h /
    # AggregateFunctionQuantileInterpolatedWeighted.cpp): Spark percentile
    # takes a frequency argument natively
    "quantileExactWeighted": lambda level, c, w: F.percentile(
        c, F.lit(level), w.cast("long")
    ),
    "quantileInterpolatedWeighted": lambda level, c, w: F.percentile(
        c, F.lit(level), w.cast("long")
    ),
    # sketch-backed quantiles (QuantileBFloat16Weighted.h, KllSketch.cpp):
    # mapped to Spark's mergeable GK/percentile_approx sketch — same
    # accuracy class, different state encoding (documented deviation)
    "quantileBFloat16": lambda level, c: F.percentile_approx(
        c, F.lit(level), F.lit(10_000)
    ),
    "quantileKll": lambda level, c: F.percentile_approx(
        c, F.lit(level), F.lit(10_000)
    ),
    "quantilesExact": lambda levels, c: F.percentile(
        c, F.array(*[F.lit(x) for x in levels])
    ),
    "quantilesTiming": lambda levels, c: F.percentile_approx(
        c, F.array(*[F.lit(x) for x in levels]), F.lit(10_000)
    ),
    # HLL/theta sketch estimates (AggregateFunctionHllSketch.cpp,
    # ThetaSketchEstimate.cpp): the re-mergeable STATE forms live in
    # udafs/sketches.py; these names are the fused estimate path
    "hllSketchEstimate": F.approx_count_distinct,
    "thetaSketchEstimate": F.approx_count_distinct,
    # groupConcat(sep)(x) — reference AggregateFunctionGroupConcat.cpp.
    # CH concatenates in ARRIVAL order, which is nondeterministic under
    # distributed merge; this engine sorts for a deterministic result
    # (documented deviation).
    "groupConcat": lambda sep, c: F.array_join(
        F.array_sort(F.collect_list(c.cast("string"))), sep
    ),
    # deltaSumTimestamp(value, ts) — AggregateFunctionDeltaSumTimestamp.h:
    # the Column form only works when rows arrive time-ordered within the
    # group; use functions/registry.delta_sum (the frame-level op) for the
    # general shuffled case — it sorts by the ts columns explicitly.
    "quantilesExact": lambda levels, c: F.percentile(
        c, F.array(*[F.lit(v) for v in levels])
    ),
    "quantileTDigest": lambda level, c: F.percentile_approx(c, level),
    "stddevPop": F.stddev_pop,
    "stddevSamp": F.stddev_samp,
    "varPop": F.var_pop,
    "varSamp": F.var_samp,
    "covarPop": F.covar_pop,
    "covarSamp": F.covar_samp,
    "corr": F.corr,
    "groupArray": F.collect_list,
    "groupUniqArray": F.collect_set,
    "groupBitAnd": lambda c: F.bit_and(c),
    "groupBitOr": lambda c: F.bit_or(c),
    "groupBitXor": lambda c: F.bit_xor(c),
    "sumCount": lambda c: F.struct(F.sum(c).alias("sum"), F.count(c).alias("count")),
    # frequency (AggregateFunctionFrequency.h): fixed 10-bucket engagement
    # histogram — 1,2,3,4,5, 6-10, 11-20, 21-50, 50-100 (reference keeps the
    # overlapping 50 boundary; preserved verbatim), >100
    "frequency": lambda c: F.array(
        F.count(F.when(c == 1, 1)),
        F.count(F.when(c == 2, 1)),
        F.count(F.when(c == 3, 1)),
        F.count(F.when(c == 4, 1)),
        F.count(F.when(c == 5, 1)),
        F.count(F.when((c >= 6) & (c <= 10), 1)),
        F.count(F.when((c >= 11) & (c <= 20), 1)),
        F.count(F.when((c >= 21) & (c <= 50), 1)),
        F.count(F.when((c > 50) & (c <= 100), 1)),
        F.count(F.when(c > 100, 1)),
    ),
    "singleValueOrNull": lambda c: F.when(
        F.countDistinct(c) == 1, F.first(c, ignorenulls=True)
    ),
    "simpleLinearRegression": lambda x, y: F.struct(
        (F.covar_pop(x, y) / F.var_pop(x)).alias("k"),
        (F.avg(y) - (F.covar_pop(x, y) / F.var_pop(x)) * F.avg(x)).alias("b"),
    ),
}


def entropy(df, group_cols: list[str], value_col: str):
    """Shannon entropy (bits) of value_col's distribution per group
    (reference AggregateFunctionEntropy.h).  Two chained aggregates —
    value-count then -sum(p*log2 p) — both map-side combinable."""
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("__n"))
    totals = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    p = F.col("__n") / F.sum("__n").over(totals)
    plogp = (p * F.log2(p)).alias("__plogp")
    return (
        counts.select(*group_cols, plogp)
        .groupBy(*group_cols)
        .agg((-F.sum("__plogp")).alias("entropy"))
    )


def delta_sum(df, group_cols: list[str], order_cols: list[str], value_col: str):
    """deltaSum (AggregateFunctionDeltaSum.h): sum of positive successive
    differences in order_cols order.  One window pass (lag) + one aggregate."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    d = F.col(value_col) - F.lag(value_col).over(w)
    return (
        df.select(*group_cols, d.alias("__d"))
        .groupBy(*group_cols)
        .agg(F.sum(F.when(F.col("__d") > 0, F.col("__d")).otherwise(0.0)).alias("delta_sum"))
    )


def rank_corr(df, group_cols: list[str], x_col: str, y_col: str):
    """Spearman rank correlation (AggregateFunctionRankCorrelation.h):
    average-rank (ties) both columns with per-group windows, then Pearson
    corr of the ranks — no Python in the path.

    Scale note: exact per-group Spearman over CONTINUOUS values needs the
    whole group ranked — the distinct-value trick (mann_whitney_u) buys
    nothing when ndv ≈ n, and the reference itself materializes every
    group's full sample in memory (RankCorrelation.h pair array).  The
    window form here is partition-parallel across groups and streams each
    group; discretize first when a single group outgrows a task."""
    wx = Window.partitionBy(*group_cols).orderBy(x_col)
    wy = Window.partitionBy(*group_cols).orderBy(y_col)
    # average rank for ties = avg(row_number) over the tie peers
    rx = F.avg(F.row_number().over(wx)).over(Window.partitionBy(*group_cols, x_col))
    ry = F.avg(F.row_number().over(wy)).over(Window.partitionBy(*group_cols, y_col))
    ranked = df.select(*group_cols, rx.alias("__rx"), ry.alias("__ry"))
    return ranked.groupBy(*group_cols).agg(
        F.corr("__rx", "__ry").alias("rank_corr")
    )


def welch_t_stat(df, group_cols: list[str], value_col: str, label_col):
    """Welch's two-sample t statistic (AggregateFunctionTTest.h shape):
    label_col (boolean Column or name) splits the samples; one aggregate."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    v = F.col(value_col)
    a = F.when(lab, v)
    b = F.when(~lab, v)
    return df.groupBy(*group_cols).agg(
        (
            (F.avg(a) - F.avg(b))
            / F.sqrt(
                F.var_samp(a) / F.count(a) + F.var_samp(b) / F.count(b)
            )
        ).alias("t_stat"),
        F.count(a).alias("n_a"),
        F.count(b).alias("n_b"),
    )


def _apply_if(base: Callable[..., Column], *args) -> Column:
    """-If combinator: last argument is the condition; the base aggregate
    sees the value only where the condition holds (NULL elsewhere — every
    Spark aggregate ignores NULLs, matching CH -If semantics)."""
    *vals, cond = args
    if not vals:  # countIf(cond)
        return F.count(F.when(cond, F.lit(1)))
    masked = [F.when(cond, v) for v in vals]
    return base(*masked)


def _apply_distinct(base_name: str, base: Callable[..., Column], *args) -> Column:
    if base_name == "count":
        return F.countDistinct(*args)
    if base_name == "sum":
        return F.sum_distinct(*args)
    raise UnknownFunctionError(f"-Distinct not supported for {base_name}")


def _apply_array(base_name: str, base: Callable[..., Column], arr: Column) -> Column:
    """-Array combinator: aggregate over all elements of all arrays."""
    if base_name == "sum":
        return F.sum(_array_sum(arr))
    if base_name == "min":
        return F.min(F.array_min(arr))
    if base_name == "max":
        return F.max(F.array_max(arr))
    if base_name == "count":
        return F.sum(F.size(arr))
    if base_name == "avg":
        return F.sum(_array_sum(arr)) / F.sum(F.size(arr))
    raise UnknownFunctionError(f"-Array not supported for {base_name}")


def _apply_or_null(base_name: str, base: Callable[..., Column], *args) -> Column:
    """-OrNull combinator: NULL instead of the default value on empty input.
    sum/min/max/avg already return NULL on empty; count needs the wrap."""
    if base_name == "count":
        inner = AGG["count"](*args)
        return F.when(inner > 0, inner)
    return base(*args)


def _apply_resample(base: Callable[..., Column], *args) -> Column:
    """-Resample combinator (reference AggregateFunctionResample.h):
    ``<agg>Resample(start, end, step, value..., key)`` splits the aggregation
    into value-range buckets of the key and returns one array element per
    bucket [start + i*step, start + (i+1)*step).  Pure conditional-masked
    aggregates — one pass, map-side combinable, bucket count fixed at plan
    time."""
    start, end, step, *vals, key = args
    if step <= 0 or end <= start:
        raise ValueError("Resample needs start < end and step > 0")
    n_buckets = -(-(end - start) // step)
    cells = []
    for i in range(int(n_buckets)):
        lo = start + i * step
        hi = min(start + (i + 1) * step, end)
        cond = (key >= F.lit(lo)) & (key < F.lit(hi))
        masked = [F.when(cond, v) for v in vals] or [F.when(cond, F.lit(1))]
        cells.append(base(*masked))
    return F.array(*cells)


def _apply_stack(base: Callable[..., Column], *args) -> Column:
    """-Stack combinator (reference AggregateFunctionStackGraph.h
    AggregateFunctionStack): ``<agg>Stack(start, end, step, value..., key)``
    buckets rows by key like -Resample, but emission CUMULATIVELY merges
    slot i into slots 0..i-1 (insertResultInto merges left-to-right), so
    cell i = nested agg over keys in [start, start + (i+1)*step) — the
    stacked-graph prefix curve.  Expressed directly as a prefix-masked
    aggregate (key < hi_i), which equals the reference's running merge for
    ANY nested aggregate, not just distributive ones.  Returns
    array<struct<k, v>> matching the reference's Array(Tuple(key, result))."""
    start, end, step, *vals, key = args
    if step <= 0 or end <= start:
        raise ValueError("Stack needs start < end and step > 0")
    n_buckets = -(-(end - start) // step)
    cells = []
    for i in range(int(n_buckets)):
        hi = min(start + (i + 1) * step, end)
        cond = (key >= F.lit(start)) & (key < F.lit(hi))
        masked = [F.when(cond, v) for v in vals] or [F.when(cond, F.lit(1))]
        cells.append(
            F.struct(
                F.lit(start + i * step).cast("long").alias("k"),
                base(*masked).alias("v"),
            )
        )
    return F.array(*cells)


def _apply_foreach(base_name: str, arr: Column) -> Column:
    """-ForEach combinator (reference AggregateFunctionForEach.h):
    elementwise aggregation over array columns — result[i] = agg of the
    i-th elements.  Column form folds collected arrays in-plan (bounded
    groups only: collect_list defeats map-side combine); the SCALE path
    for big groups is the posexplode + groupBy(pos) shape
    (llm/similarity.py:elementwise_centroids)."""
    lists = F.collect_list(arr)

    def fold(op):
        return F.aggregate(
            lists,
            F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
            lambda acc, a: F.when(F.size(acc) == 0, a.cast("array<double>")).otherwise(
                F.zip_with(acc, a.cast("array<double>"), op)
            ),
        )

    if base_name == "sum":
        return fold(lambda x, y: x + y)
    if base_name == "max":
        return fold(lambda x, y: F.greatest(x, y))
    if base_name == "min":
        return fold(lambda x, y: F.least(x, y))
    if base_name == "avg":
        total = fold(lambda x, y: x + y)
        return F.transform(total, lambda x: x / F.size(lists))
    raise UnknownFunctionError(f"-ForEach not supported for {base_name}")


_SUFFIXES = ("If", "Distinct", "Array", "OrNull", "Resample", "ForEach", "Stack")


def ch_agg(name: str, *args) -> Column:
    """Resolve a (possibly combinator-suffixed) CH aggregate name."""
    if name in AGG:
        return AGG[name](*args)
    for suffix in _SUFFIXES:
        if name.endswith(suffix):
            base_name = name[: -len(suffix)]
            if base_name not in AGG:
                continue
            base = AGG[base_name]
            if suffix == "If":
                return _apply_if(base, *args)
            if suffix == "Distinct":
                return _apply_distinct(base_name, base, *args)
            if suffix == "Array":
                return _apply_array(base_name, base, *args)
            if suffix == "OrNull":
                return _apply_or_null(base_name, base, *args)
            if suffix == "Resample":
                return _apply_resample(base, *args)
            if suffix == "ForEach":
                return _apply_foreach(base_name, *args)
            if suffix == "Stack":
                return _apply_stack(base, *args)
            if suffix == "OrDefault":
                return _apply_or_default(base_name, base, *args)
            if suffix == "Map":
                return _apply_map(base_name, *args)
            if suffix == "SimpleState":
                # -SimpleState (reference AggregateFunctionSimpleState.h):
                # the state of a simple aggregate IS its value — identity
                return base(*args)
    raise UnknownFunctionError(
        f"unknown aggregate function {name!r} (no base+combinator match)"
    )


# Hash functions whose stand-in produces DIFFERENT VALUES than the
# reference implementation (cityHash64 et al. are xxhash64-backed: stable
# within this engine, NOT CH-bit-identical).  A workload that persists or
# exchanges these hash values cross-engine would break silently — so by
# default the dispatcher warns once per name, and strict mode
# (set_strict_hash_compat(True) or env BYCONITY_STRICT_HASH_COMPAT=1)
# raises instead.
VALUE_DIVERGENT_HASHES = frozenset(
    {
        "cityHash64", "sipHash64", "sipHash128", "halfMD5", "hiveHash",
        "intHash32", "intHash64", "URLHash", "farmFingerprint64",
    }
)

_strict_hash_compat = bool(int(os.environ.get("BYCONITY_STRICT_HASH_COMPAT", "0")))
_warned_hashes: set = set()


def set_strict_hash_compat(enabled: bool) -> None:
    """Strict mode: a value-divergent hash name resolves to its
    reference-EXACT implementation (functions/hash_exact.py pandas UDFs,
    anchored on the reference's own test vectors) when one exists —
    cityHash64, sipHash64, halfMD5, intHash64, intHash32, URLHash,
    hiveHash — and raises for the remainder (sipHash128,
    farmFingerprint64).  Off (default): the fast JVM xxhash64 stand-ins,
    with a one-time warning per name."""
    global _strict_hash_compat
    _strict_hash_compat = bool(enabled)


def _check_hash_compat(name: str, args: tuple) -> Optional[Column]:
    """None = proceed with the registered stand-in; a Column = strict-mode
    exact override; raises when strict and no exact impl exists."""
    if name not in VALUE_DIVERGENT_HASHES:
        return None
    if _strict_hash_compat:
        from byconity_spark.functions.hash_exact import (
            EXACT_HASHES, exact_hash_column,
        )

        if name in EXACT_HASHES:
            return exact_hash_column(name, *args)
        raise ValueError(
            f"{name}: stand-in produces different values than the reference "
            "implementation, strict_hash_compat is enabled, and no exact "
            "port exists for this name; use xxHash64 (value-stable here) "
            "or disable strict mode"
        )
    if name not in _warned_hashes:
        _warned_hashes.add(name)
        import warnings

        warnings.warn(
            f"{name} is a value-divergent stand-in (xxhash64-backed): stable "
            "within this engine, not bit-identical to the reference. "
            "Enable set_strict_hash_compat(True) for the reference-exact "
            "(slower, pandas-UDF) implementation.",
            stacklevel=3,
        )
    return None


def ch(name: str, *args) -> Column:
    """Resolve any CH function name (scalar first, then aggregate +
    combinators) to a PySpark Column."""
    exact = _check_hash_compat(name, args)
    if exact is not None:
        return exact
    fn = SCALAR.get(name)
    if fn is not None:
        return fn(*args)
    return ch_agg(name, *args)


def registered_names() -> dict[str, list[str]]:
    return {"scalar": sorted(SCALAR), "aggregate": sorted(AGG)}


def _apply_map(base_name: str, m: Column) -> Column:
    """-Map combinator (reference AggregateFunctionMap.h / sumMap single-
    map form): per-key aggregation over MAP columns — result[k] = agg of
    every value bound to k across the group.  Column form folds collected
    maps with map_zip_with (key-union merge); bounded key cardinality only
    — the scale path for wide maps is explode + groupBy(key)
    (operators/aggregates.py:sum_map)."""
    ops = {
        "sum": lambda a, b: a + b,
        "min": F.least,
        "max": F.greatest,
    }
    op = ops.get(base_name)
    if op is None:
        raise UnknownFunctionError(f"-Map not supported for {base_name}")
    lists = F.collect_list(m)
    return F.aggregate(
        F.slice(lists, 2, F.greatest(F.size(lists) - 1, F.lit(0))),
        F.element_at(lists, 1),
        lambda acc, x: F.map_zip_with(
            acc, x, lambda k, v1, v2: F.coalesce(op(v1, v2), v1, v2)
        ),
    )


def _map_filtered(base_name: str, keys: list, m: Column) -> Column:
    """sumMapFiltered(keys)(map) family (reference
    AggregateFunctionSumMap.h:397-469): the -Map fold restricted to the
    parameter key set; the WithOverflow variants differ only in keeping
    the input integer width (LongType here either way — documented)."""
    filtered = F.map_filter(
        m, lambda k, _v: k.isin(*[F.lit(x) for x in keys])
    )
    return _apply_map(base_name, filtered)


def _apply_or_default(base_name: str, base: Callable[..., Column], *args) -> Column:
    """-OrDefault combinator (reference AggregateFunctionOrFill.h, the
    'OrDefault' template flavor): the return type's default value instead
    of NULL on empty input — 0 for the numeric aggregates this engine
    types them as."""
    return F.coalesce(base(*args), F.lit(0))


_SUFFIXES = (
    "If", "Distinct", "Array", "OrNull", "OrDefault", "Resample",
    "ForEach", "Stack", "Map", "SimpleState",
)


# ------------------------------------------------ round-4 scalar breadth
_GEOHASH_CHARS = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_core(lngs, lats, precision: int) -> list:
    out = []
    for lng, lat in zip(lngs, lats):
        lng_lo, lng_hi = -180.0, 180.0
        lat_lo, lat_hi = -90.0, 90.0
        bits = []
        is_lng = True
        while len(bits) < precision * 5:
            if is_lng:
                mid = (lng_lo + lng_hi) / 2
                if lng >= mid:
                    bits.append(1)
                    lng_lo = mid
                else:
                    bits.append(0)
                    lng_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    bits.append(1)
                    lat_lo = mid
                else:
                    bits.append(0)
                    lat_hi = mid
            is_lng = not is_lng
        out.append(
            "".join(
                _GEOHASH_CHARS[
                    sum(b << (4 - j) for j, b in enumerate(bits[i : i + 5]))
                ]
                for i in range(0, precision * 5, 5)
            )
        )
    return out


def _geohash_encode(lng: Column, lat: Column, precision: int = 12) -> Column:
    """geohashEncode (reference src/Functions/geohashEncode.cpp; public
    Geohash base32 bit-interleaving).  Arrow-batched pandas UDF — the
    60-level range-halving recurrence has no bounded Column form (the
    expression tree grows exponentially in the precision)."""
    @F.pandas_udf("string")
    def k(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(_geohash_core(lo, la, precision))

    return k(lng, lat)


SCALAR.update(
    {
        # arrayEnumerateDense (array/arrayEnumerateDense.cpp): index of the
        # FIRST occurrence, in first-seen order — array_distinct preserves
        # first-occurrence order, so array_position over it is exact.
        "arrayEnumerateDense": lambda a: F.transform(
            a, lambda x: F.array_position(F.array_distinct(a), x).cast("int")
        ),
        # UUID <-> 16-byte binary (FunctionsCodingUUID.cpp)
        "UUIDStringToNum": lambda u: F.unhex(F.regexp_replace(u, "-", "")),
        "UUIDNumToString": lambda b: F.concat_ws(
            "-",
            F.substring(F.lower(F.hex(b)), 1, 8),
            F.substring(F.lower(F.hex(b)), 9, 4),
            F.substring(F.lower(F.hex(b)), 13, 4),
            F.substring(F.lower(F.hex(b)), 17, 4),
            F.substring(F.lower(F.hex(b)), 21, 12),
        ),
        # map higher-order surface (src/Functions/map.cpp family)
        "mapFilter": lambda f, m: F.map_filter(m, f),
        "mapApply": lambda f, m: F.transform_values(m, f),
        "mapUpdate": lambda m1, m2: F.map_concat(
            F.map_filter(m1, lambda k, _v: ~F.array_contains(F.map_keys(m2), k)),
            m2,
        ),
        "mapContainsKeyLike": lambda m, pat: F.exists(
            F.map_keys(m), lambda k: k.like(pat)
        ),
        "geohashEncode": _geohash_encode,
    }
)


# ---------------------------------------------- round-4 scalar breadth 2
def _bar(x: Column, lo, hi, width) -> Column:
    """bar(x, min, max, width) — reference src/Functions/bar.cpp /
    Common/UnicodeBar.h: `width` cells; full cells are U+2588, the
    fractional remainder renders as one of the 1/8-block glyphs."""
    eighth = "▏▎▍▌▋▊▉"
    frac_w = (x.cast("double") - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * F.lit(width)
    frac_w = F.greatest(F.lit(0.0), F.least(F.lit(float(width)), frac_w))
    full = F.floor(frac_w).cast("int")
    rem8 = F.floor((frac_w - full) * 8).cast("int")
    partial = F.when(rem8 > 0, F.element_at(
        F.split(F.lit("|".join(eighth)), "\\|"), rem8
    )).otherwise(F.lit(""))
    return F.concat(F.repeat(F.lit("█"), full), partial)


def _has_substr(a: Column, b: Column) -> Column:
    """hasSubstr(arr, sub): contiguous subsequence containment
    (src/Functions/array/hasSubstr.cpp)."""
    return F.when(F.size(b) == 0, F.lit(True)).otherwise(
        F.exists(
            F.sequence(F.lit(1), F.greatest(F.size(a) - F.size(b) + 1, F.lit(0))),
            lambda i: F.slice(a, i, F.size(b)) == b,
        )
    )


def _age(unit: str, a: Column, b: Column) -> Column:
    """age(unit, a, b) — FULL units elapsed (src/Functions/dateDiff.cpp age
    registration), unlike dateDiff's boundary counting."""
    unit = unit.lower()
    if unit in _UNIT_SECONDS:
        secs = _UNIT_SECONDS[unit]
        return F.floor(
            (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(secs)
        ).cast("long")
    if unit == "month":
        return F.floor(F.months_between(b, a)).cast("long")
    if unit == "quarter":
        return F.floor(F.months_between(b, a) / 3).cast("long")
    if unit == "year":
        return F.floor(F.months_between(b, a) / 12).cast("long")
    raise ValueError(f"age: unsupported unit {unit!r}")


def _point_in_polygon(x: Column, y: Column, polygon: list) -> Column:
    """pointInPolygon((x, y), [(x1,y1), ...]) — even-odd ray casting over a
    CONSTANT polygon (src/Functions/pointInPolygon.cpp; the reference also
    only accepts constant polygons).  Unrolled crossing tests — one Column
    expression per edge, no UDF."""
    inside = F.lit(False)
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        crosses = (
            ((F.lit(y1) > y) != (F.lit(y2) > y))
            & (
                x
                < (F.lit(x2) - F.lit(x1))
                * (y - F.lit(y1))
                / (F.lit(y2) - F.lit(y1))
                + F.lit(x1)
            )
        )
        inside = F.when(crosses, ~inside).otherwise(inside)
    return inside


def _running_difference(v: Column, order_col: Column, partition=None) -> Column:
    """runningDifference(x [, order, partition]) — the reference computes
    within-BLOCK deltas (block order is nondeterministic distributed;
    src/Functions/runningDifference.h); this engine requires an explicit
    ordering column for a deterministic answer (documented deviation)."""
    w = (
        Window.partitionBy(partition) if partition is not None else Window.partitionBy()
    ).orderBy(order_col)
    return v - F.lag(v).over(w)


def _neighbor(v: Column, offset: int, order_col: Column, partition=None) -> Column:
    """neighbor(x, offset[, order, partition]) — same explicit-order
    contract as runningDifference."""
    w = (
        Window.partitionBy(partition) if partition is not None else Window.partitionBy()
    ).orderBy(order_col)
    return F.lag(v, -offset).over(w) if offset < 0 else F.lead(v, offset).over(w)


_SNOWFLAKE_EPOCH_MS = 1288834974657  # Twitter epoch (public)

SCALAR.update(
    {
        "bar": _bar,
        "formatReadableQuantity": lambda x: F.when(
            F.abs(x) >= 1e9, F.concat(F.format_number(x / 1e9, 2), F.lit(" billion"))
        )
        .when(F.abs(x) >= 1e6, F.concat(F.format_number(x / 1e6, 2), F.lit(" million")))
        .when(F.abs(x) >= 1e3, F.concat(F.format_number(x / 1e3, 2), F.lit(" thousand")))
        .otherwise(F.format_number(x.cast("double"), 2)),
        "runningDifference": _running_difference,
        "neighbor": _neighbor,
        "splitByRegexp": lambda pat, c: F.split(c, pat),
        "toFixedString": lambda c, n: F.rpad(c, n, "\x00").substr(1, n),
        "toIntervalDay": lambda n: F.make_interval(days=n if isinstance(n, Column) else F.lit(n)),
        "toIntervalHour": lambda n: F.make_interval(hours=n if isinstance(n, Column) else F.lit(n)),
        "toIntervalMinute": lambda n: F.make_interval(mins=n if isinstance(n, Column) else F.lit(n)),
        "emptyArrayUInt8": lambda: F.array().cast("array<int>"),
        "emptyArrayInt64": lambda: F.array().cast("array<long>"),
        "emptyArrayString": lambda: F.array().cast("array<string>"),
        "emptyArrayFloat64": lambda: F.array().cast("array<double>"),
        "hasSubstr": _has_substr,
        "arrayRotateLeft": lambda a, n: F.when(F.size(a) == 0, a).otherwise(
            F.concat(
                F.slice(a, (n % F.size(a)) + 1, F.size(a)),
                F.slice(a, 1, n % F.size(a)),
            )
        ),
        "toStartOfTenMinutes": lambda c: F.timestamp_seconds(
            F.floor(F.unix_timestamp(c) / 600) * 600
        ),
        "toStartOfFiveMinute": lambda c: F.timestamp_seconds(
            F.floor(F.unix_timestamp(c) / 300) * 300
        ),
        "timeSlot": lambda c: F.timestamp_seconds(
            F.floor(F.unix_timestamp(c) / 1800) * 1800
        ),
        "timeSlots": lambda start, dur: F.transform(
            F.sequence(
                F.floor(F.unix_timestamp(start) / 1800),
                F.floor((F.unix_timestamp(start) + dur) / 1800),
            ),
            lambda s: F.timestamp_seconds(s * 1800),
        ),
        "toRelativeHourNum": lambda c: F.floor(F.unix_timestamp(c) / 3600).cast("long"),
        "toRelativeMinuteNum": lambda c: F.floor(F.unix_timestamp(c) / 60).cast("long"),
        "age": _age,
        "toValidUTF8": lambda c: c,  # Spark strings are already valid UTF-8
        "positionUTF8": lambda c, sub: F.instr(c, sub),  # Spark instr is char-based
        "tryBase64Decode": lambda c: F.try_to_binary(c, F.lit("base64")).cast("string"),
        "domainWithoutWWW": lambda c: F.regexp_replace(
            F.coalesce(F.parse_url(c, F.lit("HOST")), F.lit("")), r"^www\.", ""
        ),
        # firstSignificantSubdomain: simplified public-suffix handling — the
        # label before the TLD, with the common 2-level suffixes special-
        # cased (the reference embeds a full suffix list).
        "firstSignificantSubdomain": lambda c: F.element_at(
            F.split(
                F.regexp_replace(
                    F.coalesce(F.parse_url(c, F.lit("HOST")), F.lit("")),
                    r"\.(com?|org|net|edu|gov)\.[a-z]{2}$|\.[a-z]+$",
                    "",
                ),
                r"\.",
            ),
            -1,
        ),
        "pointInPolygon": _point_in_polygon,
        "greatCircleAngle": lambda lon1, lat1, lon2, lat2: (
            _haversine_m(lon1, lat1, lon2, lat2) / F.lit(6371000.0) * F.lit(180.0)
        )
        / F.lit(3.141592653589793),
        "randNormal": lambda mean=0.0, sd=1.0: F.randn() * F.lit(sd) + F.lit(mean),
        "randUniform": lambda lo=0.0, hi=1.0: F.rand() * (F.lit(hi) - F.lit(lo)) + F.lit(lo),
        "formatDateTimeInJodaSyntax": lambda c, fmt: F.date_format(c, fmt),
        "snowflakeToDateTime": lambda c: F.timestamp_millis(
            F.shiftrightunsigned(c.cast("long"), 22) + F.lit(_SNOWFLAKE_EPOCH_MS)
        ),
        "dateTimeToSnowflake": lambda c: F.shiftleft(
            F.unix_millis(c) - F.lit(_SNOWFLAKE_EPOCH_MS), 22
        ),
        "mapAdd": lambda m1, m2: F.map_zip_with(
            m1, m2, lambda k, v1, v2: F.coalesce(v1 + v2, v1, v2)
        ),
        "mapSubtract": lambda m1, m2: F.map_zip_with(
            m1, m2, lambda k, v1, v2: F.coalesce(v1 - v2, v1, -v2)
        ),
        "mapPopulateSeries": lambda m: F.map_from_arrays(
            F.sequence(F.array_min(F.map_keys(m)), F.array_max(F.map_keys(m))),
            F.transform(
                F.sequence(F.array_min(F.map_keys(m)), F.array_max(F.map_keys(m))),
                lambda k: F.coalesce(F.element_at(m, k), F.lit(0).cast("long")),
            ),
        ),
    }
)


def _array_auc(scores: Column, labels: Column) -> Column:
    """arrayAUC(scores, labels) — reference src/Functions/array/
    arrayAUC.cpp: sort DESC by score, walk the ROC staircase (positive =
    step up, negative = area += positives-so-far), normalize by P*N; NaN
    when one class is empty.  Ties sort label-ascending here for
    determinism (the reference's std::sort leaves tie order unspecified).
    Pure Column fold — constant-size expression tree, no UDF."""
    z = F.array_sort(
        F.zip_with(
            scores,
            labels,
            lambda s, l: F.struct(
                (-s).alias("ns"), (l > 0).cast("int").alias("l")
            ),
        )
    )
    acc = F.aggregate(
        z,
        F.struct(
            F.lit(0).cast("long").alias("area"),
            F.lit(0).cast("long").alias("pos"),
        ),
        lambda a, e: F.struct(
            (a["area"] + F.when(e["l"] > 0, F.lit(0)).otherwise(a["pos"])).alias(
                "area"
            ),
            (a["pos"] + e["l"]).alias("pos"),
        ),
    )
    p = acc["pos"]
    n = F.size(scores) - p
    return F.when(
        (p == 0) | (n == 0), F.lit(float("nan"))
    ).otherwise(acc["area"].cast("double") / p / n)


SCALAR.update(
    {
        "arrayAUC": _array_auc,
        # arrayCompact (array/arrayCompact.cpp): drop CONSECUTIVE duplicates
        "arrayCompact": lambda a: F.filter(
            a, lambda x, i: (i == 0) | ~x.eqNullSafe(F.element_at(a, i))
        ),
        "arrayZip": F.arrays_zip,
    }
)


AGG.update(
    {
        "sumMapFiltered": lambda keys, m: _map_filtered("sum", keys, m),
        "sumMapFilteredWithOverflow": lambda keys, m: _map_filtered("sum", keys, m),
        "minMapFiltered": lambda keys, m: _map_filtered("min", keys, m),
        "maxMapFiltered": lambda keys, m: _map_filtered("max", keys, m),
    }
)


# ---------------------------------------------- round-4 scalar breadth 3
def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _date_add_unit(unit: str, n, c: Column) -> Column:
    unit = unit.lower()
    n = n if isinstance(n, Column) else F.lit(n)
    if unit == "day":
        return F.date_add(c, n.cast("int"))
    if unit == "week":
        return F.date_add(c, (n * 7).cast("int"))
    if unit == "month":
        return F.add_months(c, n.cast("int"))
    if unit == "quarter":
        return F.add_months(c, (n * 3).cast("int"))
    if unit == "year":
        return F.add_months(c, (n * 12).cast("int"))
    if unit in ("second", "minute", "hour"):
        secs = {"second": 1, "minute": 60, "hour": 3600}[unit]
        return F.timestamp_seconds(F.unix_timestamp(c) + n.cast("long") * secs)
    raise ValueError(f"dateAdd: unsupported unit {unit!r}")


SCALAR.update(
    {
        # ---- vector math over array columns (src/Functions/array/ dot /
        # L2 etc. + vectorFunctions.cpp): the embedding-pipeline surface
        "dotProduct": _dot,
        "L1Norm": lambda a: F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double"))
        ),
        "L2Norm": _l2,
        "LinfNorm": lambda a: F.array_max(
            F.transform(a, lambda x: F.abs(x.cast("double")))
        ),
        "L1Distance": lambda a, b: F.aggregate(
            F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        "L2Distance": lambda a, b: F.sqrt(
            F.aggregate(
                F.zip_with(
                    a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        "cosineDistance": lambda a, b: 1.0 - _dot(a, b) / (_l2(a) * _l2(b)),
        # ---- arrays
        "arrayProduct": lambda a: F.aggregate(
            a, F.lit(1.0), lambda acc, x: acc * x.cast("double")
        ),
        "arrayFold": lambda f, a, init: F.aggregate(a, init, f),
        # first n smallest sorted; remainder order is unspecified in the
        # reference — a full sort is a valid instance
        "arrayPartialSort": lambda n, a: F.array_sort(a),
        # ---- strings
        "left": lambda c, n: F.substring(c, 1, n),
        "right": lambda c, n: F.substring(c, -n, n),
        "leftUTF8": lambda c, n: F.substring(c, 1, n),
        "rightUTF8": lambda c, n: F.substring(c, -n, n),
        "mid": lambda c, p, n: F.substring(c, p, n),
        "overlay": lambda c, r, p, n=None: (
            F.overlay(c, r, p) if n is None else F.overlay(c, r, p, n)
        ),
        "chr": F.char,
        "notILike": lambda c, pat: ~c.ilike(pat),
        "startsWithUTF8": lambda c, p: c.startswith(p),
        "endsWithUTF8": lambda c, p: c.endswith(p),
        "regexpQuoteMeta": lambda c: F.regexp_replace(
            c, r"([\\.^$|()\[\]{}*+?])", r"\\$1"
        ),
        "extractGroups": lambda c, pat, n_groups: F.array(
            *[F.regexp_extract(c, pat, i + 1) for i in range(n_groups)]
        ),
        "stringJaccardIndex": lambda a, b: (
            F.size(
                F.array_intersect(
                    F.array_distinct(F.split(a, "")),
                    F.array_distinct(F.split(b, "")),
                )
            ).cast("double")
            / F.size(
                F.array_union(
                    F.array_distinct(F.split(a, "")),
                    F.array_distinct(F.split(b, "")),
                )
            )
        ),
        # ---- numbers
        "intExp2": lambda n: (
            F.shiftleft(F.lit(1).cast("long"), n)
            if isinstance(n, int)
            else F.pow(F.lit(2.0), n).cast("long")
        ),
        "intExp10": lambda n: F.pow(F.lit(10.0), n).cast("long"),
        "erfc": lambda x: 1.0 - SCALAR["erf"](x),
        "nanToNull": lambda x: F.when(~F.isnan(x), x),
        "toDecimal32": lambda x, s: x.cast(f"decimal(9,{s})"),
        "toDecimal128": lambda x, s: x.cast(f"decimal(38,{s})"),
        "toInt128": lambda x: x.cast("decimal(38,0)"),
        "bitHammingDistance": lambda a, b: F.bit_count(
            a.cast("long").bitwiseXOR(b.cast("long"))
        ),
        # ---- dates
        "toWeek": F.weekofyear,
        "toISOWeek": F.weekofyear,
        "toModifiedJulianDay": lambda c: F.datediff(
            F.to_date(c), F.lit("1858-11-17").cast("date")
        ).cast("long"),
        "dateTrunc": lambda unit, c: F.date_trunc(unit, c),
        "dateAdd": _date_add_unit,
        "dateSub": lambda unit, n, c: _date_add_unit(
            unit, (n if isinstance(n, Column) else F.lit(n)) * -1, c
        ),
        "timestampAdd": _date_add_unit,
    }
)


def _to_iso_year(c: Column) -> Column:
    """toISOYear: the year owning the date's ISO week — the year of the
    Thursday of that week (ISO 8601 rule)."""
    d = F.to_date(c)
    # Thursday of the date's ISO week: date + (4 - isoDow)
    iso_dow = ((F.dayofweek(d) + 5) % 7) + 1
    thursday = F.date_add(d, (F.lit(4) - iso_dow).cast("int"))
    return F.year(thursday)


SCALAR["toISOYear"] = _to_iso_year


# --------------------------------------- near-dup string hash family
# (src/Functions/FunctionsStringHash.cpp: ngramSimHash / ngramMinHash /
# wordShingleSimHash / wordShingleMinHash).  Hash primitive is xxhash64
# (the engine-wide documented stand-in for CH's CRC32/cityHash — stable
# within this engine, not bit-identical to ClickHouse).
def _ngram_hashes(c: Column, n: int) -> Column:
    return F.transform(_char_ngrams(F.lower(c), n), lambda g: F.xxhash64(g))


def _word_shingle_hashes(c: Column, k: int) -> Column:
    words = F.split(F.lower(F.trim(c)), r"\s+")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (k - 1), F.lit(1))),
        lambda i: F.xxhash64(F.slice(words, i, k)),
    )


_BIT_MASKS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _mask_array() -> Column:
    return F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])


def _simhash_of(hashes: Column) -> Column:
    """64-bit bit-vote SimHash folded as a pure Column expression: one
    64-cell vote array accumulated with zip_with against precomputed bit
    masks (shift builtins take only literal bit counts), then
    sign-majority recombination."""
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            _mask_array(),
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            _mask_array(),
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def _minhash_of(hashes: Column, hashnum: int) -> Column:
    srt = F.array_sort(hashes)
    lows = F.slice(srt, 1, hashnum)
    his = F.slice(F.reverse(srt), 1, hashnum)
    return F.struct(F.xxhash64(lows).alias("h1"), F.xxhash64(his).alias("h2"))


SCALAR.update(
    {
        "ngramSimHash": lambda c, n=2: _simhash_of(_ngram_hashes(c, n)),
        "ngramMinHash": lambda c, n=2, hashnum=6: _minhash_of(
            _ngram_hashes(c, n), hashnum
        ),
        "wordShingleSimHash": lambda c, k=3: _simhash_of(
            _word_shingle_hashes(c, k)
        ),
        "wordShingleMinHash": lambda c, k=3, hashnum=6: _minhash_of(
            _word_shingle_hashes(c, k), hashnum
        ),
    }
)


# ---- IPv6 + base58 codecs (src/Functions/FunctionsCodingIP.cpp,
# base58Encode.cpp / base58Decode.cpp).  IPv6 canonicalization (RFC 5952
# longest-zero-run compression) and base58 bignum division are per-row
# byte-level algorithms with no bounded Column form -> Arrow-batched pandas
# UDFs (the registry's documented slow path; every other codec here stays
# JVM-side).

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _b58_encode_bytes(b: bytes) -> str:
    n = int.from_bytes(b, "big")
    out = ""
    while n:
        out = _B58_ALPHABET[n % 58] + out
        n //= 58
    pad = 0
    for byte in b:
        if byte:
            break
        pad += 1
    return "1" * pad + out


def _b58_decode_str(s: str) -> bytes:
    n = 0
    for ch in s:
        n = n * 58 + _B58_ALPHABET.index(ch)
    pad = len(s) - len(s.lstrip("1"))
    body = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    return b"\x00" * pad + body


def _ipv6_string_to_num(col: Column) -> Column:
    @F.pandas_udf("binary")
    def k(s: pd.Series) -> pd.Series:
        import ipaddress

        return s.map(lambda v: None if v is None else ipaddress.IPv6Address(v).packed)

    return k(col)


def _ipv6_num_to_string(col: Column) -> Column:
    @F.pandas_udf("string")
    def k(b: pd.Series) -> pd.Series:
        import ipaddress

        return b.map(
            lambda v: None if v is None else str(ipaddress.IPv6Address(bytes(v)))
        )

    return k(col)


def _is_ipv6_string(col: Column) -> Column:
    @F.pandas_udf("boolean")
    def k(s: pd.Series) -> pd.Series:
        import ipaddress

        def chk(v):
            if v is None:
                return None
            try:
                ipaddress.IPv6Address(v)
                return True
            except ValueError:
                return False

        return s.map(chk)

    return k(col)


def _base58_encode(col: Column) -> Column:
    @F.pandas_udf("string")
    def k(b: pd.Series) -> pd.Series:
        return b.map(
            lambda v: None if v is None else _b58_encode_bytes(
                v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            )
        )

    return k(col)


def _base58_decode(col: Column) -> Column:
    @F.pandas_udf("binary")
    def k(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else _b58_decode_str(v))

    return k(col)


SCALAR.update(
    {
        "IPv6StringToNum": _ipv6_string_to_num,
        "IPv6NumToString": _ipv6_num_to_string,
        "toIPv6": _ipv6_string_to_num,
        "isIPv6String": _is_ipv6_string,
        "base58Encode": _base58_encode,
        "base58Decode": _base58_decode,
    }
)


# ---- round-5 registry batch: conversion Or-variants, URL codecs, hash
# stand-ins, bitmaskToList, caseWithExpression, ngrams
# (src/Functions/FunctionsConversion.h try-parse forms, URL/,
# FunctionsHashing.h, bitmaskToList.cpp, caseWithExpression.cpp)

def _case_with_expression(expr: Column, *rest) -> Column:
    """caseWithExpression(x, w1, r1, ..., default): CASE x WHEN w THEN r."""
    pairs, default = rest[:-1], rest[-1]
    out = None
    for i in range(0, len(pairs) - 1, 2):
        cond = expr == pairs[i]
        out = F.when(cond, pairs[i + 1]) if out is None else out.when(cond, pairs[i + 1])
    return out.otherwise(default) if out is not None else F.lit(default)


def _bitmask_to_list(c: Column) -> Column:
    # powers array built INSIDE the call: module-level F.array(...) would
    # run at import time — and pandas-UDF workers re-import this module
    # with no active SparkContext, which crashes every UDF in the registry
    n = c.cast("long")
    powers = F.array(*[F.lit(1 << i) for i in range(63)])
    return F.array_join(
        F.filter(
            F.transform(
                powers,
                lambda p: F.when((n.bitwiseAND(p)) == p, p.cast("string")),
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )


SCALAR.update(
    {
        "decodeURLComponent": F.url_decode,
        "encodeURLComponent": F.url_encode,
        "toInt32OrNull": lambda c: c.try_cast("int"),
        "toInt64OrNull": lambda c: c.try_cast("bigint"),
        "toFloat64OrNull": lambda c: c.try_cast("double"),
        "toInt32OrZero": lambda c: F.coalesce(c.try_cast("int"), F.lit(0)),
        "toInt64OrZero": lambda c: F.coalesce(c.try_cast("bigint"), F.lit(0).cast("bigint")),
        "toFloat64OrZero": lambda c: F.coalesce(c.try_cast("double"), F.lit(0.0)),
        "toDateOrNull": lambda c: c.try_cast("date"),
        "toDateTimeOrNull": lambda c: c.try_cast("timestamp"),
        "parseDateTimeBestEffortOrNull": lambda c: c.try_cast("timestamp"),
        "bitmaskToList": _bitmask_to_list,
        "caseWithExpression": _case_with_expression,
        # hash stand-ins (documented, like cityHash64 -> xxhash64)
        "sipHash128": lambda *cols: F.md5(F.concat_ws("\x01", *cols)),
        "hiveHash": lambda c: F.hash(c),
        "intHash32": lambda c: F.hash(c.cast("long")),
        "intHash64": lambda c: F.xxhash64(c.cast("long")),
        "URLHash": lambda c: F.xxhash64(F.substring_index(c, "#", 1)),
        "ngrams": lambda c, n: __import__(
            "byconity_spark.llm.text", fromlist=["char_ngrams"]
        ).char_ngrams(c, n),
    }
)


# ---- skew/kurt moment aggregates (AggregateFunctionStatisticsSimple.cpp:
# skewPop/skewSamp/kurtPop/kurtSamp).  CH semantics: skewPop = m3/m2^1.5,
# skewSamp = m3/s^3 (s^2 = SAMPLE variance), kurtPop = m4/m2^2 (NOT
# excess), kurtSamp = m4/s^4 — all derived from raw power sums, which map
# to one partial-aggregable pass.

def _central_moments(c: Column):
    x = c.cast("double")
    n = F.count(x).cast("double")
    mean = F.avg(x)
    s2 = F.avg(x * x)
    s3 = F.avg(x * x * x)
    s4 = F.avg(x * x * x * x)
    m2 = s2 - mean * mean
    m3 = s3 - 3 * mean * s2 + 2 * mean * mean * mean
    m4 = s4 - 4 * mean * s3 + 6 * mean * mean * s2 - 3 * mean * mean * mean * mean
    return n, m2, m3, m4


def _skew_pop(c: Column) -> Column:
    _, m2, m3, _ = _central_moments(c)
    return m3 / F.pow(m2, 1.5)


def _skew_samp(c: Column) -> Column:
    n, m2, m3, _ = _central_moments(c)
    return m3 / F.pow(n / (n - 1) * m2, 1.5)


def _kurt_pop(c: Column) -> Column:
    _, m2, _, m4 = _central_moments(c)
    return m4 / (m2 * m2)


def _kurt_samp(c: Column) -> Column:
    n, m2, _, m4 = _central_moments(c)
    sv = n / (n - 1) * m2
    return m4 / (sv * sv)


AGG.update(
    {
        "skewPop": _skew_pop,
        "skewSamp": _skew_samp,
        "kurtPop": _kurt_pop,
        "kurtSamp": _kurt_samp,
        # Kahan compensation is how the runtime sums; result-equivalent
        "sumKahan": F.sum,
        # Spark's percentile_approx IS the Greenwald-Khanna sketch
        "quantileGK": lambda level, c: F.percentile_approx(c, level),
        # two-sample pooled-variance t statistic (StudentTTest.h); CH also
        # returns the p-value, which needs the t CDF — t-stat only here
        "studentTTest": lambda v, g: (
            (
                F.avg(F.when(g, v.cast("double")))
                - F.avg(F.when(~g, v.cast("double")))
            )
            / F.sqrt(
                (
                    (F.count(F.when(g, v)) - 1) * F.var_samp(F.when(g, v.cast("double")))
                    + (F.count(F.when(~g, v)) - 1) * F.var_samp(F.when(~g, v.cast("double")))
                )
                / (F.count(F.when(g, v)) + F.count(F.when(~g, v)) - 2)
                * (1.0 / F.count(F.when(g, v)) + 1.0 / F.count(F.when(~g, v)))
            )
        ),
    }
)


# ---- string-distance family (src/Functions/FunctionsStringDistance.cpp:
# editDistance/levenshteinDistance, byteHammingDistance,
# stringJaccardIndex).  All pure Column HOFs.

def _byte_hamming(a: Column, b: Column) -> Column:
    la, lb = F.length(a), F.length(b)
    common = F.least(la, lb)
    diff = F.when(
        common >= 1,
        F.size(
            F.filter(
                F.sequence(F.lit(1), common),
                lambda i: a.substr(i, F.lit(1)) != b.substr(i, F.lit(1)),
            )
        ),
    ).otherwise(0)
    return (diff + F.abs(la - lb)).cast("long")


def _string_jaccard(a: Column, b: Column) -> Column:
    ca = F.array_distinct(F.split(a, ""))
    cb = F.array_distinct(F.split(b, ""))
    inter = F.size(F.array_intersect(ca, cb)).cast("double")
    union = F.size(F.array_union(ca, cb))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


SCALAR.update(
    {
        "editDistance": F.levenshtein,
        "levenshteinDistance": F.levenshtein,
        "byteHammingDistance": _byte_hamming,
        "mismatches": _byte_hamming,  # CH alias
        "stringJaccardIndex": _string_jaccard,
    }
)


def _jaro_core(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jaro_winkler_core(s1: str, s2: str, p: float = 0.1, thr: float = 0.7) -> float:
    j = _jaro_core(s1, s2)
    if j > thr:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j += l * p * (1.0 - j)
    return j


def _jaro_winkler(a: Column, b: Column) -> Column:
    """jaroWinklerSimilarity (FunctionsStringDistance.cpp) — standard
    Winkler boost (p=0.1, threshold 0.7), verified double-exact against
    DuckDB's jaro_winkler_similarity on public test vectors.  Per-row
    character scanning -> Arrow-batched pandas UDF."""

    @F.pandas_udf("double")
    def k(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (s1 is None or s2 is None) else _jaro_winkler_core(s1, s2)
                for s1, s2 in zip(x, y)
            ]
        )

    return k(a, b)


def _jaro_similarity(a: Column, b: Column) -> Column:
    """jaroSimilarity — plain Jaro, no Winkler prefix boost."""

    @F.pandas_udf("double")
    def k(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (s1 is None or s2 is None) else _jaro_core(s1, s2)
                for s1, s2 in zip(x, y)
            ]
        )

    return k(a, b)


SCALAR["jaroWinklerSimilarity"] = _jaro_winkler
SCALAR["jaroSimilarity"] = _jaro_similarity


# ---- firstSignificantSubdomain family (src/Functions/URL/
# firstSignificantSubdomain.h).  The reference embeds a full public-suffix
# list; this carries a bounded subset of common two-label suffixes — the
# plan shape (host split + suffix membership + label pick) is identical,
# and the list is a data swap-in point.
_TWO_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.cn", "net.cn", "org.cn", "com.br",
    "com.mx", "co.in", "co.kr", "com.tr", "com.sg", "co.za", "com.hk",
]


def _host_parts(url: Column):
    # try_element_at everywhere: CASE branches do NOT guard subexpression
    # evaluation, so a single-label host would crash a strict element_at(-2)
    host = F.parse_url(url, F.lit("HOST"))
    parts = F.split(host, r"\.")
    last2 = F.concat_ws(
        ".", F.try_element_at(parts, F.lit(-2)), F.try_element_at(parts, F.lit(-1))
    )
    return parts, F.size(parts), last2.isin(_TWO_LABEL_SUFFIXES)


def _first_significant_subdomain(url: Column) -> Column:
    parts, np, is2 = _host_parts(url)
    return (
        F.when(is2 & (np >= 3), F.try_element_at(parts, F.lit(-3)))
        .when(np >= 2, F.try_element_at(parts, F.lit(-2)))
        .otherwise(F.try_element_at(parts, F.lit(-1)))
    )


def _cut_to_first_significant_subdomain(url: Column) -> Column:
    parts, np, is2 = _host_parts(url)
    return (
        F.when(
            is2 & (np >= 3),
            F.concat_ws(
                ".",
                F.try_element_at(parts, F.lit(-3)),
                F.try_element_at(parts, F.lit(-2)),
                F.try_element_at(parts, F.lit(-1)),
            ),
        )
        .when(
            np >= 2,
            F.concat_ws(
                ".",
                F.try_element_at(parts, F.lit(-2)),
                F.try_element_at(parts, F.lit(-1)),
            ),
        )
        .otherwise(F.try_element_at(parts, F.lit(-1)))
    )


SCALAR["firstSignificantSubdomain"] = _first_significant_subdomain
SCALAR["cutToFirstSignificantSubdomain"] = _cut_to_first_significant_subdomain
SCALAR["domainWithoutWWW"] = lambda c: F.regexp_replace(
    F.parse_url(c, F.lit("HOST")), r"^www\.", ""
)


# ---- JSON tail (FunctionsJSON.cpp): type probing, validation, visitParam
# aliases, struct-to-JSON
SCALAR.update(
    {
        # JSONType: CH returns 'Object'/'Array'/'String'/'Int64'/'Double'/
        # 'Bool'/'Null' — derived from the extract's shape.  NB
        # get_json_object UNQUOTES scalar strings, so post-unquote a JSON
        # string is indistinguishable from the bare scalar it spells:
        # {"k":"123"} classifies as Int64 (CH: String), {"k":"1.5"} as
        # Double, {"k":"true"} as Bool — documented deviation for EVERY
        # scalar-looking quoted string, not just non-numeric ones.
        "JSONType": lambda c, *keys: (
            lambda raw: F.when(raw.isNull(), F.lit(None).cast("string"))
            .when(raw.startswith("{"), "Object")
            .when(raw.startswith("["), "Array")
            .when(raw.isin("true", "false"), "Bool")
            .when(raw == "null", "Null")
            .when(raw.rlike(r"^-?\d+$"), "Int64")
            .when(raw.try_cast("double").isNotNull(), "Double")
            .otherwise("String")
        )(F.get_json_object(c, _jpath(keys) if keys else "$")),
        "isValidJSON": lambda c: F.get_json_object(c, "$").isNotNull()
        | F.from_json(c, "map<string,string>").isNotNull(),
        "JSON_EXISTS": lambda c, p: F.get_json_object(
            c, p if isinstance(p, str) else p
        ).isNotNull(),
        "simpleJSONExtractInt": lambda c, k: F.get_json_object(
            c, _jpath((k,))
        ).cast("bigint"),
        "simpleJSONExtractString": lambda c, k: F.get_json_object(c, _jpath((k,))),
        "visitParamHas": lambda c, k: F.get_json_object(c, _jpath((k,))).isNotNull(),
        "toJSONString": F.to_json,
    }
)


# ---- round-5 exact-name parity sweep (diffed against the reference's
# registered names).  Everything below maps CH names onto machinery that
# already exists — Spark built-ins, the vector/bitmap helpers, or trivial
# Column math.  UTF8-suffixed variants equal the base forms (Spark strings
# are UTF-8 throughout).

def _bm(name):
    """Lazy bitmap-helper lookup (udafs.bitmaps defines the kernels)."""
    import importlib

    return getattr(importlib.import_module("byconity_spark.udafs.bitmaps"), name)


def _num_conversions() -> dict:
    out = {}
    specs = {
        "Int8": "tinyint", "Int16": "smallint", "Int32": "int",
        "Int64": "bigint", "UInt8": "smallint", "UInt16": "int",
        "UInt32": "bigint", "UInt64": "bigint", "Float32": "float",
        "Float64": "double",
    }
    for ch_name, t in specs.items():
        out[f"to{ch_name}"] = (lambda tt: lambda c: c.cast(tt))(t)
        out[f"to{ch_name}OrNull"] = (lambda tt: lambda c: c.try_cast(tt))(t)
        out[f"to{ch_name}OrZero"] = (
            lambda tt: lambda c: F.coalesce(c.try_cast(tt), F.lit(0).cast(tt))
        )(t)
        out[f"to{ch_name}OrDefault"] = (
            lambda tt: lambda c, d: F.coalesce(c.try_cast(tt), F.lit(d).cast(tt))
        )(t)
    return out


def _multi_search() -> dict:
    def _needles(h, needles, ci):
        hh = F.lower(h) if ci else h
        arr = needles if isinstance(needles, Column) else F.array(
            *[F.lit(n) for n in needles]
        )
        if ci:
            arr = F.transform(arr, F.lower)
        return hh, arr

    def any_(ci):
        def f(h, needles):
            hh, arr = _needles(h, needles, ci)
            return F.exists(arr, lambda n: F.instr(hh, n) > 0)
        return f

    def first_index(ci):
        def f(h, needles):
            hh, arr = _needles(h, needles, ci)
            idx = F.filter(
                F.transform(arr, lambda n, i: F.when(F.instr(hh, n) > 0, i + 1)),
                lambda x: x.isNotNull(),
            )
            return F.coalesce(F.try_element_at(idx, F.lit(1)), F.lit(0)).cast("long")
        return f

    def first_position(ci):
        def f(h, needles):
            hh, arr = _needles(h, needles, ci)
            pos = F.filter(
                F.transform(arr, lambda n: F.instr(hh, n)), lambda p: p > 0
            )
            return F.coalesce(F.array_min(pos), F.lit(0)).cast("long")
        return f

    def all_positions(ci):
        def f(h, needles):
            hh, arr = _needles(h, needles, ci)
            return F.transform(arr, lambda n: F.instr(hh, n).cast("long"))
        return f

    out = {}
    for base, fn in [
        ("multiSearchAny", any_),
        ("multiSearchFirstIndex", first_index),
        ("multiSearchFirstPosition", first_position),
        ("multiSearchAllPositions", all_positions),
    ]:
        out[base] = fn(False)
        out[base + "UTF8"] = fn(False)
        out[base + "CaseInsensitive"] = fn(True)
        out[base + "CaseInsensitiveUTF8"] = fn(True)
    return out


SCALAR.update(_num_conversions())
SCALAR.update(_multi_search())
SCALAR.update(
    {
        # hashes / checksums
        "SHA1": lambda c: F.sha1(c.cast("binary")),
        "SHA224": lambda c: F.sha2(c.cast("binary"), 224),
        "SHA384": lambda c: F.sha2(c.cast("binary"), 384),
        "SHA512": lambda c: F.sha2(c.cast("binary"), 512),
        "CRC32IEEE": F.crc32,
        "CRC64": lambda c: F.xxhash64(c),  # 64-bit stand-in
        "farmFingerprint64": lambda *cols: F.xxhash64(*cols),  # stand-in
        # math
        "cosh": F.cosh, "sinh": F.sinh, "tanh": F.tanh,
        "acosh": F.acosh, "asinh": F.asinh, "atanh": F.atanh,
        "cot": F.cot, "factorial": F.factorial,
        "countDigits": lambda c: F.length(
            F.regexp_replace(F.abs(c).cast("string"), r"[^0-9]", "")
        ).cast("long"),
        "divideDecimal": lambda a, b, *s: a / b,
        # operator-name functions (CH registers the operators as functions)
        "and": lambda *cs: __import__("functools").reduce(lambda a, b: a & b, cs),
        "or": lambda *cs: __import__("functools").reduce(lambda a, b: a | b, cs),
        "not": lambda c: ~c,
        "equals": lambda a, b: a == b,
        "notEquals": lambda a, b: a != b,
        "less": lambda a, b: a < b,
        "greater": lambda a, b: a > b,
        "lessOrEquals": lambda a, b: a <= b,
        "greaterOrEquals": lambda a, b: a >= b,
        # date/time extras
        "FROM_UNIXTIME": lambda c, fmt=None: (
            F.from_unixtime(c) if fmt is None else F.from_unixtime(c, fmt)
        ),
        "UTCTimestamp": lambda: F.current_timestamp(),
        "TimeDiff": lambda a, b: F.unix_timestamp(b) - F.unix_timestamp(a),
        "timeDiff": lambda a, b: F.unix_timestamp(b) - F.unix_timestamp(a),
        "convert_tz": lambda c, frm, to: F.convert_timezone(
            F.lit(frm) if isinstance(frm, str) else frm,
            F.lit(to) if isinstance(to, str) else to,
            c,
        ),
        "dayname": lambda c: F.date_format(c, "EEEE"),
        "monthname": lambda c: F.date_format(c, "MMMM"),
        # INTERVAL arithmetic (not add_months/date_sub, which return DATE
        # for timestamp input) so DateTime stays DateTime, like CH — same
        # rule as addYears/addWeeks/subtractDays at the top of this file.
        "addQuarters": lambda c, n: c + F.expr(f"INTERVAL {3 * int(n)} MONTH"),
        "subtractQuarters": lambda c, n: c - F.expr(f"INTERVAL {3 * int(n)} MONTH"),
        "subtractWeeks": lambda c, n: c - F.expr(f"INTERVAL {7 * int(n)} DAY"),
        "subtractYears": lambda c, n: c - F.expr(f"INTERVAL {int(n)} YEAR"),
        "addMilliseconds": lambda c, n: F.timestamp_micros(
            F.unix_micros(c) + (n * 1000 if isinstance(n, int) else n * 1000)
        ),
        "addMicroseconds": lambda c, n: F.timestamp_micros(F.unix_micros(c) + n),
        "subtractMilliseconds": lambda c, n: F.timestamp_micros(
            F.unix_micros(c) - (n * 1000 if isinstance(n, int) else n * 1000)
        ),
        "subtractMicroseconds": lambda c, n: F.timestamp_micros(F.unix_micros(c) - n),
        "toStartOfSecond": lambda c: F.date_trunc("second", c),
        "toStartOfMillisecond": lambda c: F.timestamp_micros(
            (F.unix_micros(c) / 1000).cast("long") * 1000
        ),
        "toStartOfMicrosecond": lambda c: c,  # us is native precision
        "toStartOfNanosecond": lambda c: c,   # ns below native precision
        "toStartOfBiMonth": lambda c: F.make_date(
            F.year(c), ((F.month(c) - 1) - (F.month(c) - 1) % 2) + 1, F.lit(1)
        ),
        "toStartOfISOYear": lambda c: F.date_trunc(
            "week", F.make_date(F.extract(F.lit("YEAROFWEEK"), c), F.lit(1), F.lit(4))
        ).cast("date"),
        # strings
        "positionCaseInsensitiveUTF8": lambda a, b: F.instr(F.lower(a), F.lower(b)),
        "countSubstringsCaseInsensitive": lambda a, b: (
            (F.length(F.lower(a)) - F.length(F.replace(F.lower(a), F.lower(b), F.lit(""))))
            / F.length(b)
        ).cast("long"),
        "countMatches": lambda c, pat: F.regexp_count(c, F.lit(pat) if isinstance(pat, str) else pat),
        "countMatchesCaseInsensitive": lambda c, pat: F.regexp_count(
            F.lower(c), F.lower(F.lit(pat) if isinstance(pat, str) else pat)
        ),
        "concatAssumeInjective": lambda *cs: F.concat(*cs),
        "substring_index": F.substring_index,
        "bit_length": lambda c: (F.length(c.cast("binary")) * 8).cast("long"),
        "encodeXMLComponent": lambda c: F.replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.replace(c, F.lit("&"), F.lit("&amp;")),
                        F.lit("<"), F.lit("&lt;"),
                    ),
                    F.lit(">"), F.lit("&gt;"),
                ),
                F.lit('"'), F.lit("&quot;"),
            ),
            F.lit("'"), F.lit("&apos;"),
        ),
        "decodeXMLComponent": lambda c: F.replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.replace(c, F.lit("&lt;"), F.lit("<")),
                        F.lit("&gt;"), F.lit(">"),
                    ),
                    F.lit("&quot;"), F.lit('"'),
                ),
                F.lit("&apos;"), F.lit("'"),
            ),
            F.lit("&amp;"), F.lit("&"),
        ),
        # vector math extras
        "L2SquaredNorm": lambda a: F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        ),
        "L2SquaredDistance": lambda a, b: F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        "LinfDistance": lambda a, b: F.array_max(
            F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y))
        ),
        "LpNorm": lambda a, p: F.pow(
            F.aggregate(
                a, F.lit(0.0),
                lambda acc, x: acc + F.pow(F.abs(x.cast("double")), F.lit(float(p))),
            ),
            F.lit(1.0 / float(p)),
        ),
        "LpDistance": lambda a, b, p: F.pow(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: F.pow(F.abs(x.cast("double") - y), F.lit(float(p)))),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            F.lit(1.0 / float(p)),
        ),
        # session introspection
        "currentDatabase": lambda: F.current_database(),
        "currentCatalog": lambda: F.current_catalog(),
        "currentUser": lambda: F.current_user(),
        # bitmap scalar names -> udafs.bitmaps kernels (binary sorted-set
        # state encoding; lazy lookup avoids import cycles)
        "bitmapCardinality": lambda bm: _bm("bitmap_cardinality")(bm),
        "bitmapAndCardinality": lambda a, b: _bm("bitmap_and_cardinality")(a, b),
        "bitmapOrCardinality": lambda a, b: _bm("bitmap_or_cardinality")(a, b),
        "bitmapXorCardinality": lambda a, b: _bm("bitmap_xor_cardinality")(a, b),
        "bitmapAndnotCardinality": lambda a, b: _bm("bitmap_andnot_cardinality")(a, b),
        "bitmapAnd": lambda a, b: _bm("bitmap_and")(a, b),
        "bitmapOr": lambda a, b: _bm("bitmap_or")(a, b),
        "bitmapXor": lambda a, b: _bm("bitmap_xor")(a, b),
        "bitmapAndnot": lambda a, b: _bm("bitmap_andnot")(a, b),
        "bitmapToArray": lambda bm: _bm("bitmap_to_array")(bm),
        "bitmapContains": lambda bm, v: _bm("bitmap_contains")(bm, v),
        "bitmapHasAll": lambda a, b: _bm("bitmap_has_all")(a, b),
        "bitmapHasAny": lambda a, b: _bm("bitmap_has_any")(a, b),
        "bitmapMin": lambda bm: _bm("bitmap_min")(bm),
        "bitmapMax": lambda bm: _bm("bitmap_max")(bm),
        "bitmapSubsetInRange": lambda bm, lo, hi: _bm("bitmap_subset_in_range")(bm, lo, hi),
        "bitmapSubsetLimit": lambda bm, s, l: _bm("bitmap_subset_limit")(bm, s, l),
        "bitmapTransform": lambda bm, f, t: _bm("bitmap_transform")(bm, f, t),
        "subBitmap": lambda bm, o, l: _bm("sub_bitmap")(bm, o, l),
        "emptyBitmap": lambda: _bm("empty_bitmap")(),
        # bit extras
        "bitTestAll": lambda c, *bits: __import__("functools").reduce(
            lambda a, b: a & b, [F.bit_get(c, F.lit(b)) == 1 for b in bits]
        ),
        "bitTestAny": lambda c, *bits: __import__("functools").reduce(
            lambda a, b: a | b, [F.bit_get(c, F.lit(b)) == 1 for b in bits]
        ),
        "bitPositionsToArray": lambda c: F.filter(
            F.transform(
                F.sequence(F.lit(0), F.lit(62)),
                lambda i: F.when(F.bit_get(c.cast("long"), i) == 1, i.cast("long")),
            ),
            lambda x: x.isNotNull(),
        ),
    }
)


# UTF8-suffixed aliases are IDENTICAL to base forms (Spark strings are
# UTF-8); register whatever bases exist.
for _base in [
    "countSubstringsCaseInsensitive", "ngramDistance", "ngramMinHash",
    "ngramSearch", "ngramSimHash", "translate", "wordShingleMinHash",
    "wordShingleSimHash", "splitByChar", "splitByString", "substring",
    "position", "length", "reverse", "lower", "upper", "trimBoth",
]:
    if _base in SCALAR and f"{_base}UTF8" not in SCALAR:
        SCALAR[f"{_base}UTF8"] = SCALAR[_base]


# ---- encrypt/decrypt (FunctionsAES.h): CH mode strings map onto Spark's
# native aes_encrypt/aes_decrypt (supported modes: ECB, GCM, CBC)
def _aes_mode(ch_mode: str) -> tuple:
    # 'aes-128-ecb' -> ('ECB', padding) ; key length enforced by Spark
    m = ch_mode.lower().rsplit("-", 1)[-1].upper()
    if m not in ("ECB", "GCM", "CBC"):
        raise ValueError(f"unsupported AES mode {ch_mode!r} (ECB/GCM/CBC)")
    return m, "DEFAULT"


SCALAR.update(
    {
        "encrypt": lambda mode, c, key: F.aes_encrypt(
            c.cast("binary"),
            key if isinstance(key, Column) else F.lit(key),
            F.lit(_aes_mode(mode)[0]),
        ),
        "decrypt": lambda mode, c, key: F.aes_decrypt(
            c,
            key if isinstance(key, Column) else F.lit(key),
            F.lit(_aes_mode(mode)[0]),
        ).cast("string"),
        "tryDecrypt": lambda mode, c, key: F.try_aes_decrypt(
            c,
            key if isinstance(key, Column) else F.lit(key),
            F.lit(_aes_mode(mode)[0]),
        ).cast("string"),
        # simpleJSON tail (FunctionsVisitParam.h aliases)
        "simpleJSONExtractFloat": lambda c, k: F.get_json_object(
            c, _jpath((k,))
        ).cast("double"),
        "simpleJSONExtractUInt": lambda c, k: F.get_json_object(
            c, _jpath((k,))
        ).cast("bigint"),
        "simpleJSONExtractBool": lambda c, k: F.get_json_object(c, _jpath((k,)))
        == "true",
        "simpleJSONExtractRaw": lambda c, k: F.get_json_object(c, _jpath((k,))),
        "simpleJSONHas": lambda c, k: F.get_json_object(c, _jpath((k,))).isNotNull(),
        "visitParamExtractFloat": lambda c, k: F.get_json_object(
            c, _jpath((k,))
        ).cast("double"),
        "visitParamExtractBool": lambda c, k: F.get_json_object(c, _jpath((k,)))
        == "true",
        "visitParamExtractRaw": lambda c, k: F.get_json_object(c, _jpath((k,))),
        # MySQL-compat names (mysqlCompatibility.cpp family)
        "ELT": lambda n, *cs: F.try_element_at(F.array(*cs), n if isinstance(n, Column) else F.lit(n)),
        "field": lambda s, *cs: F.coalesce(
            F.array_position(F.array(*cs), s), F.lit(0)
        ).cast("long"),
        "extractTextFromHTML": lambda c: F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " "),
                    r"<[^>]*>", " ",
                ),
                r"\s+", " ",
            )
        ),
    }
)


# ---- Int128/256 (DataTypeInt128.h family): mapped onto DECIMAL(38,0) —
# covers the full Int128-typical use (big counters/ids) up to 38 digits;
# beyond-38-digit Int256 values overflow to NULL (documented deviation).
for _big in ("Int128", "UInt128", "Int256", "UInt256"):
    SCALAR[f"to{_big}"] = lambda c: c.cast("decimal(38,0)")
    SCALAR[f"to{_big}OrNull"] = lambda c: c.try_cast("decimal(38,0)")
    SCALAR[f"to{_big}OrZero"] = lambda c: F.coalesce(
        c.try_cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)")
    )

SCALAR.update(
    {
        # MySQL-compat date helpers (mysqlCompatibility family)
        "makedate": lambda y, d: F.date_add(
            F.make_date(y if isinstance(y, Column) else F.lit(y), F.lit(1), F.lit(1)),
            (d if isinstance(d, Column) else F.lit(d)) - 1,
        ),
        "DATE_FORMAT_MYSQL": lambda c, fmt: _format_date_time(c, fmt),
        "TIME_FORMAT": lambda c, fmt: _format_date_time(c, fmt),
        "export_set": lambda bits, on, off, sep=",", n=64: F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(min(n, 63) - 1)),
                lambda i: F.when(
                    F.bit_get(
                        (bits if isinstance(bits, Column) else F.lit(bits)).cast("long"), i
                    )
                    == 1,
                    on if isinstance(on, Column) else F.lit(on),
                ).otherwise(off if isinstance(off, Column) else F.lit(off)),
            ),
            sep,
        ),
    }
)


# --- round-6 parity extension batches (registry_ext.py): MySQL aliases,
# conversion variants, parseDateTime family, DateTime64 unix helpers,
# reinterpretAs*, hash tail, IN functional forms, server constants ---
from byconity_spark.functions import registry_ext as _registry_ext  # noqa: E402

_registry_ext.install(SCALAR, AGG)

# --- round-7 geo-index batch (geo_index.py): H3 index math, full S2
# cell-id math, geohash decode/box cover ---
from byconity_spark.functions import geo_index as _geo_index  # noqa: E402

_geo_index.install(SCALAR)

# --- round-7 parity batch (registry_ext7.py): Spark-dialect + MySQL
# aliases, unicode normal forms, NLP tail, sumMetric/deltaSum/aggThrow ---
from byconity_spark.functions import registry_ext7 as _registry_ext7  # noqa: E402

_registry_ext7.install(SCALAR, AGG)
_registry_ext7.install2(SCALAR, AGG)

# --- round-7 second-pass batch (registry_ext7b.py): the feasible tail of
# the previously-skipped names — sharding math, ByteMap name helpers,
# partitionId, MySQL globals/AES, errorCodeToName, array-set probes,
# topoFindDown, bitSlice, hashid, MD4, exact bayesAB, restricted
# multiFuzzyMatch*, text-search query pair ---
from byconity_spark.functions import registry_ext7b as _registry_ext7b  # noqa: E402

_registry_ext7b.install(SCALAR, AGG)
_registry_ext7b.install2(SCALAR, AGG)

# --- BLAKE3 (FunctionsHashing.h; expected digests pinned from the
# reference's own 02456_BLAKE3_hash_function_test) — pure-python spec
# implementation in blake3_impl.py, hex-string render like MD5 ---
from byconity_spark.functions.blake3_impl import blake3_column as _blake3  # noqa: E402

SCALAR["BLAKE3"] = _blake3

# --- LBS geo-filter family (greatCircleDistance.cpp:346-489 business
# circles, addressFilter.cpp multiAddress*Filter) + the replicate array
# internal — pure Column expressions, constants unroll to OR-chains ---
from byconity_spark.functions import geo_filters as _geo_filters  # noqa: E402

_geo_filters.install(SCALAR)


def _nested(names, *arrs):
    """nested(['k','v'], keys_arr, vals_arr) -> array of named structs
    (src/Functions/nested.cpp — zips N equal-length arrays into one array
    of tuples with the given field names; names must be constants, like
    the reference's always-const argument 0)."""
    if not isinstance(names, (list, tuple)) or not names:
        raise ValueError("nested: first arg must be a non-empty python "
                         "list of field names (reference requires a "
                         "constant array of strings)")
    if len(names) != len(arrs):
        raise ValueError(
            f"nested: {len(names)} names vs {len(arrs)} array arguments"
        )
    cols = [c if isinstance(c, Column) else F.lit(c) for c in arrs]
    n = F.greatest(*[F.size(c) for c in cols]) if len(cols) > 1 else F.size(cols[0])
    row = lambda i: F.struct(  # noqa: E731
        *[F.get(c, i).alias(nm) for nm, c in zip(names, cols)]
    )
    # sequence(0, -1) would infer step -1; guard the empty case explicitly
    # (slice of a one-row build keeps the struct element type)
    empty = F.slice(F.transform(F.sequence(F.lit(0), F.lit(0)), row), 1, 0)
    return F.when(n > 0, F.transform(F.sequence(F.lit(0), n - 1), row)).otherwise(empty)


SCALAR["nested"] = _nested
