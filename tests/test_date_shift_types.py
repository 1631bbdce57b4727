"""Type-preservation contract for the add*/subtract* date-shift family.

Reference: src/Functions/FunctionDateOrDateTimeAddInterval.h — Date
input returns Date for year/quarter/month/week/day units and DateTime
for hour/minute/second units; DateTime input returns DateTime; string
input (11662) parses as DateTime.  r11 regressed Date→TIMESTAMP; this
pins all 16 names.
"""
import datetime as dt

import pytest

from byconity_spark.frontend import ch_sql

DATE_UNITS = ["Years", "Quarters", "Months", "Weeks", "Days"]
TIME_UNITS = ["Hours", "Minutes", "Seconds"]


def _one(spark, expr):
    df = ch_sql(spark, f"SELECT {expr} AS v")
    return df.schema[0].dataType.typeName(), df.collect()[0][0]


@pytest.mark.parametrize("prefix", ["add", "subtract"])
@pytest.mark.parametrize("unit", DATE_UNITS)
def test_date_in_date_out(spark, prefix, unit):
    t, v = _one(spark, f"{prefix}{unit}(toDate('2024-03-15'), 2)")
    assert t == "date", f"{prefix}{unit}: expected date, got {t}"
    assert isinstance(v, dt.date) and not isinstance(v, dt.datetime)


@pytest.mark.parametrize("prefix", ["add", "subtract"])
@pytest.mark.parametrize("unit", TIME_UNITS)
def test_date_in_time_unit_datetime_out(spark, prefix, unit):
    t, v = _one(spark, f"{prefix}{unit}(toDate('2024-03-15'), 2)")
    assert t == "timestamp", f"{prefix}{unit}: expected timestamp, got {t}"


@pytest.mark.parametrize("prefix", ["add", "subtract"])
@pytest.mark.parametrize("unit", DATE_UNITS + TIME_UNITS)
def test_datetime_in_datetime_out(spark, prefix, unit):
    t, v = _one(
        spark, f"{prefix}{unit}(toDateTime('2024-03-15 01:02:03'), 2)"
    )
    assert t == "timestamp", f"{prefix}{unit}: expected timestamp, got {t}"


def test_date_shift_values(spark):
    r = ch_sql(
        spark,
        "SELECT subtractMonths(toDate('2024-03-15'), 2) AS m, "
        "addQuarters(toDate('2024-01-31'), 1) AS q, "
        "subtractWeeks(toDate('2024-03-15'), 2) AS w, "
        "addDays(toDate('2024-02-28'), 2) AS d, "
        "addHours(toDate('2024-03-15'), 5) AS h, "
        "subtractYears(toDate('2024-02-29'), 1) AS y",
    ).collect()[0]
    assert r["m"] == dt.date(2024, 1, 15)
    assert r["q"] == dt.date(2024, 4, 30)
    assert r["w"] == dt.date(2024, 3, 1)
    assert r["d"] == dt.date(2024, 3, 1)
    assert r["h"] == dt.datetime(2024, 3, 15, 5, 0, 0)
    assert r["y"] == dt.date(2023, 2, 28)


def test_string_input_parses(spark):
    # the 11662 string-input forms keep working (timestamp result)
    r = ch_sql(
        spark,
        "SELECT addDays('2000-12-31 19:24:45', 5) AS a, "
        "subtractYears('2000-12-31 19:24:45', -1) AS b",
    )
    assert [f.dataType.typeName() for f in r.schema.fields] == [
        "timestamp", "timestamp"]
    row = r.collect()[0]
    assert row["a"] == dt.datetime(2001, 1, 5, 19, 24, 45)
    assert row["b"] == dt.datetime(2001, 12, 31, 19, 24, 45)


def test_int_div_or_zero_overflow(spark):
    # 00081 line 2: -128 is Int8 in CH; -128/-1 overflows → 0
    r = ch_sql(
        spark,
        "SELECT intDivOrZero(0, 0) AS a, intDivOrZero(-128, -1) AS b, "
        "intDivOrZero(-127, -1) AS c, intDivOrZero(4, 2) AS d, "
        "intDivOrZero(l_linenumber, l_linenumber - l_linenumber) AS e "
        "FROM parquet.`/root/testdata/sf0.001/lineitem.parquet` LIMIT 1",
    ).collect()[0]
    assert tuple(r) == (0, 0, 127, 2, 0)
