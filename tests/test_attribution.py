"""Unit tests for the attributionAnalysis family kernels — the paths not
covered by the SQL oracles: modes 1 and 3, the calendar-day back-time
(back_time == 0), procedure gating order, and top-N fuse selection.

Fixtures are hand-computed against the reference semantics
(AggregateFunctionAttributionAnalysis.h calculateContribution /
getAndProcessValidEvents).
"""

from __future__ import annotations

import datetime as dt

import pytest

from byconity_spark.udafs.attribution import (
    attribution_analysis,
    attribution_analysis_fuse,
    attribution_analysis_partials,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, attr string"
)


def _t(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _as_map(df, value_col="value"):
    return {
        r["touch_event"]: (r["click_cnt"], r["valid_transform_cnt"], r[value_col])
        for r in df.collect()
    }


def test_mode1_latest_touch(spark):
    # click(0), view(10), purchase(20): latest valid touch (view) gets 1.0.
    df = _df(
        spark,
        [
            (1, _t(0), 1, "click", 1.0, ""),
            (2, _t(10), 1, "view", 1.0, ""),
            (3, _t(20), 1, "purchase", 80.0, ""),
        ],
    )
    out = _as_map(
        attribution_analysis(
            df,
            target_event="purchase",
            touch_events=["click", "view"],
            back_time_ms=86_400_000,
            mode=1,
        )
    )
    assert out["view"] == (1, 1, 80.0)
    assert out["click"] == (1, 1, 0.0)


def test_mode3_position_oqp(spark):
    # Four valid touches c1,c2,c3,c4 (time order). Backward scan order is
    # c4,c3,c2,c1: cnt=0 (c4, the LATEST) gets q, cnt=all-1 (c1, the
    # EARLIEST) gets o, middles share avg = p/(all_cnt-2) each.
    rows = [
        (1, _t(0), 1, "a", 1.0, ""),
        (2, _t(1), 1, "b", 1.0, ""),
        (3, _t(2), 1, "b", 1.0, ""),
        (4, _t(3), 1, "c", 1.0, ""),
        (5, _t(4), 1, "purchase", 100.0, ""),
    ]
    out = _as_map(
        attribution_analysis(
            _df(spark, rows),
            target_event="purchase",
            touch_events=["a", "b", "c"],
            back_time_ms=86_400_000,
            mode=3,
            o=0.4,
            p=0.2,
            q=0.4,
        )
    )
    # avg = 0.2/2 = 0.1; c (latest): q = 0.4; a (earliest): o = 0.4;
    # b twice in the middle: 0.1 + 0.1 = 0.2.
    assert out["c"][2] == pytest.approx(40.0)
    assert out["a"][2] == pytest.approx(40.0)
    assert out["b"][2] == pytest.approx(20.0)


def test_mode3_falls_back_to_mode2_under_three(spark):
    rows = [
        (1, _t(0), 1, "a", 1.0, ""),
        (2, _t(1), 1, "b", 1.0, ""),
        (3, _t(2), 1, "purchase", 100.0, ""),
    ]
    out = _as_map(
        attribution_analysis(
            _df(spark, rows),
            target_event="purchase",
            touch_events=["a", "b"],
            back_time_ms=86_400_000,
            mode=3,
        )
    )
    assert out["a"][2] == pytest.approx(50.0)
    assert out["b"][2] == pytest.approx(50.0)


def test_day_window_back_time_zero(spark):
    # back_time = 0 -> same UTC calendar day only; the prior-day click is
    # out of window AND breaks the scan for anything earlier.
    rows = [
        (1, dt.datetime(2024, 1, 1, 23, 0), 1, "click", 1.0, ""),
        (2, dt.datetime(2024, 1, 2, 1, 0), 1, "view", 1.0, ""),
        (3, dt.datetime(2024, 1, 2, 2, 0), 1, "purchase", 60.0, ""),
    ]
    out = _as_map(
        attribution_analysis(
            _df(spark, rows),
            target_event="purchase",
            touch_events=["click", "view"],
            back_time_ms=0,
            mode=2,
        )
    )
    assert out["view"] == (1, 1, 60.0)
    assert out["click"] == (1, 0, 0.0)


def test_break_stops_scan_not_just_filters(spark):
    # same-day touch BEFORE an out-of-window touch would be reachable by a
    # filter but not by the reference's break — it must stay invalid.
    rows = [
        (1, _t(0), 1, "view", 1.0, ""),     # in-window by dt but after break
        (2, _t(5), 1, "click", 1.0, ""),    # out of 30-min window -> break
        (3, _t(40), 1, "purchase", 10.0, ""),
    ]
    out = _as_map(
        attribution_analysis(
            _df(spark, rows),
            target_event="purchase",
            touch_events=["click", "view"],
            back_time_ms=30 * 60_000,
            mode=2,
        )
    )
    # click: dt = 35 min > 30 -> out, breaks; view never scanned.
    assert out["click"][1] == 0
    assert out["view"][1] == 0


def test_procedure_gate_requires_between(spark):
    # touch valid only when the procedure 'step' occurs between it and the
    # target: c1 (before step) valid, c2 (after step) invalid.
    rows = [
        (1, _t(0), 1, "click", 1.0, ""),
        (2, _t(1), 1, "step", 1.0, ""),
        (3, _t(2), 1, "click", 1.0, ""),
        (4, _t(3), 1, "purchase", 30.0, ""),
    ]
    out = _as_map(
        attribution_analysis(
            _df(spark, rows),
            target_event="purchase",
            touch_events=["click"],
            procedure_events=["step"],
            back_time_ms=86_400_000,
            mode=2,
        )
    )
    assert out["click"] == (2, 1, 30.0)


def test_fuse_top_n_keeps_others(spark):
    rows = [
        (1, _t(0), 1, "a", 1.0, ""),
        (2, _t(1), 1, "purchase", 10.0, ""),
        (3, _t(0), 2, "b", 1.0, ""),
        (4, _t(1), 2, "purchase", 50.0, ""),
        (5, _t(0), 3, "purchase", 5.0, ""),  # no touch -> $other
    ]
    parts = attribution_analysis_partials(
        _df(spark, rows),
        target_event="purchase",
        touch_events=["a", "b"],
        back_time_ms=86_400_000,
        mode=2,
        other_transform=True,
    )
    out = attribution_analysis_fuse(parts, top_n=1, need_others=True)
    names = {r["touch_event"] for r in out.collect()}
    assert names == {"b", "$other_conversions"}


def test_trailing_journey_ignored(spark):
    # touches after the last target count clicks but never validate.
    rows = [
        (1, _t(0), 1, "purchase", 10.0, ""),
        (2, _t(1), 1, "click", 1.0, ""),
    ]
    out = _as_map(
        attribution_analysis(
            _df(spark, rows),
            target_event="purchase",
            touch_events=["click"],
            back_time_ms=86_400_000,
            mode=2,
            other_transform=True,
        )
    )
    assert out["click"] == (1, 0, 0.0)
    assert out["$other_conversions"] == (1, 0, 10.0)


def test_attribution_partition_invariance(spark):
    """Bucketed kernel output must be identical under any input
    partitioning (the per-user logic may never depend on bucket or
    partition boundaries)."""
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(40):
        t = 0.0
        for _ in range(rng.randint(3, 12)):
            t += rng.random() * 5000
            typ = rng.choice(["click", "view", "purchase", "error"])
            rows.append((eid, _t(t), u, typ, round(rng.random() * 100, 2), ""))
            eid += 1
    df = _df(spark, rows)

    def run(d):
        out = attribution_analysis(
            d,
            target_event="purchase",
            touch_events=["click", "view"],
            back_time_ms=86_400_000,
            mode=2,
            other_transform=True,
        )
        return sorted(
            (r.touch_event, r.click_cnt, r.valid_transform_cnt,
             round(r.value, 6), r.gap_ms_sum, r.steps_sum)
            for r in out.collect()
        )

    assert run(df) == run(df.repartition(13)) == run(df.repartition(1))


def test_procedure_attr_match(spark):
    """procedure_attr_match: the procedure only gates when its attr equals
    the target's attr (valueAssociation, AttributionAnalysis.h:401-427)."""
    rows = [
        (1, _t(0), 1, "click", 1.0, "X"),
        (2, _t(1), 1, "step", 1.0, "Y"),    # wrong attr -> never seen
        (3, _t(2), 1, "purchase", 30.0, "X"),
        (4, _t(0), 2, "click", 1.0, "X"),
        (5, _t(1), 2, "step", 1.0, "X"),    # matching attr -> gates open
        (6, _t(2), 2, "purchase", 30.0, "X"),
    ]
    out = _as_map(
        attribution_analysis(
            _df(spark, rows),
            target_event="purchase",
            touch_events=["click"],
            procedure_events=["step"],
            back_time_ms=86_400_000,
            mode=2,
            procedure_attr_match=True,
            attr_col="attr",
        )
    )
    # only user 2's click validates (user 1's 'step' attr mismatches)
    assert out["click"] == (2, 1, 30.0)


def test_dist10_pair_matches_unfused(spark):
    """The fused tagged-pass _dist10_pair must reproduce the old
    two-_dist10-join results exactly: same bucket math per (key, tag)
    group, NULL for a tag with no occurrences (callers coalesce)."""
    from pyspark.sql import functions as F

    from byconity_spark.udafs.attribution import _dist10, _dist10_pair

    partials = spark.createDataFrame(
        [
            # key a: times span 0..25 (gap 3), steps all zero/positive mix
            (1, "a", "", 2, 2, 1.0, [1, 11, 25], [1, 2]),
            (2, "a", "", 1, 1, 1.0, [0, 3], [0]),
            # key b: empty arrays -> absent from both dists (NULL after join)
            (3, "b", "", 1, 0, 0.0, [], []),
            # key c: only-zero values -> stats row exists, no slots -> "0|0|..."
            (4, "c", "", 1, 1, 1.0, [0], [0]),
        ],
        "user_id long, touch_event string, touch_attr string, "
        "click_cnt long, valid_cnt long, value double, "
        "times array<long>, steps array<long>",
    )
    keys = ["touch_event", "touch_attr"]
    occ_t = partials.select(*keys, F.explode("times").alias("t"))
    occ_s = partials.select(*keys, F.explode("steps").alias("s"))
    old = (
        partials.select(*keys).distinct()
        .join(_dist10(occ_t, keys, "t"), keys, "left")
        .join(_dist10(occ_s, keys, "s"), keys, "left")
    )
    new = partials.select(*keys).distinct().join(
        _dist10_pair(partials, keys), keys, "left"
    )
    old_rows = {tuple(r[:2]): tuple(r[2:]) for r in old.collect()}
    new_rows = {tuple(r[:2]): tuple(r[2:]) for r in new.collect()}
    assert old_rows == new_rows
    assert new_rows[("b", "")] == (None, None)
    assert new_rows[("c", "")] == (
        "0|0|0|0|0|0|0|0|0|0", "0|0|0|0|0|0|0|0|0|0"
    )
