"""H3 index math / S2 cell-id math / geohash tail (functions/geo_index.py).

H3 anchors are the published spec examples: res-0 base-cell-0 is
'8001fffffffffff', the res-8 parent of '8928308280fffff' is
'8828308281fffff', and the 12 pentagon base cells.  S2 is validated by
roundtrips plus the neighbor-symmetry property (every cell is one of its
edge-neighbors' edge-neighbors), which exercises the Hilbert tables and
the cross-face wrap on both encode and decode paths.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from byconity_spark.functions import ch
from byconity_spark.functions import geo_index as G


def _val(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# ----------------------------------------------------------------- H3 bits

def test_h3_string_anchors(spark):
    h = _val(spark, ch("stringToH3", F.lit("8001fffffffffff")))
    assert h == 0x08001FFFFFFFFFFF
    assert _val(spark, ch("h3ToString", F.lit(h))) == "8001fffffffffff"
    assert _val(spark, ch("h3GetResolution", F.lit(h))) == 0
    assert _val(spark, ch("h3GetBaseCell", F.lit(h))) == 0
    assert _val(spark, ch("h3IsValid", F.lit(h)))
    assert _val(spark, ch("stringToH3", F.lit("not-hex"))) == 0


def test_h3_parent_anchor(spark):
    child = _val(spark, ch("stringToH3", F.lit("8928308280fffff")))
    parent = _val(spark, ch("h3ToString", ch("h3ToParent", F.lit(child), 8)))
    assert parent == "8828308281fffff"
    # parent of the parent chain terminates at the base cell
    res0 = _val(spark, ch("h3ToParent", F.lit(child), 0))
    assert _val(spark, ch("h3GetResolution", F.lit(res0))) == 0
    assert _val(spark, ch("h3GetBaseCell", F.lit(res0))) == \
        _val(spark, ch("h3GetBaseCell", F.lit(child)))


def test_h3_validity_rejections(spark):
    good = G._h3_index(20, 5, (1, 2, 3, 4, 5))
    assert _val(spark, ch("h3IsValid", F.lit(good)))
    # digit 7 inside the resolved range
    bad_digit = G._h3_index(20, 5, (1, 7, 3, 4, 5))
    assert not _val(spark, ch("h3IsValid", F.lit(bad_digit)))
    # unused digit not 7
    bad_pad = good & ~(7 << 12)
    assert not _val(spark, ch("h3IsValid", F.lit(bad_pad)))
    # wrong mode
    assert not _val(spark, ch("h3IsValid", F.lit(good ^ (3 << 59))))
    # base cell out of range
    assert not _val(spark, ch("h3IsValid", F.lit(G._h3_index(122, 0))))
    # pentagon with leading K digit
    pent_k = G._h3_index(4, 2, (0, 1))
    assert not _val(spark, ch("h3IsValid", F.lit(pent_k)))
    assert _val(spark, ch("h3IsValid", F.lit(G._h3_index(4, 2, (0, 2)))))


def test_h3_pentagons(spark):
    assert _val(spark, ch("h3IsPentagon",
                          ch("stringToH3", F.lit("8009fffffffffff"))))
    assert not _val(spark, ch("h3IsPentagon",
                              ch("stringToH3", F.lit("8001fffffffffff"))))
    pents = _val(spark, ch("h3GetPentagonIndexes", 3))
    assert len(pents) == 12
    for p in pents:
        assert _val(spark, ch("h3IsPentagon", F.lit(p)))
        assert _val(spark, ch("h3GetResolution", F.lit(p))) == 3


def test_h3_res0_and_counts(spark):
    res0 = _val(spark, ch("h3GetRes0Indexes"))
    assert len(res0) == 122
    assert res0[0] == 0x08001FFFFFFFFFFF
    assert _val(spark, ch("h3NumHexagons", F.lit(0))) == 122
    assert _val(spark, ch("h3NumHexagons", F.lit(2))) == 2 + 120 * 49
    assert _val(spark, ch("h3IsResClassIII", F.lit(G._h3_index(20, 5))))
    assert not _val(spark, ch("h3IsResClassIII", F.lit(G._h3_index(20, 4))))


def test_h3_children(spark):
    hexagon = G._h3_index(20, 1, (3,))
    kids = _val(spark, ch("h3ToChildren", F.lit(hexagon), 2))
    assert len(kids) == 7
    for i, k in enumerate(kids):
        assert _val(spark, ch("h3IsValid", F.lit(k)))
        assert _val(spark, ch("h3ToParent", F.lit(k), 1)) == hexagon
        assert (k & (7 << 39)) == (i << 39)  # depth-first digit order
    pent = G._h3_index(4, 0)
    pkids = _val(spark, ch("h3ToChildren", F.lit(pent), 1))
    assert len(pkids) == 6  # K child deleted
    grand = _val(spark, ch("h3ToChildren", F.lit(pent), 2))
    assert len(grand) == 6 * 7 - 1  # 41: center child is again a pentagon
    # identity when child_res == res
    assert _val(spark, ch("h3ToChildren", F.lit(hexagon), 1)) == [hexagon]
    center = _val(spark, ch("h3ToCenterChild", F.lit(hexagon), 4))
    assert _val(spark, ch("h3GetResolution", F.lit(center))) == 4
    assert _val(spark, ch("h3ToParent", F.lit(center), 1)) == hexagon


def test_h3_edges(spark):
    hexagon = G._h3_index(20, 2, (3, 5))
    edges = _val(spark, ch("h3GetUnidirectionalEdgesFromHexagon",
                           F.lit(hexagon)))
    assert len(edges) == 6
    for e in edges:
        assert _val(spark, ch("h3UnidirectionalEdgeIsValid", F.lit(e)))
        assert _val(spark, ch(
            "h3GetOriginIndexFromUnidirectionalEdge", F.lit(e))) == hexagon
    pent = G._h3_index(4, 1)
    pedges = _val(spark, ch("h3GetUnidirectionalEdgesFromHexagon",
                            F.lit(pent)))
    assert len(pedges) == 5
    assert not _val(spark, ch("h3UnidirectionalEdgeIsValid", F.lit(hexagon)))


def test_h3_areas_and_dist(spark):
    a0 = _val(spark, ch("h3HexAreaKm2", F.lit(0)))
    assert a0 == pytest.approx(4250546.848, rel=1e-6)  # v3 closed form
    a1 = _val(spark, ch("h3HexAreaKm2", F.lit(1)))
    assert a1 == pytest.approx(a0 / 7.0)
    assert _val(spark, ch("h3HexAreaM2", F.lit(0))) == pytest.approx(a0 * 1e6)
    d = _val(spark, ch("h3PointDistKm", F.lit(0.0), F.lit(0.0),
                       F.lit(0.0), F.lit(90.0)))
    assert d == pytest.approx(6371.007180918475 * math.pi / 2, rel=1e-9)
    assert _val(spark, ch("h3PointDistRads", F.lit(0.0), F.lit(0.0),
                          F.lit(0.0), F.lit(90.0))) == \
        pytest.approx(math.pi / 2, rel=1e-9)


# ----------------------------------------------------------------- S2 core

_PTS = [
    (0.0, 0.0), (10.5, 47.3), (-122.41, 37.77), (139.69, 35.69),
    (-0.1, 51.5), (151.2, -33.87), (-58.4, -34.6), (18.4, -33.9),
    (179.9, 0.1), (-179.9, -0.1), (0.1, 89.9), (-0.1, -89.9),
    (45.0, 45.0), (-45.0, 45.0), (135.0, -45.0), (90.0, 0.0),
]


def _pts_df(spark):
    return spark.createDataFrame(_PTS, "lon double, lat double")


def test_s2_roundtrip(spark):
    rows = _pts_df(spark).select(
        "lon", "lat",
        ch("geoToS2", F.col("lon"), F.col("lat")).alias("id"),
    ).select(
        "lon", "lat", "id", ch("s2ToGeo", F.col("id")).alias("g")
    ).collect()
    for r in rows:
        # a leaf cell is ~1 cm; longitude degrees shrink by cos(lat), so
        # compare physical offsets, not raw degrees
        coslat = max(math.cos(math.radians(r["lat"])), 1e-12)
        assert (r["g"]["lon"] - r["lon"]) * coslat == pytest.approx(0, abs=1e-6)
        assert r["g"]["lat"] == pytest.approx(r["lat"], abs=1e-6)
        assert bool(G._s2_is_valid(np.array([r["id"]]).view(np.uint64))[0])


def test_s2_neighbor_symmetry(spark):
    # every cell appears among its neighbors' neighbors — this breaks if
    # any Hilbert table entry or the cross-face wrap is wrong
    ids = [int(x) for x in np.asarray(
        _pts_df(spark).select(
            ch("geoToS2", F.col("lon"), F.col("lat")).alias("id")
        ).toPandas()["id"]
    )]
    # include coarser cells (level 10) to cross faces more often
    lev = np.full(len(ids), 10, dtype=np.int64)
    coarse = [int(x) for x in
              G._s2_parent_at(np.array(ids).view(np.uint64),
                              lev).view(np.int64)]
    df = spark.createDataFrame([(i,) for i in ids + coarse], "id long")
    rows = df.select(
        "id", ch("s2GetNeighbors", F.col("id")).alias("ns")
    ).collect()
    nmap = {}
    for r in rows:
        assert len(set(r["ns"])) == 4
        nmap[r["id"]] = r["ns"]
    back = df.select(
        F.explode(ch("s2GetNeighbors", F.col("id"))).alias("n"),
        F.col("id"),
    ).select(
        "id", "n", ch("s2GetNeighbors", F.col("n")).alias("nn")
    ).collect()
    for r in back:
        assert r["id"] in list(r["nn"]), (
            f"neighbor symmetry broken for {r['id']:x} -> {r['n']:x}"
        )


def test_s2_cells_intersect(spark):
    a = _val(spark, ch("geoToS2", F.lit(10.0), F.lit(50.0)))
    b = _val(spark, ch("geoToS2", F.lit(10.1), F.lit(50.0)))
    parent = int(G._s2_parent_at(
        np.array([a]).view(np.uint64), np.array([5])).view(np.int64)[0])
    assert _val(spark, ch("s2CellsIntersect", F.lit(a), F.lit(a)))
    assert _val(spark, ch("s2CellsIntersect", F.lit(a), F.lit(parent)))
    assert not _val(spark, ch("s2CellsIntersect", F.lit(a), F.lit(b)))


def test_s2_caps(spark):
    center = _val(spark, ch("geoToS2", F.lit(0.0), F.lit(0.0)))
    near = _val(spark, ch("geoToS2", F.lit(1.0), F.lit(0.0)))
    far = _val(spark, ch("geoToS2", F.lit(20.0), F.lit(0.0)))
    assert _val(spark, ch("s2CapContains", F.lit(center), F.lit(2.0),
                          F.lit(near)))
    assert not _val(spark, ch("s2CapContains", F.lit(center), F.lit(2.0),
                              F.lit(far)))
    u = _val(spark, ch("s2CapUnion", F.lit(center), F.lit(1.0),
                       F.lit(far), F.lit(1.0)))
    assert _val(spark, ch("s2CapContains", F.lit(u["center"]),
                          F.lit(u["radius"]), F.lit(near)))
    assert _val(spark, ch("s2CapContains", F.lit(u["center"]),
                          F.lit(u["radius"]), F.lit(far)))
    # containment case returns the bigger cap unchanged
    u2 = _val(spark, ch("s2CapUnion", F.lit(center), F.lit(30.0),
                        F.lit(near), F.lit(1.0)))
    assert u2["center"] == center and u2["radius"] == pytest.approx(30.0)


def test_s2_rects(spark):
    lo = _val(spark, ch("geoToS2", F.lit(10.0), F.lit(40.0)))
    hi = _val(spark, ch("geoToS2", F.lit(20.0), F.lit(50.0)))
    inside = _val(spark, ch("geoToS2", F.lit(15.0), F.lit(45.0)))
    outside = _val(spark, ch("geoToS2", F.lit(30.0), F.lit(45.0)))
    assert _val(spark, ch("s2RectContains", F.lit(lo), F.lit(hi),
                          F.lit(inside)))
    assert not _val(spark, ch("s2RectContains", F.lit(lo), F.lit(hi),
                              F.lit(outside)))
    grown = _val(spark, ch("s2RectAdd", F.lit(lo), F.lit(hi), F.lit(outside)))
    assert _val(spark, ch("s2RectContains", F.lit(grown["lo"]),
                          F.lit(grown["hi"]), F.lit(outside)))
    lo2 = _val(spark, ch("geoToS2", F.lit(15.0), F.lit(42.0)))
    hi2 = _val(spark, ch("geoToS2", F.lit(35.0), F.lit(55.0)))
    un = _val(spark, ch("s2RectUnion", F.lit(lo), F.lit(hi),
                        F.lit(lo2), F.lit(hi2)))
    assert _val(spark, ch("s2RectContains", F.lit(un["lo"]),
                          F.lit(un["hi"]), F.lit(outside)))
    ix = _val(spark, ch("s2RectIntersection", F.lit(lo), F.lit(hi),
                        F.lit(lo2), F.lit(hi2)))
    mid = _val(spark, ch("geoToS2", F.lit(17.0), F.lit(45.0)))
    assert _val(spark, ch("s2RectContains", F.lit(ix["lo"]),
                          F.lit(ix["hi"]), F.lit(mid)))
    west = _val(spark, ch("geoToS2", F.lit(11.0), F.lit(45.0)))
    assert not _val(spark, ch("s2RectContains", F.lit(ix["lo"]),
                              F.lit(ix["hi"]), F.lit(west)))
    # antimeridian wrap: a rect spanning 179 -> -179 contains 180
    wlo = _val(spark, ch("geoToS2", F.lit(179.0), F.lit(0.0)))
    whi = _val(spark, ch("geoToS2", F.lit(-179.0), F.lit(1.0)))
    at180 = _val(spark, ch("geoToS2", F.lit(179.99), F.lit(0.5)))
    at0 = _val(spark, ch("geoToS2", F.lit(0.0), F.lit(0.5)))
    assert _val(spark, ch("s2RectContains", F.lit(wlo), F.lit(whi),
                          F.lit(at180)))
    assert not _val(spark, ch("s2RectContains", F.lit(wlo), F.lit(whi),
                              F.lit(at0)))


# ----------------------------------------------------------------- geohash

def test_geohash_decode_roundtrip(spark):
    df = _pts_df(spark).select(
        "lon", "lat",
        ch("geohashDecode",
           ch("geohashEncode", F.col("lon"), F.col("lat"), 12)).alias("d"),
    )
    for r in df.collect():
        assert r["d"]["lon"] == pytest.approx(r["lon"], abs=1e-6)
        assert r["d"]["lat"] == pytest.approx(r["lat"], abs=1e-6)


def test_geohashes_in_box(spark):
    boxes = _val(spark, ch("geohashesInBox", F.lit(10.0), F.lit(50.0),
                           F.lit(10.4), F.lit(50.2), 3))
    assert len(boxes) > 0
    assert all(len(b) == 3 for b in boxes)
    assert len(set(boxes)) == len(boxes)
    # the box corners themselves decode into covered cells
    enc = _val(spark, ch("geohashEncode", F.lit(10.05), F.lit(50.05), 3))
    assert enc in boxes
    # degenerate box -> single cell; inverted box -> empty
    one = _val(spark, ch("geohashesInBox", F.lit(10.0), F.lit(50.0),
                         F.lit(10.0), F.lit(50.0), 3))
    assert len(one) == 1
    empty = _val(spark, ch("geohashesInBox", F.lit(11.0), F.lit(50.0),
                           F.lit(10.0), F.lit(50.0), 3))
    assert empty == []


# ------------------------------------------------------- LBS geo filters

def test_in_business_circle_skips_invalid_points(spark):
    # point 1 is ~0 m from the centre; points 2/3 are NULL / out-of-range
    # and must be skipped, not poison the row (greatCircleDistance.cpp:460)
    arr_lon = F.array(F.lit(2.35), F.lit(None).cast("double"), F.lit(200.0))
    arr_lat = F.array(F.lit(48.85), F.lit(10.0), F.lit(95.0))
    assert _val(spark, ch("inBusinessCircle", 1000.0, 2.35, 48.85,
                          arr_lon, arr_lat)) == 1
    # only invalid points -> 0, never NULL
    bad_lon = F.array(F.lit(None).cast("double"), F.lit(200.0))
    bad_lat = F.array(F.lit(10.0), F.lit(95.0))
    assert _val(spark, ch("inBusinessCircle", 1e9, 2.35, 48.85,
                          bad_lon, bad_lat)) == 0


def test_in_business_circle2_any_circle(spark):
    arr_lon = F.array(F.lit(-74.0))
    arr_lat = F.array(F.lit(40.7))
    # not in the Paris circle, in the NYC circle
    assert _val(spark, ch("inBusinessCircle2", arr_lon, arr_lat,
                          1000.0, 2.35, 48.85, 1000.0, -74.0, 40.7)) == 1
    assert _val(spark, ch("inBusinessCircle2", arr_lon, arr_lat,
                          1000.0, 2.35, 48.85)) == 0


def test_multi_address_filter_inner_shortcut(spark):
    # dead-centre point passes both filters; antipode passes neither
    assert _val(spark, ch("multiAddressFilter", F.lit(2.35), F.lit(48.85),
                          5000.0, 2.35, 48.85)) == 1
    assert _val(spark, ch("multiAddressFilter", F.lit(-177.0), F.lit(-48.0),
                          5000.0, 2.35, 48.85)) == 0
    assert _val(spark, ch("multiAddressMultiDistanceFilter",
                          F.lit(2.35), F.lit(48.85),
                          5000.0, 2.35, 48.85, 100.0, 139.69, 35.68)) == 1
    assert _val(spark, ch("multiAddressMultiDistanceFilter",
                          F.lit(-177.0), F.lit(-48.0),
                          5000.0, 2.35, 48.85, 100.0, 139.69, 35.68)) == 0


def test_replicate_shapes_like_array(spark):
    out = _val(spark, ch("replicate", F.lit(7),
                         F.array(F.lit(1), F.lit(2), F.lit(3))))
    assert out == [7, 7, 7]


def test_nested_zips_named_structs(spark):
    out = _val(spark, ch("nested", ["k", "v"],
                         F.array(F.lit("a"), F.lit("b")),
                         F.array(F.lit(1), F.lit(2))))
    assert [r.asDict() for r in out] == [
        {"k": "a", "v": 1}, {"k": "b", "v": 2}]
    empty = _val(spark, ch("nested", ["k"],
                           F.slice(F.array(F.lit(1)), 1, 0)))
    assert empty == []
