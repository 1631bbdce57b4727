"""LBS geo-filter function family: inBusinessCircle(2), multiAddressFilter,
multiAddressMultiDistanceFilter — plus the tiny `replicate` array internal.

Reference semantics (src/Functions/greatCircleDistance.cpp:346-489,
src/Functions/addressFilter.cpp:37-300):

* ``inBusinessCircle(distance_m, lon, lat, lon_arr, lat_arr)`` — 1 when ANY
  (lon_arr[i], lat_arr[i]) point lies within ``distance_m`` metres of the
  (lon, lat) centre by haversine on the sphere R=6371007.180918475 m
  (greatCircleDistance.cpp:56 EARTH_RADIUS).  NULL points and points with
  out-of-range coordinates (|lon|>180, |lat|>90) are SKIPPED, never poison
  the row (greatCircleDistance.cpp:460-474).
* ``inBusinessCircle2(lon_arr, lat_arr, d1, lon1, lat1, ...)`` — same test
  against MULTIPLE circles, 1 if any point is in any circle
  (greatCircleDistance.cpp:491-495).
* ``multiAddressFilter(lon, lat, distance_m, p_lon1, p_lat1, ...)`` — the
  per-row scalar point against N constant centres sharing one radius.  The
  reference gate is (bbox at distance*sqrt(2)) AND (equirectangular squared
  distance <= distance^2) with R=6370996.81 and the LBS-platform bbox
  offset formula arc=6371393 m (addressFilter.cpp:38-65,136-163); we
  reproduce BOTH conditions so edge behaviour matches, not just the circle.
* ``multiAddressMultiDistanceFilter(lon, lat, d1, p_lon1, p_lat1, ...)`` —
  per-centre radii; an INNER bbox at distance (fully inscribed in the
  circle) short-circuits to 1 without the distance test, then the outer
  bbox + exact test runs (addressFilter.cpp:240-290).

All four are pure Column expressions (whole-stage codegen, no UDF): the
constant centres/distances are Python scalars — matching the reference,
which requires them to be ColumnConst — so the per-centre loop unrolls to
an OR-chain the optimizer folds.

``replicate(x, arr)`` (replicate.h:14) is the internal that broadcasts a
scalar into an array shaped like ``arr``: F.transform with a constant body.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# greatCircleDistance.cpp:56 — constexpr float EARTH_RADIUS (the CH mean
# Earth radius, used only by the business-circle family; the main
# greatCircleDistance registry entry keeps its documented 6371 km sphere)
_BC_EARTH_R_M = 6371007.180918475
# addressFilter.cpp:62-63 — LBS equirectangular radius
_LBS_R_M = 6370996.81
# addressFilter.cpp:40 — bbox offset arc radius
_LBS_ARC_M = 6371.393 * 1000.0


def _lit(x):
    return x if isinstance(x, Column) else F.lit(x)


def _haversine_bc_m(lon1, lat1, lon2, lat2) -> Column:
    """Haversine metres on the business-circle sphere (R=6371007.18 m)."""
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlam / 2), 2)
    return F.lit(2.0 * _BC_EARTH_R_M) * F.asin(F.sqrt(a))


def _any_point_in_circle(lon_arr: Column, lat_arr: Column,
                         dist, lon, lat) -> Column:
    """True when any (lon_arr[i], lat_arr[i]) is within ``dist`` metres of
    (lon, lat); NULL / out-of-range points skip (== contribute False)."""
    dist, lon, lat = _lit(dist), _lit(lon), _lit(lat)
    hits = F.zip_with(
        lon_arr.cast("array<double>"),
        lat_arr.cast("array<double>"),
        lambda lo, la: F.when(
            lo.isNotNull() & la.isNotNull()
            & (lo >= -180) & (lo <= 180) & (la >= -90) & (la <= 90),
            _haversine_bc_m(lon.cast("double"), lat.cast("double"), lo, la)
            <= dist.cast("double"),
        ).otherwise(F.lit(False)),
    )
    return F.coalesce(F.array_contains(hits, F.lit(True)), F.lit(False))


def in_business_circle(dist, lon, lat, lon_arr, lat_arr) -> Column:
    """inBusinessCircle(distance, lon, lat, lon_arr, lat_arr) -> UInt8."""
    return _any_point_in_circle(
        _lit(lon_arr), _lit(lat_arr), dist, lon, lat
    ).cast("int")


def in_business_circle2(lon_arr, lat_arr, *circle_args) -> Column:
    """inBusinessCircle2(lon_arr, lat_arr, d1, lon1, lat1, ...) -> UInt8."""
    if len(circle_args) < 3 or len(circle_args) % 3 != 0:
        raise ValueError(
            "inBusinessCircle2 needs 2 array args plus 3*n circle args "
            "(distance, lon, lat) — got %d extras" % len(circle_args)
        )
    lon_arr, lat_arr = _lit(lon_arr), _lit(lat_arr)
    out = None
    for i in range(0, len(circle_args), 3):
        d, lo, la = circle_args[i:i + 3]
        c = _any_point_in_circle(lon_arr, lat_arr, d, lo, la)
        out = c if out is None else (out | c)
    return out.cast("int")


def _lbs_dist_sq_m2(lon: Column, lat: Column, p_lon: float,
                    p_lat: float) -> Column:
    """addressFilter.cpp:53-65 distanceByLBSWithoutSqrt — squared metres via
    the equirectangular projection at the mean latitude."""
    lon_r, lat_r = F.radians(lon), F.radians(lat)
    dlon = F.lit(math.radians(p_lon)) - lon_r
    dlat = F.lit(math.radians(p_lat)) - lat_r
    b = (lat_r + F.lit(math.radians(p_lat))) / 2
    lx = dlon * F.lit(_LBS_R_M) * F.cos(b)
    ly = dlat * F.lit(_LBS_R_M)
    return lx * lx + ly * ly


def _lbs_bbox(p_lon: float, p_lat: float, dist_m: float
              ) -> tuple[float, float, float, float]:
    """addressFilter.cpp:38-45 longlatOffset corners at bearings 5pi/4 and
    pi/4: (lon_min, lat_min, lon_max, lat_max)."""
    def offset(alpha: float, dst: float) -> tuple[float, float]:
        lat_rad = math.radians(p_lat)
        lng = p_lon + dst * math.sin(alpha) / (
            _LBS_ARC_M * math.cos(lat_rad) * 2 * math.pi) * 360
        lat = p_lat + dst * math.cos(alpha) / (_LBS_ARC_M * 2 * math.pi) * 360
        return lng, lat

    lon_min, lat_min = offset(math.pi / 4 * 5, dist_m)
    lon_max, lat_max = offset(math.pi / 4, dist_m)
    return lon_min, lat_min, lon_max, lat_max


def multi_address_filter(lon, lat, dist, *centers) -> Column:
    """multiAddressFilter(lon, lat, distance, p_lon1, p_lat1, ...) -> UInt8.

    ``distance`` and the centre coordinates must be Python constants (the
    reference requires ColumnConst for them too)."""
    if len(centers) < 2 or len(centers) % 2 != 0:
        raise ValueError("multiAddressFilter needs pairs of centre coords")
    lon, lat = _lit(lon).cast("double"), _lit(lat).cast("double")
    dist = float(dist)
    d2 = dist * dist
    out = None
    for i in range(0, len(centers), 2):
        p_lon, p_lat = float(centers[i]), float(centers[i + 1])
        x0, y0, x1, y1 = _lbs_bbox(p_lon, p_lat, dist * math.sqrt(2))
        c = (
            (lon >= F.lit(x0)) & (lon <= F.lit(x1))
            & (lat >= F.lit(y0)) & (lat <= F.lit(y1))
            & (_lbs_dist_sq_m2(lon, lat, p_lon, p_lat) <= F.lit(d2))
        )
        out = c if out is None else (out | c)
    return F.coalesce(out, F.lit(False)).cast("int")


def multi_address_multi_distance_filter(lon, lat, *triples) -> Column:
    """multiAddressMultiDistanceFilter(lon, lat, d1, p_lon1, p_lat1, ...)
    -> UInt8.  Per-centre radii; inner inscribed bbox short-circuits."""
    if len(triples) < 3 or len(triples) % 3 != 0:
        raise ValueError(
            "multiAddressMultiDistanceFilter needs (distance, lon, lat) "
            "triples after the point columns"
        )
    lon, lat = _lit(lon).cast("double"), _lit(lat).cast("double")
    out = None
    for i in range(0, len(triples), 3):
        d = float(triples[i])
        p_lon, p_lat = float(triples[i + 1]), float(triples[i + 2])
        ox0, oy0, ox1, oy1 = _lbs_bbox(p_lon, p_lat, d * math.sqrt(2))
        ix0, iy0, ix1, iy1 = _lbs_bbox(p_lon, p_lat, d)
        inner = (
            (lon >= F.lit(ix0)) & (lon <= F.lit(ix1))
            & (lat >= F.lit(iy0)) & (lat <= F.lit(iy1))
        )
        outer = (
            (lon >= F.lit(ox0)) & (lon <= F.lit(ox1))
            & (lat >= F.lit(oy0)) & (lat <= F.lit(oy1))
            & (_lbs_dist_sq_m2(lon, lat, p_lon, p_lat) <= F.lit(d * d))
        )
        c = inner | outer
        out = c if out is None else (out | c)
    return F.coalesce(out, F.lit(False)).cast("int")


def install(SCALAR: dict) -> None:
    add = SCALAR.setdefault
    add("inBusinessCircle", in_business_circle)
    add("inBusinessCircle2", in_business_circle2)
    add("multiAddressFilter", multi_address_filter)
    add("multiAddressMultiDistanceFilter", multi_address_multi_distance_filter)
    # replicate.h:14 — broadcast a scalar into an array shaped like arr
    add("replicate", lambda x, arr: F.transform(
        _lit(arr), lambda _elem: _lit(x)))
