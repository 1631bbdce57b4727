"""Reference-exact greatCircleDistance / greatCircleAngle / geoDistance.

The reference does NOT use plain haversine: src/Functions/
greatCircleDistance.cpp (sphinxsearch-derived, Apache-2.0) interpolates
float32 lookup tables — a tangent-plane metric when the longitude
difference is under 13 degrees and LUT-trig haversine beyond — so its
outputs differ from textbook formulas in the 4th-5th significant digit
(00362 golden: 343407, haversine gives 343320).  This is a behavioral
reimplementation of that algorithm with numpy float32 staging matching
the C float expressions step for step.

Scale notes: vectorized numpy over Arrow batches — one pandas UDF per
column, no per-row Python.
"""

from __future__ import annotations

import numpy as np

_PI = 3.14159265358979323846
_COS_LUT_SIZE = 1024
_ASIN_SQRT_LUT_SIZE = 512
_METRIC_LUT_SIZE = 1024
_EARTH_RADIUS = np.float32(6371007.180918475)
_EARTH_DIAMETER = np.float32(2 * 6371007.180918475)
_RAD_IN_DEG = np.float32(_PI / 180.0)
_RAD_IN_DEG_HALF = np.float32(_PI / 360.0)

# LUTs: double-computed, cast to float32 (geodistInit)
_COS_LUT = np.cos(
    2 * _PI * np.arange(_COS_LUT_SIZE + 1) / _COS_LUT_SIZE
).astype(np.float32)
_ASIN_SQRT_LUT = np.arcsin(
    np.sqrt(np.arange(_ASIN_SQRT_LUT_SIZE + 1) / _ASIN_SQRT_LUT_SIZE)
).astype(np.float32)
_LAT = np.arange(_METRIC_LUT_SIZE + 1) * (_PI / _METRIC_LUT_SIZE) - _PI * 0.5
_WGS84_K_LAT = (
    (111132.09 - 566.05 * np.cos(2 * _LAT) + 1.20 * np.cos(4 * _LAT)) ** 2
).astype(np.float32)
_WGS84_K_LON = (
    (111415.13 * np.cos(_LAT) - 94.55 * np.cos(3 * _LAT)
     + 0.12 * np.cos(5 * _LAT)) ** 2
).astype(np.float32)
_SPHERE_METERS = (
    ((float(_EARTH_DIAMETER) * _PI / 360) * np.cos(_LAT)) ** 2
).astype(np.float32)
# sqrf(cosf(latitude)): float32 cos of the double latitude, squared f32
_SPHERE_DEG = np.square(np.cos(_LAT).astype(np.float32))


def _deg_diff(f):
    f = np.abs(f)
    return np.where(f > np.float32(180), np.float32(360) - f, f)


def _fast_cos(x):
    # float y = fabsf(x) * (COS_LUT_SIZE / PI / 2)  (double constant)
    y = (np.abs(x).astype(np.float64)
         * (_COS_LUT_SIZE / _PI / 2)).astype(np.float32)
    i = y.astype(np.int64)
    y = y - i.astype(np.float32)
    i = i & (_COS_LUT_SIZE - 1)
    return _COS_LUT[i] + (_COS_LUT[i + 1] - _COS_LUT[i]) * y


def _fast_sin(x):
    y = (np.abs(x).astype(np.float64)
         * (_COS_LUT_SIZE / _PI / 2)).astype(np.float32)
    i = y.astype(np.int64)
    y = y - i.astype(np.float32)
    i = (i - _COS_LUT_SIZE // 4) & (_COS_LUT_SIZE - 1)
    return _COS_LUT[i] + (_COS_LUT[i + 1] - _COS_LUT[i]) * y


def _fast_asin_sqrt(x):
    x = x.astype(np.float32)
    # Taylor branch (x < 0.122)
    y = np.sqrt(x, dtype=np.float32)
    taylor = (y + x * y * np.float32(0.166666666666666)
              + x * x * y * np.float32(0.075)
              + x * x * x * y * np.float32(0.044642857142857))
    # LUT branch (x < 0.948)
    xs = x * np.float32(_ASIN_SQRT_LUT_SIZE)
    i = np.clip(xs.astype(np.int64), 0, _ASIN_SQRT_LUT_SIZE - 1)
    lut = (_ASIN_SQRT_LUT[i]
           + (_ASIN_SQRT_LUT[i + 1] - _ASIN_SQRT_LUT[i])
           * (xs - i.astype(np.float32)))
    exact = np.arcsin(np.sqrt(x, dtype=np.float32), dtype=np.float32)
    return np.where(
        x < np.float32(0.122), taylor,
        np.where(x < np.float32(0.948), lut, exact),
    ).astype(np.float32)


def geodist(lon1, lat1, lon2, lat2, method: str):
    """method: 'degrees' | 'meters' | 'wgs84' — float32 result array."""
    f32 = np.float32
    lon1 = np.asarray(lon1, dtype=f32)
    lat1 = np.asarray(lat1, dtype=f32)
    lon2 = np.asarray(lon2, dtype=f32)
    lat2 = np.asarray(lat2, dtype=f32)
    lat_diff = _deg_diff(lat1 - lat2).astype(f32)
    lon_diff = _deg_diff(lon1 - lon2).astype(f32)

    # tangent-plane branch (lon_diff < 13)
    mid = ((lat1 + lat2 + f32(180)) * f32(_METRIC_LUT_SIZE)
           / f32(360)).astype(f32)
    mi = mid.astype(np.int64) & (_METRIC_LUT_SIZE - 1)
    frac = mid - mi.astype(f32)
    if method == "degrees":
        k_lat = f32(1)
        k_lon = (_SPHERE_DEG[mi]
                 + (_SPHERE_DEG[mi + 1] - _SPHERE_DEG[mi]) * frac)
    elif method == "meters":
        k_lat = f32(
            (float(_EARTH_DIAMETER) * _PI / 360)
            * (float(_EARTH_DIAMETER) * _PI / 360)
        )
        k_lon = (_SPHERE_METERS[mi]
                 + (_SPHERE_METERS[mi + 1] - _SPHERE_METERS[mi]) * frac)
    else:
        k_lat = (_WGS84_K_LAT[mi]
                 + (_WGS84_K_LAT[mi + 1] - _WGS84_K_LAT[mi]) * frac)
        k_lon = (_WGS84_K_LON[mi]
                 + (_WGS84_K_LON[mi + 1] - _WGS84_K_LON[mi]) * frac)
    near = np.sqrt(
        k_lat * lat_diff * lat_diff + k_lon * lon_diff * lon_diff,
        dtype=f32,
    )

    # haversine branch
    a = (np.square(_fast_sin(lat_diff * _RAD_IN_DEG_HALF))
         + _fast_cos(lat1 * _RAD_IN_DEG) * _fast_cos(lat2 * _RAD_IN_DEG)
         * np.square(_fast_sin(lon_diff * _RAD_IN_DEG_HALF))).astype(f32)
    if method == "degrees":
        far = ((360.0 / _PI)
               * _fast_asin_sqrt(a).astype(np.float64)).astype(f32)
    else:
        far = (_EARTH_DIAMETER * _fast_asin_sqrt(a)).astype(f32)

    return np.where(lon_diff < f32(13), near, far).astype(f32)


def sql_kernels() -> dict:
    """pandas-UDF kernels for ensure_sql_kernels registration."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def make(method: str):
        def k(lon1, lat1, lon2, lat2):
            return pd.Series(geodist(
                lon1.to_numpy(np.float64), lat1.to_numpy(np.float64),
                lon2.to_numpy(np.float64), lat2.to_numpy(np.float64),
                method,
            ))
        return pandas_udf(k, "float")

    return {
        "chGreatCircleDistance": make("meters"),
        "chGreatCircleAngle": make("degrees"),
        "chGeoDistance": make("wgs84"),
    }
