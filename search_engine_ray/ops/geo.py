"""Geo-spatial query operators (the ES geo_distance / geo_grid
family) over plain lat/lon double columns.

Scale shape: the radius search is a pure streaming filter — a
latitude BOUNDING-BAND prefilter (cheap comparisons; great-circle
distance is lower-bounded by the pure-latitude separation, so the
band never drops a true hit) cuts the candidate set before the
trigonometric haversine runs, and only matching rows leave the map
stage. The grid aggregation is a bounded combiner (cells, not rows,
ride the shuffle) — the geo analog of the value-facet counters.

Float discipline: haversine op order is pinned
(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2), d = 2R·asin(√a), R = 6371.0 km)
so the SQL oracle replays it term for term; distances round half-up
to 4 only at the output edge, ranking uses the raw double.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from search_engine_ray.ops.rounding import round_half_up

_R_KM = 6371.0
# 1° of latitude is >= 110.574 km; dividing by 110.0 over-widens the
# band slightly, so the prefilter is conservative (never drops a hit)
_KM_PER_LAT_DEG_FLOOR = 110.0


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float
) -> np.ndarray:
    """Vectorized great-circle distance (km) to a fixed origin, pinned
    op order (matches the SQL oracles literally)."""
    p1 = np.radians(lat1)
    p2 = np.radians(lat2)
    dphi = np.radians(lat2 - lat1)
    dlmb = np.radians(lon2 - lon1)
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * _R_KM * np.arcsin(np.sqrt(a))


def geo_radius(
    ds: Dataset,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    radius_km: float,
    keep: list[str],
) -> Dataset:
    """ES geo_distance query: rows within radius_km of the origin,
    with a `distance_km` column (rounded half-up to 4) appended.
    Latitude-band prefilter first — exactness preserved (see module
    docstring), trig only on the surviving band."""
    band = radius_km / _KM_PER_LAT_DEG_FLOOR

    def _f(t: pa.Table) -> pa.Table:
        lat = t[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pre = np.abs(lat - origin_lat) <= band
        out_cols = {c: t[c].filter(pa.array(pre)) for c in keep}
        lat = lat[pre]
        lon = t[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)[pre]
        d = haversine_km(lat, lon, origin_lat, origin_lon)
        hit = d <= radius_km
        out = pa.table({c: a.filter(pa.array(hit)) for c, a in out_cols.items()})
        return out.append_column(
            "distance_km", pa.array(round_half_up(d[hit]), pa.float64())
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def geo_grid_counts(
    ds: Dataset, lat_col: str, lon_col: str, cell_deg: float
) -> Dataset:
    """ES geohash_grid-style aggregation on an integer degree grid:
    cell = (floor(lat/cell_deg), floor(lon/cell_deg)), count per cell.
    Per-block combiner emits at most (180/cell)·(360/cell) rows; the
    exchange moves cells, never rows."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        lat = t[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cy = np.floor(lat / cell_deg).astype(np.int64)
        cx = np.floor(lon / cell_deg).astype(np.int64)
        # +50_000 offset keeps both axes non-negative so the packed
        # key's divmod decode is exact for negative cells
        key = (cy + 50_000) * 100_000 + (cx + 50_000)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cell_lat": pa.array(uk // 100_000 - 50_000, pa.int64()),
            "cell_lon": pa.array(uk % 100_000 - 50_000, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["cell_lat", "cell_lon"])
        .aggregate(Sum("cnt", alias_name="n"))
    )
