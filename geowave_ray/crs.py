"""Declared-CRS adapter layer (minimal CRS path — VERDICT r2 #9).

The reference reprojects any feature schema to the index CRS at the
adapter (``extensions/adapters/vector/.../FeatureDataAdapter.java:114-116``)
and runs custom-CRS stores end-to-end
(``test/.../basic/GeoWaveCustomCRSSpatialVectorIT.java:85-175``). This
module does the same for the one non-4326 CRS expressible without geo
libs: EPSG:3857 (web mercator, closed-form transform pair in
``geom.py``).

Contract: data rows KEEP their native CRS coordinates on disk; only
the spatial INDEX (cell ids / partition buckets) lives in EPSG:4326.
Queries arrive in 4326; partition pruning uses the 4326 cell ranges
(with an epsilon pad — the native→4326 round trip can move a point by
an ulp, so the bucket cover is padded to stay a superset); the exact
fine filter runs in NATIVE coordinates against the forward-transformed
query box (web mercator is monotone per axis, so a 4326 box maps to an
exact native box — no per-point inverse transform on the filter path).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .geom import from_web_mercator, to_web_mercator
from .sfc import MAX_TIER
from .stages.cell_encode import bucket_of, encode_points

# mercator-valid latitude band; the forward transform clamps outside it
MERCATOR_MAX_LAT = 85.05112878


class CrsAdapter:
    """Transform pair between a declared native CRS and the EPSG:4326
    index CRS. ``to_index`` native→4326 (for cell encoding),
    ``from_index`` 4326→native (for pushing query geometry down to the
    native fine filter).

    Supported without geo libs (all closed-form): ``EPSG:4326``,
    ``EPSG:3857`` (web mercator), and the 120 WGS84 UTM zones
    ``EPSG:326NN`` (north) / ``EPSG:327NN`` (south) via the Krüger
    transverse-Mercator series (``utm.py``, VERDICT r3 #8). NOTE: UTM
    is NOT axis-monotone, so ``native_box`` is inexact for it — UTM
    fine filters inverse-transform points and test in 4326 instead."""

    def __init__(self, crs: str):
        self.utm_zone = 0
        self.utm_south = False
        self.proj = None
        if crs.startswith("+proj="):
            # parameter-defined CRS (lcc/tmerc/merc/longlat) — the
            # GeoTools arbitrary-CRS role without enumerated codes
            from .proj import ProjCRS

            self.proj = ProjCRS(crs)
        elif crs.startswith("EPSG:326") or crs.startswith("EPSG:327"):
            code = int(crs[5:])
            zone = code % 100
            if not 1 <= zone <= 60:
                raise ValueError(f"bad UTM zone in {crs!r}")
            self.utm_zone = zone
            self.utm_south = code // 100 == 327
        elif crs not in ("EPSG:4326", "EPSG:3857"):
            raise ValueError(
                f"unsupported CRS {crs!r} (use EPSG:4326/3857, UTM "
                f"EPSG:326NN/327NN, or a '+proj=...' parameter string)"
            )
        self.crs = crs

    def to_index(self, x: np.ndarray, y: np.ndarray):
        if self.proj is not None:
            return self.proj.inverse(x, y)
        if self.crs == "EPSG:4326":
            return x, y
        if self.utm_zone:
            from .utm import utm_to_geodetic

            return utm_to_geodetic(x, y, self.utm_zone, self.utm_south)
        return from_web_mercator(x, y)

    def from_index(self, lon: np.ndarray, lat: np.ndarray):
        if self.proj is not None:
            return self.proj.forward(lon, lat)
        if self.crs == "EPSG:4326":
            return lon, lat
        if self.utm_zone:
            from .utm import geodetic_to_utm

            return geodetic_to_utm(lon, lat, self.utm_zone, self.utm_south)
        return to_web_mercator(lon, lat)


def ingest_xy_crs(
    ds: ray.data.Dataset,
    out_dir: str,
    crs: str,
    x_col: str = "x",
    y_col: str = "y",
    tier: int = MAX_TIER,
    n_buckets: int = 64,
) -> None:
    """Ingest a native-CRS point table into the cell-bucket layout:
    the adapter reprojects to 4326 ONLY for the cell encode; stored
    rows keep native coordinates. Layout matches ``ingest_pages``
    (``cell_bucket=NN`` dirs, rows sorted by cell_id) so the pruned
    readers work unchanged."""
    adapter = CrsAdapter(crs)

    def encode(b: pa.Table) -> pa.Table:
        lon, lat = adapter.to_index(
            b.column(x_col).to_numpy(), b.column(y_col).to_numpy()
        )
        b = b.append_column("lon", pa.array(lon, pa.float64()))
        b = b.append_column("lat", pa.array(lat, pa.float64()))
        b = encode_points(b, tier=tier)
        bucket = bucket_of(b.column("cell_id").to_numpy(), tier, n_buckets)
        b = b.append_column("cell_bucket", pa.array(bucket, pa.int64()))
        # index coords are DERIVED — drop them; native x/y are the data
        return b.drop_columns(["lon", "lat", "tier", "cell_x", "cell_y"])

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    (
        ds.map_batches(encode, batch_format="pyarrow", batch_size=None)
        .groupby("cell_bucket")
        .map_groups(lambda t: t.sort_by("cell_id"), batch_format="pyarrow")
        .write_parquet(tmp, partition_cols=["cell_bucket"])
    )
    os.replace(tmp, out_dir)


def read_crs_pruned(
    store_root: str,
    crs: str,
    boxes4326,
    columns=None,
    tier: int = MAX_TIER,
    n_buckets: int = 64,
    pad: float = 1e-6,
) -> ray.data.Dataset:
    """Pruned read of a native-CRS store for a batch of EPSG:4326
    bboxes: bucket pruning in index space (padded by ``pad`` degrees —
    the round-tripped index position of a point may differ from its
    true 4326 position by an ulp, so the cover stays a superset); NO
    fine filter applied here (callers filter in native space)."""
    from .pipelines.query import buckets_for_bbox

    union: set[int] = set()
    for (x0, y0, x1, y1) in boxes4326:
        union |= buckets_for_bbox(
            x0 - pad, y0 - pad, x1 + pad, y1 + pad, tier=tier, n_buckets=n_buckets
        )
        if len(union) >= n_buckets:
            break
    keep = [
        f
        for b in sorted(union)
        for f in sorted(
            glob.glob(os.path.join(store_root, f"cell_bucket={b}", "*.parquet"))
        )
    ]
    return ray.data.read_parquet(keep, columns=columns)


def native_box(crs: str, x0: float, y0: float, x1: float, y1: float):
    """Forward-transform a 4326 query box to the native CRS (exact for
    axis-monotone transforms like web mercator)."""
    a = CrsAdapter(crs)
    bx, by = a.from_index(np.array([x0, x1]), np.array([y0, y1]))
    return float(bx[0]), float(by[0]), float(bx[1]), float(by[1])
