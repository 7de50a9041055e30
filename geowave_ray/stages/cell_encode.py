"""Cell-encoding ``map_batches`` stages.

The analogue of the reference's insertion-id computation
(``core/index/.../sfc/tiered/TieredSFCIndexStrategy.java:167-210``):
each record gets (tier, cell_id) columns. Points always land on one
cell at the requested tier (pure numpy, zero-copy Arrow in/out);
extents land on the finest tier where their bbox covers at most
``max_cells_per_dim`` cells per dimension and are duplicated across
the covering cells (batch expansion — the reference's InsertionIds
duplication, deduped downstream by natural-cell emission).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sfc import (
    MAX_TIER,
    grid_coords,
    hilbert_encode,
    morton_encode,
    tier_for_bbox,
)


def bucket_of(cell_id: np.ndarray, tier: int, n_buckets: int) -> np.ndarray:
    """THE partition-bucket rule (single definition — ingest, writer
    appends, declared-CRS ingest and store copies must all agree or
    pruned reads silently miss data): top 8 bits of the cell id at
    this tier, mod ``n_buckets``."""
    shift = np.uint64(max(0, 2 * tier - 8))
    return (
        (cell_id.astype(np.uint64) >> shift) % np.uint64(n_buckets)
    ).astype(np.int64)


def encode_points(
    batch: pa.Table,
    tier: int = MAX_TIER,
    curve: str = "morton",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> pa.Table:
    """Append tier/cell_id (+ cell_x/cell_y) for point rows."""
    lon = batch.column(lon_col).to_numpy()
    lat = batch.column(lat_col).to_numpy()
    cx, cy = grid_coords(lon, lat, tier)
    if curve == "hilbert":
        cell = hilbert_encode(cx, cy, tier)
    else:
        cell = morton_encode(cx, cy)
    batch = batch.append_column("tier", pa.array(np.full(len(cx), tier, np.int8)))
    batch = batch.append_column("cell_x", pa.array(cx, pa.int64()))
    batch = batch.append_column("cell_y", pa.array(cy, pa.int64()))
    batch = batch.append_column("cell_id", pa.array(cell.astype(np.int64), pa.int64()))
    return batch


def encode_extents(
    batch: pa.Table,
    max_tier: int = MAX_TIER,
    max_cells_per_dim: int = 2,
    curve: str = "morton",
    snap_tiers: tuple[int, ...] | None = None,
) -> pa.Table:
    """Expand extent rows (xmin/ymin/xmax/ymax columns) to one row per
    covering cell at each row's fitted tier.

    Output adds tier/cell_x/cell_y/cell_id and repeats the input
    columns (the reference's multi-insertion-id duplication).
    """
    xmin = batch.column("xmin").to_numpy()
    ymin = batch.column("ymin").to_numpy()
    xmax = batch.column("xmax").to_numpy()
    ymax = batch.column("ymax").to_numpy()
    tiers = tier_for_bbox(xmin, ymin, xmax, ymax, max_tier, max_cells_per_dim)
    if snap_tiers is not None:
        # snap DOWN to the nearest allowed (coarser) tier: bounds how
        # many distinct tiers the point side must re-encode at (the
        # cogroup join duplicates each point once per tier), at the
        # cost of larger cells (more candidate points per group).
        # Coarser is always correct: the covering set still includes
        # every cell that intersects the bbox.
        allowed = np.sort(np.asarray(snap_tiers, dtype=np.int64))
        idx = np.searchsorted(allowed, tiers, side="right") - 1
        tiers = allowed[np.clip(idx, 0, len(allowed) - 1)]
    # per-row covering cells: at the fitted tier the bbox spans at most
    # max_cells_per_dim cells per dim, so expansion is tightly bounded.
    rep_idx: list[int] = []
    out_cx: list[int] = []
    out_cy: list[int] = []
    out_tier: list[int] = []
    for i in range(len(xmin)):
        t = int(tiers[i])
        x0, y0 = grid_coords(np.array([xmin[i]]), np.array([ymin[i]]), t)
        x1, y1 = grid_coords(np.array([xmax[i]]), np.array([ymax[i]]), t)
        for cx in range(int(x0[0]), int(x1[0]) + 1):
            for cy in range(int(y0[0]), int(y1[0]) + 1):
                rep_idx.append(i)
                out_cx.append(cx)
                out_cy.append(cy)
                out_tier.append(t)
    idx = np.array(rep_idx, dtype=np.int64)
    cx = np.array(out_cx, dtype=np.int64)
    cy = np.array(out_cy, dtype=np.int64)
    if curve == "hilbert":
        # hilbert tier varies per row; encode per distinct tier
        cell = np.zeros(len(cx), dtype=np.uint64)
        tarr = np.array(out_tier, dtype=np.int64)
        for t in np.unique(tarr):
            m = tarr == t
            cell[m] = hilbert_encode(cx[m], cy[m], int(t))
    else:
        cell = morton_encode(cx, cy)
    out = batch.take(pa.array(idx))
    out = out.append_column("tier", pa.array(np.array(out_tier, np.int8)))
    out = out.append_column("cell_x", pa.array(cx, pa.int64()))
    out = out.append_column("cell_y", pa.array(cy, pa.int64()))
    out = out.append_column("cell_id", pa.array(cell.astype(np.int64), pa.int64()))
    return out


def add_salt(
    batch: pa.Table,
    hot_cells: set[int] | None,
    n_salt: int = 8,
    id_col: str = "row_id",
) -> pa.Table:
    """Append a ``salt`` column: hash(id) % n_salt for rows in hot cells,
    0 elsewhere. Group keys become (cell_id, salt) so one dense cell
    (dense url cluster) fans out over n_salt reducers — the engine's
    analogue of the reference's HashKeyIndexStrategy partition salting
    (``core/index/.../simple/HashKeyIndexStrategy.java``)."""
    cell = batch.column("cell_id").to_numpy()
    ids = batch.column(id_col).to_numpy()
    salt = np.zeros(len(cell), dtype=np.int16)
    if hot_cells:
        hot = np.isin(cell, np.fromiter(hot_cells, dtype=np.int64))
        salt[hot] = (ids[hot] * np.int64(2654435761) % np.int64(n_salt)).astype(np.int16)
    return batch.append_column("salt", pa.array(salt, pa.int16()))
