"""KDE / heatmap pipeline.

Reference: ``analytics/mapreduce/.../kde`` + ``analytics/spark/kde/KDERunner.java:234-317``
— per point, splat a Gaussian kernel onto neighboring cells, sum per
cell, globally sort descending and rank for percentile bands.

Ray-Data shape: ``map_batches`` splat (partial per-cell sums within
the batch — the combiner) -> ``groupby(cell).sum`` (small: one row per
touched cell) -> ``sort(value desc)`` -> rank over sorted blocks.

The oracle-checked variant (`cell_histogram_ranked`) uses plain counts
(integer-exact); the Gaussian splat variant is pytest-verified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sfc import grid_coords


def cell_counts_batch(batch: pa.Table, tier: int) -> pa.Table:
    """Partial per-cell counts within a batch (pre-aggregation combiner)."""
    cx, cy = grid_coords(
        batch.column("lon").to_numpy(), batch.column("lat").to_numpy(), tier
    )
    key = cx * np.int64(1 << tier) + cy
    cells, counts = np.unique(key, return_counts=True)
    return pa.table(
        {
            "cell_x": pa.array(cells // (1 << tier), pa.int64()),
            "cell_y": pa.array(cells % (1 << tier), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def cell_histogram(pages: ray.data.Dataset, tier: int = 8) -> ray.data.Dataset:
    """Exact per-cell counts: batch-local combine then a shuffle-free
    tree combine (keyspace <= 4^tier is small; a hash groupby would
    move the same partials through a full exchange for nothing)."""
    from ..agg import tree_aggregate

    partial = pages.map_batches(
        cell_counts_batch, fn_kwargs=dict(tier=tier), batch_format="pyarrow", batch_size=None
    )
    return tree_aggregate(partial, ["cell_x", "cell_y"], {"n": "sum"})


def cell_histogram_ranked(pages: ray.data.Dataset, tier: int = 8) -> ray.data.Dataset:
    """Cells ranked densest-first (rank 1 = max count; deterministic
    (n desc, cell_x, cell_y) order — the KDE percentile ranking)."""
    hist = cell_histogram(pages, tier)
    # touched-cell count is small (<= 4^tier, typically far less):
    # a driver-side rank on the aggregated table is exact and cheap.
    t = hist.to_pandas()
    t = t.sort_values(["n", "cell_x", "cell_y"], ascending=[False, True, True], kind="mergesort")
    t["rank"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return ray.data.from_pandas(t.reset_index(drop=True))


def gaussian_splat_batch(batch: pa.Table, tier: int, radius_cells: int = 1) -> pa.Table:
    """Gaussian splat combiner: each point contributes
    exp(-(d2 cells)/2) to the (2r+1)^2 neighborhood of its cell."""
    n = 1 << tier
    cx, cy = grid_coords(
        batch.column("lon").to_numpy(), batch.column("lat").to_numpy(), tier
    )
    # fully vectorized: concatenate all offset contributions, then one
    # sort-based segmented sum (no python dict in the hot path)
    key_parts, w_parts = [], []
    for dx in range(-radius_cells, radius_cells + 1):
        for dy in range(-radius_cells, radius_cells + 1):
            w = float(np.exp(-(dx * dx + dy * dy) / 2.0))
            gx = cx + dx
            gy = cy + dy
            ok = (gx >= 0) & (gx < n) & (gy >= 0) & (gy < n)
            key_parts.append(gx[ok] * np.int64(n) + gy[ok])
            w_parts.append(np.full(int(ok.sum()), w))
    all_keys = np.concatenate(key_parts)
    all_w = np.concatenate(w_parts)
    order = np.argsort(all_keys, kind="stable")
    sk, sw = all_keys[order], all_w[order]
    keys, starts = np.unique(sk, return_index=True)
    vals = np.add.reduceat(sw, starts) if len(sk) else np.empty(0)
    return pa.table(
        {
            "cell_x": pa.array(keys // n, pa.int64()),
            "cell_y": pa.array(keys % n, pa.int64()),
            "density": pa.array(vals, pa.float64()),
        }
    )


def kde(pages: ray.data.Dataset, tier: int = 8, radius_cells: int = 1) -> ray.data.Dataset:
    from ..agg import tree_aggregate

    partial = pages.map_batches(
        gaussian_splat_batch, fn_kwargs=dict(tier=tier, radius_cells=radius_cells),
        batch_format="pyarrow", batch_size=None,
    )
    return tree_aggregate(partial, ["cell_x", "cell_y"], {"density": "sum"})
