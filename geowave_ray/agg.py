"""Tree-combine aggregation for SMALL keyspaces.

``Dataset.groupby().aggregate()`` is a full hash shuffle — right for
large keyspaces (it scales out), but 10-20x slower than necessary when
the distinct-key count is small (cell histograms, per-query top-k
partials): every partial batch already fits in memory, so a two-level
combine (vectorized sort+reduceat within blocks, then once more over
the coalesced result) does the same reduction with zero shuffle.

This is the server-side-aggregation analogue of the reference's
partial/final Aggregation split (``core/store/.../api/Aggregation.java``
— partial per scan range, final merge at the client), kept distributed:
level 1 combines run on workers; only pre-aggregated partials (bounded
by the keyspace size, not the data size) reach the final block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def combine_batch(batch: pa.Table, key_cols: list[str], agg_cols: dict[str, str]) -> pa.Table:
    """Group within one batch: vectorized lexsort + reduceat.

    agg_cols: {column: 'sum'|'min'|'max'} (counts are sums of an n col).
    """
    if batch.num_rows == 0:
        return batch
    keys = []
    for c in key_cols:
        arr = batch.column(c).to_numpy(zero_copy_only=False)
        keys.append(arr)
    # lexsort needs sortable dtypes; factorize object (string) keys
    sort_keys = [
        np.unique(k, return_inverse=True)[1] if k.dtype == object else k
        for k in keys
    ]
    order = np.lexsort(sort_keys[::-1])
    sorted_keys = [k[order] for k in keys]
    change = np.zeros(batch.num_rows, dtype=bool)
    change[0] = True
    for k in sorted_keys:
        change[1:] |= k[1:] != k[:-1]
    starts = np.nonzero(change)[0]
    out = {c: k[starts] for c, k in zip(key_cols, sorted_keys)}
    for c, how in agg_cols.items():
        v = batch.column(c).to_numpy()[order]
        if how == "sum":
            out[c] = np.add.reduceat(v, starts)
        elif how == "min":
            out[c] = np.minimum.reduceat(v, starts)
        elif how == "max":
            out[c] = np.maximum.reduceat(v, starts)
        else:
            raise ValueError(how)
    return pa.table({c: pa.array(v) for c, v in out.items()})


def tree_aggregate(
    partials: ray.data.Dataset,
    key_cols: list[str],
    agg_cols: dict[str, str],
    fanin: int = 8,
) -> ray.data.Dataset:
    """Two-level combine of pre-aggregated partial rows (no shuffle).

    Level 1: combine within each of ``fanin`` coalesced blocks (runs in
    parallel on workers). Level 2: one final combine over the
    (keyspace-bounded) survivors.
    """
    fn_kwargs = dict(key_cols=key_cols, agg_cols=agg_cols)
    lvl1 = partials.repartition(fanin).map_batches(
        combine_batch, fn_kwargs=fn_kwargs, batch_format="pyarrow", batch_size=None
    )
    return lvl1.repartition(1).map_batches(
        combine_batch, fn_kwargs=fn_kwargs, batch_format="pyarrow", batch_size=None
    )


def grouped_topk(
    partials: ray.data.Dataset,
    group_col: str,
    sort_cols: list[str],
    ascending: list[bool],
    k_of,
    out_cols: list[str],
    fanin: int = 8,
) -> ray.data.Dataset:
    """Two-level per-group top-k merge of partial candidate rows.

    ``k_of(group_key) -> k``; output columns = [group_col, 'rank'] +
    out_cols. Level 1 prunes each coalesced block to its local top-k
    per group; level 2 does the exact global merge on the tiny rest.

    Both levels are Arrow/numpy native (stable ``pc.sort_indices`` +
    run-length rank slicing) — the level-1 prune sees every block, and
    a pandas conversion there costs ~5x (NOTES r3/r4 measurements).
    """
    import pyarrow.compute as pc

    sort_keys = [(group_col, "ascending")] + [
        (c, "ascending" if a else "descending")
        for c, a in zip(sort_cols, ascending)
    ]

    def _group_ranks(batch: pa.Table):
        """sorted table + (0-based within-group rank, group starts)."""
        t = batch.take(pc.sort_indices(batch, sort_keys=sort_keys))
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        change[1:] = g[1:] != g[:-1]
        starts = np.nonzero(change)[0]
        grp = np.cumsum(change) - 1
        pos = np.arange(len(g)) - starts[grp]
        return t, g, starts, grp, pos

    def local_prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        t, g, starts, _grp, pos = _group_ranks(batch)
        kmax = max(int(k_of(u)) for u in g[starts])
        return t.filter(pa.array(pos < kmax))

    def final_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {group_col: batch.column(group_col),
                 "rank": pa.array([], pa.int64()),
                 **{c: batch.column(c) for c in out_cols}}
            )
        t, g, starts, grp, pos = _group_ranks(batch)
        kper = np.fromiter(
            (int(k_of(u)) for u in g[starts]), np.int64, count=len(starts)
        )
        mask = pos < kper[grp]
        kept = t.filter(pa.array(mask))
        return pa.table(
            {group_col: kept.column(group_col),
             "rank": pa.array(pos[mask] + 1, pa.int64()),
             **{c: kept.column(c) for c in out_cols}}
        )

    lvl1 = partials.repartition(fanin).map_batches(
        local_prune, batch_format="pyarrow", batch_size=None
    )
    return lvl1.repartition(1).map_batches(
        final_merge, batch_format="pyarrow", batch_size=None
    )
