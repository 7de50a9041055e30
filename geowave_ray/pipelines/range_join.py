"""Generic RANGE JOIN: left values against right [lo, hi) intervals.

The reference expresses interval predicates through its numeric/
temporal constraint machinery (``NumericFieldConstraints`` feeding
range decomposition); as a standalone dataset operator this is the
"range join" shape a training-data pipeline needs (event-to-window
attribution, price-band lookups).

Scale shape: ONE bounded exchange. The value domain is split into
``n_bins`` equal bins; every left value lands in exactly one bin and
every interval duplicates to the bins it covers. Inside a bin group
the left values sort once and every interval answers with two
``searchsorted`` calls, counting only values inside the bin's window —
so no pair is double-counted and no all-pairs loop exists. Output is
(right_id, n) partial counts, tree-reduced.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _to_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64())


def range_join_count(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    value_col: str,
    lo_col: str,
    hi_col: str,
    right_id: str,
    n_bins: int = 64,
) -> ray.data.Dataset:
    """Count left rows with lo <= value < hi per right interval ->
    (right_id, n); intervals with zero matches are omitted (inner-join
    semantics)."""
    from ..agg import tree_aggregate

    # domain from the right side (two scalar aggregates)
    lo_min = right.min(lo_col)
    hi_max = right.max(hi_col)
    d0 = int(pa.scalar(lo_min).cast(pa.timestamp("us")).cast(pa.int64()).as_py()) if not isinstance(lo_min, (int, float)) else int(lo_min)
    d1 = int(pa.scalar(hi_max).cast(pa.timestamp("us")).cast(pa.int64()).as_py()) if not isinstance(hi_max, (int, float)) else int(hi_max)
    width = max((d1 - d0) // n_bins + 1, 1)

    def left_rows(b: pa.Table) -> pa.Table:
        v = _to_us(b.column(value_col).combine_chunks() if isinstance(b.column(value_col), pa.ChunkedArray) else b.column(value_col)).to_numpy()
        binv = np.clip((v - d0) // width, 0, n_bins - 1)
        return pa.table(
            {
                "bin": pa.array(binv, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "rid": pa.nulls(len(v), pa.string()),
                "lo": pa.nulls(len(v), pa.int64()),
                "hi": pa.nulls(len(v), pa.int64()),
                "side": pa.array(np.zeros(len(v), np.int8)),
            }
        )

    def right_rows(b: pa.Table) -> pa.Table:
        lo = _to_us(b.column(lo_col)).to_numpy()
        hi = _to_us(b.column(hi_col)).to_numpy()
        rid = b.column(right_id)
        b0 = np.clip((lo - d0) // width, 0, n_bins - 1)
        b1 = np.clip((hi - 1 - d0) // width, 0, n_bins - 1)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(lo)), reps)
        bins = np.concatenate(
            [np.arange(a, z + 1) for a, z in zip(b0, b1)]
        ) if len(lo) else np.empty(0, np.int64)
        return pa.table(
            {
                "bin": pa.array(bins, pa.int64()),
                "v": pa.nulls(len(bins), pa.int64()),
                "rid": rid.take(pa.array(idx)),
                "lo": pa.array(lo[idx], pa.int64()),
                "hi": pa.array(hi[idx], pa.int64()),
                "side": pa.array(np.ones(len(bins), np.int8)),
            }
        )

    # coalesce before the bucketed exchange: Ray's sort-groupby pays
    # per-block scheduling, so width ~ reducer count (NOTES_r2 lesson)
    u = (
        left.map_batches(left_rows, batch_format="pyarrow", batch_size=None)
        .union(right.map_batches(right_rows, batch_format="pyarrow", batch_size=None))
        .repartition(_xb())
    )

    def group_fn(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        lmask = side == 0
        vs = np.sort(g.column("v").to_numpy()[lmask].astype(np.int64))
        rmask = ~lmask
        rid_t = g.column("rid").filter(pa.array(rmask))
        if rmask.sum() == 0 or len(vs) == 0:
            return pa.table(
                {right_id: pa.array([], rid_t.type), "n": pa.array([], pa.int64())}
            )
        binno = int(g.column("bin")[0].as_py())
        bin_start = d0 + binno * width
        bin_end = bin_start + width
        lo = np.maximum(g.column("lo").to_numpy()[rmask].astype(np.int64), bin_start)
        hi = np.minimum(g.column("hi").to_numpy()[rmask].astype(np.int64), bin_end)
        n = np.searchsorted(vs, hi, side="left") - np.searchsorted(vs, lo, side="left")
        keep = n > 0
        return pa.table(
            {right_id: rid_t.filter(pa.array(keep)), "n": pa.array(n[keep], pa.int64())}
        )

    partial = u.groupby("bin").map_groups(group_fn, batch_format="pyarrow")
    return tree_aggregate(partial, [right_id], {"n": "sum"})


def interval_overlap_join(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    a_id: str, a_lo: str, a_hi: str,
    b_id: str, b_lo: str, b_hi: str,
    n_bins: int = 64,
) -> ray.data.Dataset:
    """INTERVAL × INTERVAL overlap join (the TimeOverlaps predicate as
    a join): pairs with ``a.lo < b.hi AND b.lo < a.hi`` (half-open).

    ONE bounded exchange: both interval sets duplicate onto the time
    bins they cover; inside a bin every candidate pair is verified
    vectorized, and a pair is emitted ONLY from its canonical bin —
    the bin containing ``max(a.lo, b.lo)``, a time point every
    overlapping pair shares — so cross-bin duplicates never exist and
    no dedup exchange is needed.
    """

    if a_id == b_id:  # validate before any aggregation pass (ADVICE r2)
        raise ValueError("a_id and b_id output column names must differ")

    def norm(ds, idc, loc, hic, side):
        def fn(t: pa.Table) -> pa.Table:
            lo = _to_us(t.column(loc)).to_numpy()
            hi = _to_us(t.column(hic)).to_numpy()
            ids = t.column(idc).cast(pa.string())
            return pa.table(
                {
                    "iid": ids,
                    "lo": pa.array(lo, pa.int64()),
                    "hi": pa.array(hi, pa.int64()),
                    "side": pa.array(
                        np.full(len(lo), side, dtype=np.int8), pa.int8()
                    ),
                }
            )

        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)

    na = norm(a, a_id, a_lo, a_hi, 0)
    nb = norm(b, b_id, b_lo, b_hi, 1)
    both = na.union(nb)

    # domain bounds: two scalar aggregates over the tagged union
    lo_min = both.min("lo")
    hi_max = both.max("hi")
    if lo_min is None or hi_max is None:  # either input empty (ADVICE r2)
        import ray.data

        return ray.data.from_arrow(
            pa.table({a_id: pa.array([], pa.string()),
                      b_id: pa.array([], pa.string())})
        )
    d0, d1 = int(lo_min), int(hi_max)
    width = max((d1 - d0) // n_bins + 1, 1)

    def expand(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy()
        hi = t.column("hi").to_numpy()
        b0 = np.clip((lo - d0) // width, 0, n_bins - 1)
        b1 = np.clip((np.maximum(hi - 1, lo) - d0) // width, 0, n_bins - 1)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(lo), dtype=np.int64), reps)
        offs = np.arange(len(idx)) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        return pa.table(
            {
                "bin": pa.array(b0[idx] + offs, pa.int64()),
                "iid": t.column("iid").take(idx),
                "lo": t.column("lo").take(idx),
                "hi": t.column("hi").take(idx),
                "side": t.column("side").take(idx),
            }
        )

    empty_pairs = pa.table(
        {a_id: pa.array([], pa.string()), b_id: pa.array([], pa.string())}
    )

    def emit(g: pa.Table) -> pa.Table:
        # Arrow-native group reducer — Ray's pandas map_groups pays a
        # per-block conversion measured at 5x the pass cost (NOTES r3)
        if g.num_rows == 0:
            return empty_pairs
        bin_id = int(g.column("bin")[0].as_py())
        side = g.column("side").to_numpy(zero_copy_only=False)
        lo = g.column("lo").to_numpy()
        hi = g.column("hi").to_numpy()
        iid = g.column("iid").combine_chunks()
        a_idx = np.flatnonzero(side == 0)
        b_idx = np.flatnonzero(side == 1)
        if len(a_idx) == 0 or len(b_idx) == 0:
            return empty_pairs
        alo, ahi = lo[a_idx], hi[a_idx]
        blo, bhi = lo[b_idx], hi[b_idx]
        order = np.argsort(blo, kind="stable")
        blo_s, bhi_s = blo[order], bhi[order]
        bsel = b_idx[order]
        # for each a: b's with blo < ahi form a sorted prefix
        pref = np.searchsorted(blo_s, ahi, side="left")
        ai = np.repeat(np.arange(len(alo), dtype=np.int64), pref)
        bi = np.arange(len(ai)) - np.repeat(np.cumsum(pref) - pref, pref)
        ok = bhi_s[bi] > alo[ai]
        canon = np.maximum(alo[ai], blo_s[bi])
        ok &= ((canon - d0) // width).clip(0, n_bins - 1) == bin_id
        return pa.table(
            {
                a_id: iid.take(pa.array(a_idx[ai[ok]])),
                b_id: iid.take(pa.array(bsel[bi[ok]])),
            }
        )

    return (
        both.map_batches(expand, batch_format="pyarrow", batch_size=None)
        .repartition(_xb())
        .groupby("bin")
        .map_groups(emit, batch_format="pyarrow")
    )


def _xb():
    from ..util import exchange_blocks
    return exchange_blocks()
