"""Relational key joins as bounded bucket cogroups.

The reference's anti-join surface (`TieredSpatialJoin.java:362-368`
``subtractByKey``) generalizes beyond geometry: both sides bucket by a
hash of the key, tagged rows meet in ONE bounded exchange (one
map_groups task per bucket, not per key), and the membership test
inside the bucket is a vectorized ``np.isin``.  Works at any key
cardinality — nothing is broadcast, nothing driver-resident.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _check_int_key(ds: ray.data.Dataset, key: str) -> None:
    t = dict(zip(ds.schema().names, ds.schema().types))[key]
    if not (pa.types.is_integer(t)):
        raise ValueError(
            f"join key {key!r} must be integer-typed (got {t}); map it to an "
            "int surrogate first (string keys through a sort exchange are a "
            "known anti-pattern, NOTES_r2)"
        )


def _tagged(
    ds: ray.data.Dataset,
    key: str,
    side: int,
    n_buckets: int,
    keep_nulls: bool = False,
):
    """Project to (bucket, key, side). Null keys are dropped (they never
    equi-join); with ``keep_nulls`` they are retained as side=2 rows in
    bucket 0 so NOT-EXISTS anti-join semantics can re-emit them."""

    def fn(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = b.column(key)
        n_null = col.null_count
        if n_null:
            b = b.filter(pc.is_valid(col))
        k = b.column(key).to_numpy().astype(np.int64)
        buckets = k % np.int64(n_buckets)
        sides = np.full(len(k), side, dtype=np.int8)
        if keep_nulls and n_null:
            buckets = np.concatenate([buckets, np.zeros(n_null, np.int64)])
            k = np.concatenate([k, np.zeros(n_null, np.int64)])
            sides = np.concatenate([sides, np.full(n_null, 2, np.int8)])
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int64()),
                "key": pa.array(k, pa.int64()),
                "side": pa.array(sides, pa.int8()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def anti_join_keys(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    out_col: str | None = None,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Distinct left keys with NO matching right key (anti semi-join).

    NOT-EXISTS semantics: a NULL left key matches nothing, so it
    survives the anti join — emitted as one NULL row (DISTINCT), per
    ADVICE r2. Null RIGHT keys are dropped (they never equi-match).
    """
    out_name = out_col or left_key
    _check_int_key(left, left_key)
    _check_int_key(right, right_key)

    def emit(g: pa.Table) -> pa.Table:
        keys = g.column("key").to_numpy()
        side = g.column("side").to_numpy()
        lk = np.unique(keys[side == 0])
        rk = np.unique(keys[side == 1])
        keep = lk[~np.isin(lk, rk)]
        arr = pa.array(keep, pa.int64())
        if (side == 2).any():  # null left keys: NOT EXISTS is true
            arr = pa.concat_arrays([arr, pa.nulls(1, pa.int64())])
        return pa.table({out_name: arr})

    tagged = _tagged(left, left_key, 0, n_buckets, keep_nulls=True).union(
        _tagged(right, right_key, 1, n_buckets)
    )
    return (
        # pre-groupby repartition: parquet reads fan out many small
        # blocks and the sort shuffle pays per-block overhead —
        # collapsing first measured ~15% faster on the Q5 pipeline
        # (r4 interleaved A/B; the reverse holds only for already-
        # coalesced inputs)
        tagged.repartition(_xb())
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )


def semi_join_keys(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    out_col: str | None = None,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Distinct left keys WITH at least one matching right key."""
    out_name = out_col or left_key

    def emit(g: pa.Table) -> pa.Table:
        keys = g.column("key").to_numpy()
        side = g.column("side").to_numpy()
        lk = np.unique(keys[side == 0])
        rk = np.unique(keys[side == 1])
        return pa.table({out_name: pa.array(lk[np.isin(lk, rk)], pa.int64())})

    tagged = _tagged(left, left_key, 0, n_buckets).union(
        _tagged(right, right_key, 1, n_buckets)
    )
    return (
        # pre-groupby repartition: parquet reads fan out many small
        # blocks and the sort shuffle pays per-block overhead —
        # collapsing first measured ~15% faster on the Q5 pipeline
        # (r4 interleaved A/B; the reverse holds only for already-
        # coalesced inputs)
        tagged.repartition(_xb())
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Generic large-large INNER equi-join: both sides hash-bucket on
    the key, tagged null-padded rows meet in one bounded exchange, and
    each bucket runs a vectorized pandas merge.  Output columns = all
    left columns + all right columns except ``right_key``.

    At scale this is the engine's shuffle join; for a small right side
    prefer a broadcast lookup (``orders_by_segment`` pattern) — no
    exchange at all.
    """
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != right_key]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    if set(lcols) & set(rcols):
        raise ValueError("overlapping non-key column names")
    reserved = {"bucket", "key", "side"} & (set(lcols) | set(rschema.names))
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with the join's internal "
            "tag columns — rename them before joining"
        )
    _check_int_key(left, left_key)
    _check_int_key(right, right_key)

    def tag(side: int, key: str, own: list, other: list, own_t, other_t):
        def fn(b: pa.Table) -> pa.Table:
            if b.column(key).null_count:
                import pyarrow.compute as pc

                b = b.filter(pc.is_valid(b.column(key)))  # null keys never join
            n = b.num_rows
            k = b.column(key).to_numpy().astype(np.int64)
            cols = {
                "bucket": pa.array(k % np.int64(n_buckets), pa.int64()),
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.full(n, side, dtype=np.int8), pa.int8()),
            }
            for c in own:
                cols[c] = b.column(c) if c in b.column_names else pa.nulls(n, own_t[c])
            for c in other:
                cols[c] = pa.nulls(n, other_t[c])
            return pa.table(cols)

        return fn

    tl = left.map_batches(
        tag(0, left_key, lcols, rcols, ltypes, rtypes),
        batch_format="pyarrow", batch_size=None,
    )
    tr = right.map_batches(
        tag(1, right_key, rcols, lcols, rtypes, ltypes),
        batch_format="pyarrow", batch_size=None,
    )

    empty_schema = pa.schema(
        [(c, ltypes.get(c) or rtypes[c]) for c in lcols + rcols]
    )

    def emit(g: pa.Table) -> pa.Table:
        # Arrow-native inner merge: keys/values never round-trip through
        # float64, so int64 payloads >= 2**53 survive intact (ADVICE r2).
        side = g.column("side").to_numpy()
        ls = g.take(np.nonzero(side == 0)[0])
        rs = g.take(np.nonzero(side == 1)[0])
        if ls.num_rows == 0 or rs.num_rows == 0:
            return empty_schema.empty_table()
        lk = ls.column("key").to_numpy()
        rk = rs.column("key").to_numpy()
        order = np.argsort(rk, kind="stable")
        rk_sorted = rk[order]
        starts = np.searchsorted(rk_sorted, lk, "left")
        ends = np.searchsorted(rk_sorted, lk, "right")
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return empty_schema.empty_table()
        li = np.repeat(np.arange(len(lk)), counts)
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        ri = order[np.repeat(starts, counts) + (np.arange(total) - offs)]
        cols = {c: ls.column(c).take(li) for c in lcols}
        cols.update({c: rs.column(c).take(ri) for c in rcols})
        return pa.table(cols)

    return (
        tl.union(tr)
        .repartition(_xb())
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )


def _xb():
    from ..util import exchange_blocks
    return exchange_blocks()
