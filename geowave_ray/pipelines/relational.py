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


def _tagged(ds: ray.data.Dataset, key: str, side: int, n_buckets: int):
    def fn(b: pa.Table) -> pa.Table:
        if b.column(key).null_count:
            import pyarrow.compute as pc

            b = b.filter(pc.is_valid(b.column(key)))  # null keys never join
        k = b.column(key).to_numpy().astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(k % np.int64(n_buckets), pa.int64()),
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.full(len(k), side, dtype=np.int8), pa.int8()),
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
    """Distinct left keys with NO matching right key (anti semi-join)."""
    out_name = out_col or left_key

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["key"].to_numpy()
        side = g["side"].to_numpy()
        lk = np.unique(keys[side == 0])
        rk = np.unique(keys[side == 1])
        keep = lk[~np.isin(lk, rk)]
        return pd.DataFrame({out_name: keep})

    tagged = _tagged(left, left_key, 0, n_buckets).union(
        _tagged(right, right_key, 1, n_buckets)
    )
    return (
        tagged.repartition(16)
        .groupby("bucket")
        .map_groups(emit, batch_format="pandas")
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

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["key"].to_numpy()
        side = g["side"].to_numpy()
        lk = np.unique(keys[side == 0])
        rk = np.unique(keys[side == 1])
        return pd.DataFrame({out_name: lk[np.isin(lk, rk)]})

    tagged = _tagged(left, left_key, 0, n_buckets).union(
        _tagged(right, right_key, 1, n_buckets)
    )
    return (
        tagged.repartition(16)
        .groupby("bucket")
        .map_groups(emit, batch_format="pandas")
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

    # pandas null-padding promotes ints to float64 — restore the
    # source dtypes after the inner merge (no NaNs survive it)
    out_dtype = {
        c: (ltypes.get(c) or rtypes[c]).to_pandas_dtype() for c in lcols + rcols
    }

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        ls = g[g["side"] == 0]
        rs = g[g["side"] == 1]
        if ls.empty or rs.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=out_dtype[c]) for c in lcols + rcols}
            )
        merged = ls[["key"] + lcols].merge(
            rs[["key"] + rcols], on="key", how="inner"
        )[lcols + rcols]
        for c in lcols + rcols:
            if merged[c].dtype != out_dtype[c]:
                merged[c] = merged[c].astype(out_dtype[c])
        return merged

    return (
        tl.union(tr)
        .repartition(16)
        .groupby("bucket")
        .map_groups(emit, batch_format="pandas")
    )
