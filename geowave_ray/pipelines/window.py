"""Stream-shaped windowing operators over an ordered, keyed log.

Ray Data has no event-time windows; per the Ray guide, windows are
``groupby(key).map_groups`` over ts-sorted groups (tumbling/sliding/
session) and as-of lookups are sorted lags. The reference has no
windowing either (§2.9 — its Kafka feed hits the same batch path), so
these are part of the training-data-pipeline surface, with exact SQL
oracles (lag() / generate_series window expansion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def lag_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str | None = None,
) -> ray.data.Dataset:
    """As-of self-join: for each row, the id (and optionally value) of
    the most recent PRIOR row with the same key (ts ascending,
    tie-break by id). Equivalent to SQL ``lag() OVER (PARTITION BY key
    ORDER BY ts, id)``."""

    def fn(g: pa.Table) -> pa.Table:
        ts = g.column(ts_col).to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy()
        order = np.lexsort((ids, ts))
        take = pa.array(order)
        ids_sorted = ids[order]
        # -1 sentinel instead of null: avoids NA-representation
        # ambiguity across engines (SQL side uses coalesce(.., -1))
        prev = np.empty(len(order), np.int64)
        if len(prev):
            prev[0] = -1
            prev[1:] = ids_sorted[:-1]
        out = {
            key_col: g.column(key_col).take(take),
            id_col: pa.array(ids_sorted, pa.int64()),
            "prev_" + id_col: pa.array(prev, pa.int64()),
        }
        if value_col:
            v = g.column(value_col).take(take)
            v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            out["prev_" + value_col] = pa.concat_arrays(
                [pa.nulls(min(1, len(v)), v.type), v.slice(0, max(len(v) - 1, 0))]
            )
        return pa.table(out)

    return ds.groupby(key_col).map_groups(fn, batch_format="pyarrow")


def sliding_window_counts(
    ds: ray.data.Dataset,
    ts_col: str,
    key_col: str,
    window_us: int = 3_600_000_000,
    slide_us: int = 1_800_000_000,
) -> ray.data.Dataset:
    """Sliding-window counts: window w starts at ``w*slide_us`` and
    spans ``window_us``; each row lands in ``window_us/slide_us``
    windows (vectorized expansion inside map_batches, then the
    bounded-keyspace tree combine)."""
    from ..agg import tree_aggregate

    n_per = window_us // slide_us

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy().astype("datetime64[us]").astype(np.int64)
        keys = batch.column(key_col)
        base = ts // slide_us  # last window index containing ts
        out_w, out_k = [], []
        for j in range(int(n_per)):
            w = base - j
            # window w covers [w*slide, w*slide + window) — always true
            # for j < n_per when ts >= w*slide
            ok = ts >= w * slide_us
            out_w.append(np.where(ok, w, -1))
            out_k.append(keys)
        wcol = np.concatenate(out_w)
        kcol = pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in out_k])
        # batch-local combine without a pandas round-trip (VERDICT r2):
        # integer-encode keys, combine via np.unique over the packed
        # (key_code, window) pair, decode codes back at the end
        valid = wcol >= 0
        kd = kcol.dictionary_encode()
        kcodes = kd.indices.to_numpy(zero_copy_only=False).astype(np.int64)[valid]
        wv = wcol[valid]
        packed = kcodes * np.int64(1 << 40) | (wv & np.int64((1 << 40) - 1))
        uniq, counts = np.unique(packed, return_counts=True)
        ucodes = (uniq >> np.int64(40)).astype(np.int64)
        uwin = (uniq & np.int64((1 << 40) - 1)).astype(np.int64)
        return pa.table(
            {
                key_col: kd.dictionary.take(pa.array(ucodes)),
                "window_id": pa.array(uwin, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(expand, batch_format="pyarrow", batch_size=None)
    return tree_aggregate(partials, [key_col, "window_id"], {"n": "sum"})


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TWO-DATASET as-of join: for each left row, the right row with
    the same key and the LATEST ts <= left.ts (DuckDB ``ASOF JOIN``
    semantics; ties on equal right ts break to the max right id so
    results are engine-independent). Left rows with no match emit -1.

    Shape: both sides bucket by hashed key, tagged rows meet in one
    bounded cogroup, per group a combined (key, ts, id) sort key feeds
    one ``searchsorted`` for all left rows — no per-row loop, one
    exchange total.
    """
    from ..hashing import mix64

    def tag(side: int, id_col: str):
        def fn(b: pa.Table) -> pa.Table:
            k = b.column(key_col).to_numpy()
            ts = b.column(ts_col)
            if pa.types.is_timestamp(ts.type):
                ts = ts.cast(pa.timestamp("us"))
            ts = ts.cast(pa.int64())
            bk = mix64(k.astype(np.uint64)) % np.uint64(n_buckets)
            return pa.table(
                {
                    "key": pa.array(k.astype(np.int64), pa.int64()),
                    "ts": ts,
                    "rid": b.column(id_col).cast(pa.int64()),
                    "side": pa.array(np.full(len(k), side, np.int8)),
                    "bucket": pa.array(bk.astype(np.int64), pa.int64()),
                }
            )

        return fn

    u = left.map_batches(tag(0, left_id), batch_format="pyarrow", batch_size=None).union(
        right.map_batches(tag(1, right_id), batch_format="pyarrow", batch_size=None)
    )

    def group_fn(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        key = g.column("key").to_numpy()
        tsv = g.column("ts").to_numpy()
        ridv = g.column("rid").to_numpy()
        lmask = side == 0
        lk, lts, lid = key[lmask], tsv[lmask], ridv[lmask]
        rk, rts, rid = key[~lmask], tsv[~lmask], ridv[~lmask]
        if len(rk) == 0:
            return pa.table(
                {
                    left_id: pa.array(lid, pa.int64()),
                    "asof_" + right_id: pa.array(
                        np.full(len(lid), -1, np.int64), pa.int64()
                    ),
                }
            )
        # right side sorted by (key, ts, id): for each left (key, ts)
        # the predecessor position is the latest eligible right row,
        # with equal-ts ties resolved to max id by the sort order
        order = np.lexsort((rid, rts, rk))
        rk, rts, rid = rk[order], rts[order], rid[order]
        pos = np.searchsorted(_combined(rk, rts), _combined(lk, lts), side="right") - 1
        valid = pos >= 0
        match = np.full(len(lid), -1, np.int64)
        ok = valid & (rk[np.clip(pos, 0, None)] == lk)
        match[ok] = rid[pos[ok]]
        return pa.table(
            {
                left_id: pa.array(lid, pa.int64()),
                "asof_" + right_id: pa.array(match, pa.int64()),
            }
        )

    def _combined(k: np.ndarray, ts: np.ndarray) -> np.ndarray:
        # strict lexicographic (key, ts) as structured array — avoids
        # overflow of key*const + ts composites
        out = np.empty(len(k), dtype=[("k", np.int64), ("t", np.int64)])
        out["k"] = k
        out["t"] = ts
        return out

    return u.groupby("bucket").map_groups(group_fn, batch_format="pyarrow")
