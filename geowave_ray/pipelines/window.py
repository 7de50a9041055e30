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

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        out = {key_col: g[key_col], id_col: g[id_col],
               # -1 sentinel instead of null: avoids NA-representation
               # ambiguity across engines (SQL side uses coalesce(.., -1))
               "prev_" + id_col: g[id_col].shift(1, fill_value=-1).astype("int64")}
        if value_col:
            out["prev_" + value_col] = g[value_col].shift(1)
        return pd.DataFrame(out)

    return ds.groupby(key_col).map_groups(fn, batch_format="pandas")


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
        t = pa.table({key_col: kcol, "window_id": pa.array(wcol, pa.int64())})
        t = t.filter(pa.compute.greater_equal(t["window_id"], 0))
        # batch-local combine
        df = t.to_pandas().groupby([key_col, "window_id"], as_index=False).size()
        df = df.rename(columns={"size": "n"})
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = ds.map_batches(expand, batch_format="pyarrow", batch_size=None)
    return tree_aggregate(partials, [key_col, "window_id"], {"n": "sum"})
