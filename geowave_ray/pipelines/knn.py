"""kNN query pipeline.

Reference semantics: ``analytics/mapreduce/.../nn/NNMapReduce.java``
(top-``maxNeighbors`` per query with per-partition candidate heaps,
``NNProcessor.java:203+``) — re-expressed Ray-Data-first:

- the probe set (query points) is SMALL → broadcast once via
  ``ray.put``; an actor-pool stage computes, per Arrow batch of pages,
  the exact per-query partial top-k against that batch (vectorized
  distance matrix + threshold selection that keeps ties).
- partials are tiny (n_queries x k per batch) → a final
  ``groupby(query_id).map_groups`` merges heaps into the global
  exact top-k with deterministic (distance, url) tie-break.

This is exact (every page scored), with shuffle volume bounded by
O(n_queries * k * n_batches) instead of the full table. The scale path
for selective queries — neighbor-ring cell pruning à la the
reference's OrthodromicDistancePartitioner secondary cells — is
:func:`knn_cell_pruned` below.

Distance metric for the oracle-checked path is squared planar degrees
(``(dx*dx + dy*dy)``, exactly reproducible in SQL); haversine meters is
available via ``metric='haversine'`` (pytest-verified).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..geom import haversine_m, planar_sqdist


class KNNPartial:
    """Per-batch exact partial top-k for every broadcast query point."""

    def __init__(self, queries_ref, metric: str = "planar"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qid = q["query_id"]
        self.qlon = q["lon"]
        self.qlat = q["lat"]
        self.k = q["k"]
        self.kmax = int(self.k.max())
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
        out_qid, out_url, out_d = [], [], []
        if self.metric == "haversine":
            dmat = haversine_m(
                lon[None, :], lat[None, :], self.qlon[:, None], self.qlat[:, None]
            )
        else:
            dmat = planar_sqdist(
                self.qlon[:, None], self.qlat[:, None], lon[None, :], lat[None, :]
            )
        nb = len(lon)
        take = min(self.kmax, nb)
        for qi in range(len(self.qid)):
            d = dmat[qi]
            # threshold selection keeps ALL ties at the k-th distance so the
            # final (distance, url) tie-break is globally exact
            thr = np.partition(d, take - 1)[take - 1] if nb > take else np.inf
            sel = np.nonzero(d <= thr)[0]
            out_qid.extend([self.qid[qi]] * len(sel))
            out_url.extend(urls[sel].tolist())
            out_d.extend(d[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_qid, pa.string()),
                "url": pa.array(out_url, pa.string()),
                "dist": pa.array(out_d, pa.float64()),
            }
        )


def knn(
    pages: ray.data.Dataset,
    knn_queries: pa.Table,
    metric: str = "planar",
    concurrency: int | tuple = 4,
    batch_size: int = 16384,
) -> ray.data.Dataset:
    """Exact global top-k(q) per query -> (query_id, rank, url)."""
    q = {
        "query_id": np.asarray(knn_queries["query_id"].to_pylist(), dtype=object),
        "lon": knn_queries["lon"].to_numpy(),
        "lat": knn_queries["lat"].to_numpy(),
        "k": knn_queries["k"].to_numpy(),
    }
    k_by_qid = dict(zip(q["query_id"].tolist(), q["k"].tolist()))
    queries_ref = ray.put(q)
    partials = pages.map_batches(
        KNNPartial,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, metric=metric),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        k = int(k_by_qid[g["query_id"].iloc[0]])
        g = g.sort_values(["dist", "url"], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "url": g["url"],
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def knn_cell_pruned(
    pages: ray.data.Dataset,
    knn_queries: pa.Table,
    tier: int = 6,
    concurrency: int | tuple = 4,
) -> ray.data.Dataset:
    """Scale path: only pages whose tier-``tier`` cell is within the
    3x3 neighbor ring of some query's cell are scored (the reference's
    primary/secondary cell duplication,
    ``analytics/api/.../partitioner/AbstractPartitioner.java:80-160``),
    then the exact pipeline runs on the survivors.

    NOTE: exact only when every query's k-th neighbor lies within one
    cell width; callers pick ``tier`` from data density (manifest cell
    histograms). Falls back to full scan correctness in tests.
    """
    from ..sfc import grid_coords

    qlon = knn_queries["lon"].to_numpy()
    qlat = knn_queries["lat"].to_numpy()
    qcx, qcy = grid_coords(qlon, qlat, tier)
    n = 1 << tier
    wanted = set()
    for cx, cy in zip(qcx.tolist(), qcy.tolist()):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                wanted.add(((cx + dx) % n) * n + max(0, min(n - 1, cy + dy)))
    wanted_arr = np.fromiter(wanted, dtype=np.int64)
    wanted_ref = ray.put(np.sort(wanted_arr))

    def prefilter(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        cx, cy = grid_coords(
            batch.column("lon").to_numpy(), batch.column("lat").to_numpy(), tier
        )
        keys = cx * n + cy
        pos = np.searchsorted(w, keys)
        pos = np.clip(pos, 0, len(w) - 1)
        return batch.filter(pa.array(w[pos] == keys))

    survivors = pages.map_batches(prefilter, batch_format="pyarrow")
    return knn(survivors, knn_queries, concurrency=concurrency)
