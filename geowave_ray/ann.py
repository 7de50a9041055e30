"""Similarity search over an embedding column (``list<float>``).

- :func:`ann_bruteforce_topk` — exact cosine top-k: broadcast query
  matrix (``ray.put`` once), per-batch numpy matmul partials, global
  merge. The baseline.
- :func:`ann_lsh_topk` — scale path: random-hyperplane LSH buckets;
  only pages sharing a bucket with a query are scored (approximate,
  recall measured in tests).

Mirrors the kNN shape (``pipelines/knn.py``) on vector distance
instead of geodesic distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(col: pa.ChunkedArray | pa.Array, dim: int | None = None) -> np.ndarray:
    """list<float> column -> (n, d) float64, via zero-copy flatten
    (NOT to_pylist — the python-list round trip measured ~10x slower
    on wide batches)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    n = len(col)
    d = dim or (len(flat) // max(n, 1))
    return flat.reshape(n, d).astype(np.float64)


class CosinePartial:
    """Per-batch exact partial top-k for each broadcast query vector."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["qids"]
        self.qmat = q["qmat"]  # already normalized (nq, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        emb = _normalize(_emb_matrix(batch.column("embedding")))
        sims = self.qmat @ emb.T  # (nq, nb)
        take = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            s = sims[qi]
            thr = np.partition(s, len(s) - take)[len(s) - take] if len(s) > take else -np.inf
            sel = np.nonzero(s >= thr)[0]
            out_q.extend([int(self.qids[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def ann_bruteforce_topk(
    embeddings: ray.data.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    concurrency: int | tuple | None = None,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Exact cosine top-k -> (query_vec_id, rank, vec_id)."""
    if concurrency is None:
        from .util import pool_size

        concurrency = pool_size()  # half the CPUs: a full-size pool deadlocks
        # against its own upstream tasks on small clusters
    q = {"qids": np.asarray(query_ids), "qmat": _normalize(np.asarray(query_vecs, np.float64))}
    ref = ray.put(q)
    partials = embeddings.map_batches(
        CosinePartial,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k + (1 if exclude_self else 0)),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
    if exclude_self:
        import pyarrow.compute as pc

        partials = partials.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b["query_vec_id"], b["vec_id"]))),
            batch_format="pyarrow", batch_size=None,
        )
    from .agg import grouped_topk

    return grouped_topk(
        partials,
        group_col="query_vec_id",
        sort_cols=["sim", "vec_id"],
        ascending=[False, True],
        k_of=lambda q: k,
        out_cols=["vec_id"],
    )


def ann_lsh_topk(
    embeddings: ray.data.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
    concurrency: int | tuple | None = None,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Random-hyperplane LSH pre-filter then exact scoring of survivors.

    Each vector lands in ``n_tables`` buckets (one per plane set); rows
    sharing no bucket with any query are dropped before the matmul —
    at scale this is the IVF-style pruned path.
    """
    qmat = _normalize(np.asarray(query_vecs, np.float64))
    d = dim or qmat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, d))
    qcodes: dict[int, np.ndarray] = {}
    for t in range(n_tables):
        bits = (qmat @ planes[t].T) > 0
        codes = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        qcodes[t] = np.unique(codes)  # sorted, per-table lookup array
    wanted = ray.put(qcodes)
    planes_ref = ray.put(planes)

    def prefilter(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        want = ray.get(wanted)
        emb = _normalize(_emb_matrix(batch.column("embedding")))
        keep = np.zeros(len(emb), dtype=bool)
        for t in range(pl.shape[0]):
            bits = (emb @ pl[t].T) > 0
            codes = (bits.astype(np.uint64) << np.arange(pl.shape[1], dtype=np.uint64)).sum(axis=1)
            tw = want.get(t)
            if tw is not None and len(tw):
                # vectorized membership: sorted table lookup
                pos = np.clip(np.searchsorted(tw, codes), 0, len(tw) - 1)
                keep |= tw[pos] == codes
        return batch.filter(pa.array(keep))

    survivors = embeddings.map_batches(prefilter, batch_format="pyarrow", batch_size=None)
    return ann_bruteforce_topk(
        survivors, query_vecs, query_ids, k=k, concurrency=concurrency,
        exclude_self=exclude_self,
    )


def cosine_neardup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.35,
    right_blocks: int = 8,
) -> ray.data.Dataset:
    """EXACT embedding-cosine near-duplicate pairs:
    (vec_a < vec_b, cos >= threshold).

    Scale shape: exact all-pairs is inherently O(n^2) FLOPs, so the
    layout keeps it streaming — the dataset is coalesced into
    ``right_blocks`` materialized blocks whose OBJECT REFS (never the
    driver) serve as the broadcast right side; one map pass per right
    block computes a blocked matmul against every left batch. Memory
    per task is (batch x block) floats; passes are bounded by
    ``right_blocks``. For the approximate scale path see
    :func:`ann_lsh_topk`'s bucket prefilter.
    """
    ds = embeddings.repartition(right_blocks).materialize()
    refs = ds.to_arrow_refs()
    out = None
    for ref in refs:
        def cross(batch: pa.Table, _ref=ref) -> pa.Table:
            right = ray.get(_ref)
            rid = right.column("vec_id").to_numpy()
            rmat = _normalize(_emb_matrix(right.column("embedding")))
            lid = batch.column("vec_id").to_numpy()
            lmat = _normalize(_emb_matrix(batch.column("embedding")))
            sims = lmat @ rmat.T
            hit = (sims >= threshold) & (lid[:, None] < rid[None, :])
            ii, jj = np.nonzero(hit)
            return pa.table(
                {
                    "vec_a": pa.array(lid[ii], pa.int64()),
                    "vec_b": pa.array(rid[jj], pa.int64()),
                }
            )

        part = ds.map_batches(cross, batch_format="pyarrow", batch_size=None)
        out = part if out is None else out.union(part)
    return out


def ivf_train_centroids(
    embeddings: ray.data.Dataset,
    n_centroids: int = 32,
    n_iter: int = 6,
    seed: int = 7,
    dim: int = 64,
    sample_max: int = 65536,
) -> np.ndarray:
    """Coarse-quantizer training on a BOUNDED deterministic sample —
    the standard IVF recipe (quantizers train on ~1e3 vectors per
    centroid, never the full corpus). ONE distributed pass
    hash-thresholds ``vec_id`` down to ~``sample_max`` vectors
    (p = sample_max / count, metadata-only count for parquet); the
    driver holds <= 1.5*sample_max*d floats (~50 MB at defaults) and
    runs spherical Lloyd's locally, fully vectorized. Replaces the
    earlier per-iteration cluster pass, which paid a full scan per
    iteration — wrong at any scale, and pure orchestration overhead
    on small inputs."""
    import hashlib

    from .hashing import mix64

    cent = np.empty((n_centroids, dim))
    for i in range(n_centroids):
        h = hashlib.sha256(f"ivf{seed}.{i}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        cent[i] = rng.standard_normal(dim)
    cent = _normalize(cent)

    n_total = embeddings.count()
    p = min(1.0, 1.5 * sample_max / max(n_total, 1))
    # float(2**64) rounds past uint64 at p=1 — clamp explicitly
    thr = np.uint64(min(int(p * 2.0**64), 2**64 - 1))

    def pick(batch: pa.Table) -> pa.Table:
        h = mix64(batch.column("vec_id").to_numpy().astype(np.uint64))
        keep = h <= thr
        t = batch.filter(pa.array(keep))
        return t.append_column("_hkey", pa.array(h[keep].astype(np.int64)))

    mat = embeddings.map_batches(
        pick, batch_format="pyarrow", batch_size=None
    ).materialize()  # bounded: ~1.5 * sample_max rows by construction
    samp = pa.concat_tables(ray.get(mat.to_arrow_refs()))
    if samp.num_rows == 0:
        return cent
    hkey = samp.column("_hkey").to_numpy()
    order = np.argsort(hkey, kind="stable")[:sample_max]  # exact cap, hash order
    x = _normalize(_emb_matrix(samp.column("embedding")))[order]
    if x.shape[1] != dim:
        raise ValueError(
            f"embedding dim {x.shape[1]} != requested quantizer dim {dim}"
        )
    for _ in range(n_iter):
        a = np.argmax(x @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        np.add.at(sums, a, x)
        counts = np.bincount(a, minlength=n_centroids)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
        cent = _normalize(cent)
    return cent


def ann_ivf_topk(
    embeddings: ray.data.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 8,
    concurrency: int | tuple | None = None,
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """IVF-style ANN: a coarse k-means quantizer partitions the vectors
    into inverted lists; each query probes its ``nprobe`` nearest
    centroids and only vectors in those lists are scored exactly
    (approximate — recall measured in pytest; the exact baseline is
    :func:`ann_bruteforce_topk`). At scale the inverted lists are the
    partition key: assignment happens at ingest and the probe reads
    only matching partitions (same pruned-read pattern as the spatial
    cell-bucket store)."""
    qmat = _normalize(np.asarray(query_vecs, np.float64))
    # a caller-supplied quantizer (e.g. seeded random projections) is
    # a legitimate coarse quantizer and makes the whole pipeline
    # SQL-replicable; default stays the trained k-means quantizer
    cent = (
        np.asarray(centroids, np.float64)
        if centroids is not None
        else ivf_train_centroids(embeddings, n_centroids=n_centroids, dim=qmat.shape[1])
    )
    probed = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    wanted = np.unique(probed)
    cref = ray.put((cent, np.sort(wanted)))

    def prefilter(batch: pa.Table) -> pa.Table:
        c, want = ray.get(cref)
        emb = _normalize(_emb_matrix(batch.column("embedding")))
        a = np.argmax(emb @ c.T, axis=1)
        pos = np.clip(np.searchsorted(want, a), 0, len(want) - 1)
        return batch.filter(pa.array(want[pos] == a))

    survivors = embeddings.map_batches(prefilter, batch_format="pyarrow", batch_size=None)
    return ann_bruteforce_topk(
        survivors, query_vecs, query_ids, k=k, concurrency=concurrency,
        exclude_self=exclude_self,
    )


def semantic_dedup(
    embeddings: ray.data.Dataset,
    n_clusters: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    block: int = 2048,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication over an embedding column:
    rows are assigned to the nearest of ``n_clusters`` DETERMINISTIC
    seed centroids (the embeddings of the ``n_clusters`` smallest ids
    — reproducible across runs and parallelism levels, unlike a
    trained k-means), then within each cluster a row is a semantic
    duplicate iff some LOWER-id row of the same cluster has cosine
    similarity >= ``threshold``. Survivors keep ``(id, cluster)``.

    Scale shape: seeds come from a bounded per-block smallest-k prune
    (k rows per block reach the merge, never the corpus); the seed
    matrix broadcasts once via ``ray.put`` with a per-worker memo; the
    assignment pass is one stateless matmul ``map_batches``; the
    within-cluster prune is ONE bounded groupby exchange (embeddings
    ride it — inherent to SemDeDup, which compares raw vectors inside
    a cluster) followed by an id-ordered blocked matmul, so transient
    memory is ``block × cluster_size`` not ``cluster_size²``. At
    corpus scale raise ``n_clusters`` so clusters fit a worker —
    dedup quality degrades gracefully (cross-cluster near-dups are
    SemDeDup's accepted miss, not an error of this implementation).

    Ties in the nearest-centroid argmax break to the smallest seed id
    (numpy argmax-first == SQL ``ORDER BY sim DESC, seed_id``).
    """
    from .util import cached_state

    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        take = min(n_clusters, len(ids))
        sel = np.argpartition(ids, take - 1)[:take] if len(ids) > take else np.arange(len(ids))
        return b.select([id_col, emb_col]).take(pa.array(np.sort(sel)))

    seed_t = (
        embeddings.map_batches(seed_partial, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(seed_partial, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    seed_t = pa.Table.from_pylist(seed_t)
    sids = seed_t.column(id_col).to_numpy()
    order = np.argsort(sids, kind="mergesort")
    seeds = _normalize(_emb_matrix(seed_t.column(emb_col)))[order]
    ref = ray.put((sids[order].astype(np.int64), seeds))
    key = ("semantic_seeds", ref.hex())

    def assign(b: pa.Table) -> pa.Table:
        sid, s = cached_state(key, ref)
        x = _normalize(_emb_matrix(b.column(emb_col)))
        cl = sid[np.argmax(x @ s.T, axis=1)]
        return pa.table(
            {
                id_col: b.column(id_col),
                emb_col: b.column(emb_col),
                "cluster": pa.array(cl, pa.int64()),
            }
        )

    def prune(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy()
        o = np.argsort(ids, kind="mergesort")
        x = _normalize(_emb_matrix(g.column(emb_col)))[o]
        ids = ids[o]
        n = len(ids)
        dominated = np.zeros(n, dtype=bool)
        for s in range(0, n, block):
            e = min(s + block, n)
            if s == 0 and e == n:
                sims = x[s:e] @ x[:e].T
                tri = np.tril(sims >= threshold, k=-1)
                dominated[s:e] = tri.any(axis=1)
            else:
                sims = x[s:e] @ x[:e].T  # (e-s, e)
                col = np.arange(e)
                row = np.arange(s, e)
                mask = col[None, :] < row[:, None]
                dominated[s:e] = ((sims >= threshold) & mask).any(axis=1)
        keep = ~dominated
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "cluster": pa.array(
                    g.column("cluster").to_numpy()[o][keep], pa.int64()
                ),
            }
        )

    return (
        embeddings.map_batches(assign, batch_format="pyarrow", batch_size=None)
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


def quantize_int8_batch(batch: pa.Table, emb_col: str = "embedding") -> pa.Table:
    """Scalar int8 quantization of an embedding column: per-vector
    symmetric scale ``s = max|x| / 127``, codes ``round(x / s)``.
    The 100-TB lever — the quantized corpus is 4x smaller in the
    object store / on the wire, so a scan-heavy ANN stage moves 4x
    fewer bytes. Zero-copy flatten in, fixed-size-list int8 out
    (``vec_id, codes: list<int8>, scale: float64``)."""
    ids = batch.column("vec_id")
    m = _emb_matrix(batch.column(emb_col))
    amax = np.abs(m).max(axis=1)
    scale = np.where(amax > 0, amax / 127.0, 1.0)
    q = m / scale[:, None]
    # round half AWAY FROM ZERO to match SQL round() exactly (np.rint
    # is half-to-even; the ann_int8 oracle replicates this expression
    # in DuckDB, so exact .5 quotients must round identically)
    codes = np.trunc(q + np.copysign(0.5, q)).astype(np.int8)
    d = m.shape[1] if m.size else 0
    la = pa.FixedSizeListArray.from_arrays(
        pa.array(codes.reshape(-1), pa.int8()), d
    )
    return pa.table(
        {"vec_id": ids, "codes": la, "scale": pa.array(scale, pa.float64())}
    )


class _Int8Partial:
    """Per-batch candidate top-m per query under the QUANTIZED metric:
    sim_q = (q . codes) * scale / ||x|| approximated without norms —
    candidates ranked by the quantized dot product, rescored exactly
    by the caller."""

    def __init__(self, queries_ref, m: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["qids"]
        self.qmat = q["qmat"]  # normalized float64 (nq, d)
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        codes_col = batch.column("codes")
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        import pyarrow.compute as pc

        flat = pc.list_flatten(codes_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        d = self.qmat.shape[1]
        # float64 scan metric: the int8 lever is the 4x-smaller WIRE
        # format (object store / storage bytes); widening the in-core
        # matmul to f64 costs 2x FLOPs on the small candidate stage but
        # makes the ranking reproducible by the SQL oracle (r4 #9)
        codes = flat.reshape(n, d).astype(np.float64)
        scale = batch.column("scale").to_numpy()
        # dequantized vectors x~ = codes * scale; cosine needs x~/||x~||,
        # and scale > 0 cancels in the norm — rank by (q . codes)/||codes||
        nrm = np.linalg.norm(codes, axis=1)
        nrm[nrm == 0] = 1.0
        sims = (self.qmat @ codes.T) / nrm[None, :]
        take = min(self.m, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            s = sims[qi]
            thr = np.partition(s, len(s) - take)[len(s) - take] if len(s) > take else -np.inf
            sel = np.nonzero(s >= thr)[0]
            out_q.extend([int(self.qids[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(s[sel].astype(np.float64).tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "qsim": pa.array(out_s, pa.float64()),
            }
        )


def ann_int8_topk(
    embeddings: ray.data.Dataset,
    query_vecs: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    overfetch: int = 4,
    concurrency: int | tuple | None = None,
) -> ray.data.Dataset:
    """ANN over the int8-quantized corpus with exact float rescoring:
    stage 1 scans the 4x-smaller quantized table and keeps the top
    ``overfetch * k`` candidates per query under the quantized metric;
    stage 2 re-joins ONLY those candidate rows' float embeddings
    (semi-join by vec_id against a broadcast candidate set — bounded
    by queries x overfetch x k) and re-ranks them exactly. Returns
    (query_vec_id, rank, vec_id, sim) — approximate overall (recall
    measured in pytest), exact given the candidate set."""
    from .agg import grouped_topk
    from .util import cached_state, pool_size

    if concurrency is None:
        concurrency = pool_size()
    q = {
        "qids": np.asarray(query_ids),
        "qmat": _normalize(np.asarray(query_vecs, np.float64)),
    }
    ref = ray.put(q)
    m = overfetch * k

    quant = embeddings.map_batches(
        quantize_int8_batch, batch_format="pyarrow", batch_size=None
    )
    partials = quant.map_batches(
        _Int8Partial,
        fn_constructor_kwargs=dict(queries_ref=ref, m=m),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
    cand = grouped_topk(
        partials,
        group_col="query_vec_id",
        sort_cols=["qsim", "vec_id"],
        ascending=[False, True],
        k_of=lambda g: m,
        out_cols=["vec_id"],
    )
    cand_ids = np.unique(
        cand.select_columns(["vec_id"]).to_pandas()["vec_id"].to_numpy()
    )
    cref = ray.put(np.sort(cand_ids))
    ckey = ("ann_int8_cand", cref.hex())

    def semi(b: pa.Table) -> pa.Table:
        cs = cached_state(ckey, cref)
        ids = b.column("vec_id").to_numpy()
        pos = np.searchsorted(cs, ids)
        hit = (pos < len(cs)) & (cs[np.minimum(pos, max(len(cs) - 1, 0))] == ids) if len(cs) else np.zeros(len(ids), bool)
        return b.filter(pa.array(hit))

    survivors = embeddings.map_batches(semi, batch_format="pyarrow", batch_size=None)
    exact = survivors.map_batches(
        CosinePartial,
        fn_constructor_kwargs=dict(queries_ref=ref, k=m),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
    # keep only (q, v) pairs that were stage-1 candidates FOR THAT q
    cand_pairs = cand.to_pandas()
    pair_key = (
        cand_pairs["query_vec_id"].to_numpy().astype(np.int64) << np.int64(32)
    ) | cand_pairs["vec_id"].to_numpy().astype(np.int64)
    pref = ray.put(np.sort(pair_key))
    pkey = ("ann_int8_pairs", pref.hex())

    def pair_filter(b: pa.Table) -> pa.Table:
        ps = cached_state(pkey, pref)
        key = (
            b.column("query_vec_id").to_numpy().astype(np.int64) << np.int64(32)
        ) | b.column("vec_id").to_numpy().astype(np.int64)
        pos = np.searchsorted(ps, key)
        hit = (pos < len(ps)) & (ps[np.minimum(pos, max(len(ps) - 1, 0))] == key) if len(ps) else np.zeros(len(key), bool)
        return b.filter(pa.array(hit))

    exact = exact.map_batches(pair_filter, batch_format="pyarrow", batch_size=None)
    return grouped_topk(
        exact,
        group_col="query_vec_id",
        sort_cols=["sim", "vec_id"],
        ascending=[False, True],
        k_of=lambda g: k,
        out_cols=["vec_id", "sim"],
    )
