"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data-pipeline complement to the reference's
index-level DedupeFilter (``core/store/.../query/filter/DedupeFilter.java``).

Shapes (per the Ray guide): vectorized hashing inside ``map_batches``,
explode to (band_id, band_hash, doc_id), ``groupby`` bands for
candidates, verify Jaccard on candidates only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche (vectorized)."""
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= _M1
    x ^= x >> np.uint64(33)
    x *= _M2
    x ^= x >> np.uint64(33)
    return x


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle hash set (uint64)."""
    toks = [w for w in text.split(" ") if w]
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    out = np.empty(max(1, len(toks) - n + 1), dtype=np.uint64)
    for i in range(len(out)):
        s = " ".join(toks[i : i + n])
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
        )
    return np.unique(out)


def content_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append a 64-bit content hash (exact-dedup key)."""
    vals = batch.column(col).to_pylist()
    h = np.array(
        [
            int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "big")
            >> 1
            for v in vals
        ],
        dtype=np.int64,
    )
    return batch.append_column("content_hash", pa.array(h, pa.int64()))


def exact_dedup(
    docs: ray.data.Dataset, id_col: str = "doc_id", n_buckets: int = 256
) -> ray.data.Dataset:
    """Keep the min-id representative per identical text.

    Scale shape: shuffle on ``content_hash % n_buckets`` (bounded group
    count — one map_groups task per BUCKET, not per distinct text),
    then a vectorized in-bucket drop_duplicates on the actual text
    (collision-safe; the 8-byte hash only routes)."""
    hashed = docs.map_batches(content_hash_batch, batch_format="pyarrow", batch_size=None)

    def add_bucket(b: pa.Table) -> pa.Table:
        bk = b.column("content_hash").to_numpy() % np.int64(n_buckets)
        return b.append_column("bucket", pa.array(bk, pa.int64()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(id_col, kind="mergesort")
            .drop_duplicates("text", keep="first")
            .drop(columns=["content_hash", "bucket"])
        )

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(keep_first, batch_format="pandas")
    )


def minhash_batch(
    batch: pa.Table, num_perm: int = 64, shingle_n: int = 3, text_col: str = "text"
) -> pa.Table:
    """Per-doc minhash signature (num_perm x uint64 -> stored int64 list)."""
    texts = batch.column(text_col).to_pylist()
    seeds = _mix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    sigs = []
    for t in texts:
        sh = _shingle_hashes(t, shingle_n)
        # one multiply-mix per permutation, min over shingles (vectorized)
        m = _mix64(sh[None, :] ^ seeds[:, None]).min(axis=1)
        sigs.append(m.astype(np.int64))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "minhash": pa.array([s.tolist() for s in sigs], pa.list_(pa.int64())),
        }
    )


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> ray.data.Dataset:
    """Candidate near-dup pairs via banded LSH, verified by signature
    Jaccard estimate. Returns (doc_a, doc_b, sim) with doc_a < doc_b."""
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        minhash_batch, fn_kwargs=dict(num_perm=num_perm, shingle_n=shingle_n),
        batch_format="pyarrow", batch_size=None,
    )

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sig = np.array(batch.column("minhash").to_pylist(), dtype=np.int64)
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for b in range(bands):
            seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = _mix64(
                np.bitwise_xor.reduce(
                    _mix64(seg.astype(np.uint64) + np.uint64(b + 1)), axis=1
                )
            ).astype(np.int64)
            out_id.extend(ids.tolist())
            out_band.extend([b] * len(ids))
            out_hash.extend(h.tolist())
            out_sig.extend(sig.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "minhash": pa.array(out_sig, pa.list_(pa.int64())),
            }
        )

    banded = sigs.map_batches(to_bands, batch_format="pyarrow", batch_size=None)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "sim": []})
        g = g.sort_values("doc_id", kind="mergesort")
        ids = g["doc_id"].to_numpy()
        sig = np.array(g["minhash"].tolist(), dtype=np.int64)
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                sim = float((sig[i] == sig[j]).mean())
                if sim >= jaccard_threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    s_out.append(sim)
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "sim": s_out})

    # band cogroup: bounded group count via band-hash BUCKET, pairwise
    # inside each bucket per distinct (band, band_hash)
    def add_bucket(b: pa.Table) -> pa.Table:
        bk = b.column("band_hash").to_numpy() % np.int64(256)
        return b.append_column("bucket", pa.array(bk, pa.int64()))

    def emit_bucket(g: pd.DataFrame) -> pd.DataFrame:
        frames = [
            emit_pairs(sub) for _, sub in g.groupby(["band", "band_hash"], sort=False)
        ]
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "sim": []})
        return pd.concat(frames, ignore_index=True)

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(emit_bucket, batch_format="pandas")
    )

    # dedupe identical pairs found in multiple bands: vectorized
    # in-bucket drop_duplicates (pair key routes the shuffle)
    def pair_bucket(b: pa.Table) -> pa.Table:
        bk = (
            b.column("doc_a").to_numpy() * np.int64(1000003)
            + b.column("doc_b").to_numpy()
        ) % np.int64(64)
        return b.append_column("pbucket", pa.array(bk, pa.int64()))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pbucket"])

    return (
        pairs.map_batches(pair_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("pbucket")
        .map_groups(uniq, batch_format="pandas")
    )


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over word tokens (vectorized bit-vote)."""
    texts = batch.column(text_col).to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    bitpos = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        if not toks:
            out[i] = 0
            continue
        hs = np.array(
            [
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
                for w in toks
            ],
            dtype=np.uint64,
        )
        bits = (hs[:, None] >> bitpos[None, :]) & np.uint64(1)
        votes = bits.sum(axis=0) * 2 > len(toks)
        v = np.uint64(0)
        for b in np.nonzero(votes)[0]:
            v |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(v >> np.uint64(1))  # keep sign-safe 63 bits
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, pa.int64()),
        }
    )


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa = set(map(int, _shingle_hashes(a, n)))
    sb = set(map(int, _shingle_hashes(b, n)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def connected_components(
    pairs: ray.data.Dataset, max_rounds: int = 10
) -> ray.data.Dataset:
    """Near-dup clusters from candidate pairs: iterative min-label
    propagation (the Ray-guide pattern — a few groupby rounds, no
    driver-side union-find on the full edge set).

    Input: (doc_a, doc_b) pairs. Output: (doc_id, cluster) where
    cluster is the minimum doc id reachable from doc_id.
    """
    import pyarrow.compute as pc

    from .agg import tree_aggregate

    # label table: start with label(doc) = min(doc, min neighbor)
    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "cluster": pa.array(
                    np.concatenate([np.minimum(a, b), np.minimum(a, b)]), pa.int64()
                ),
            }
        )

    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    labels = tree_aggregate(
        edges.map_batches(seed, batch_format="pyarrow", batch_size=None),
        ["doc_id"],
        {"cluster": "min"},
    ).materialize()

    for _ in range(max_rounds):
        lab_tbl = pa.concat_tables(ray.get(labels.to_arrow_refs()))
        ids = lab_tbl["doc_id"].to_numpy()
        labs = lab_tbl["cluster"].to_numpy()
        order = np.argsort(ids)
        ids_s, labs_s = ids[order], labs[order]
        lref = ray.put((ids_s, labs_s))

        def propagate(batch: pa.Table) -> pa.Table:
            iid, lab = ray.get(lref)
            a = batch.column("doc_a").to_numpy()
            b = batch.column("doc_b").to_numpy()
            la = lab[np.searchsorted(iid, a)]
            lb = lab[np.searchsorted(iid, b)]
            m = np.minimum(la, lb)
            return pa.table(
                {
                    "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                    "cluster": pa.array(np.concatenate([m, m]), pa.int64()),
                }
            )

        new_labels = tree_aggregate(
            edges.map_batches(propagate, batch_format="pyarrow", batch_size=None),
            ["doc_id"],
            {"cluster": "min"},
        ).materialize()
        new_tbl = pa.concat_tables(ray.get(new_labels.to_arrow_refs()))
        no = np.argsort(new_tbl["doc_id"].to_numpy())
        if np.array_equal(
            new_tbl["cluster"].to_numpy()[no], labs_s
        ):
            labels = new_labels
            break
        labels = new_labels
    return labels
