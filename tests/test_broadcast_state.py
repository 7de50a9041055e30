"""Distributed probe state (state/broadcast.py): the bucketed plan
must (a) return bit-identical results to the broadcast plan and (b)
keep driver-resident bytes bounded regardless of the duplicated-set
size (VERDICT r3 "What's wrong" #1/#2 — no unbounded ``take_all()``
anywhere in the dedup family)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(n_docs: int, dup_frac: float = 0.6, seed: int = 7) -> pa.Table:
    """Corpus where >= dup_frac of paragraphs are corpus-duplicated:
    each doc = one shared boilerplate paragraph drawn from a small
    pool + one unique paragraph."""
    rng = np.random.default_rng(seed)
    pool = [f"boilerplate paragraph number {i} repeated across the corpus"
            for i in range(max(4, n_docs // 200))]
    pick = rng.integers(0, len(pool), n_docs)
    texts = [
        f"{pool[pick[i]]}\nunique line {i} salt {rng.integers(1 << 30)}"
        for i in range(n_docs)
    ]
    return pa.table(
        {"doc_id": pa.array(np.arange(n_docs), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def test_int64_set_plans_equivalent(ray_session):
    import ray

    from geowave_ray.dedup import dup_content_hashes

    t = _docs_table(4000)
    # make whole-doc duplicates (dup_content_hashes is doc-level)
    texts = t.column("text").to_pylist()
    for i in range(0, 4000, 2):
        texts[i] = texts[(i + 1) % 4000]
    t = t.set_column(1, "text", pa.array(texts, pa.string()))
    ds = ray.data.from_arrow(t).repartition(8)
    bro = dup_content_hashes(ds)  # default: broadcast
    buck = dup_content_hashes(ds, broadcast_limit=0)  # force bucketed
    assert bro.plan == "broadcast" and buck.plan == "bucketed"
    assert np.array_equal(bro.to_sorted_array(), buck.to_sorted_array())
    probe = np.concatenate(
        [bro.to_sorted_array()[:100], np.arange(50, dtype=np.int64)]
    )
    assert np.array_equal(bro.contains(probe), buck.contains(probe))


def test_exact_dedup_bucketed_equals_broadcast(ray_session):
    import ray

    from geowave_ray.dedup import exact_dedup

    t = _docs_table(3000)
    # make exact text duplicates (not just shared paragraphs)
    texts = t.column("text").to_pylist()
    for i in range(0, 3000, 3):
        texts[i] = texts[(i + 1) % 3000]
    t = t.set_column(1, "text", pa.array(texts, pa.string()))
    ds = ray.data.from_arrow(t).repartition(8)
    a = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        exact_dedup(ds, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_paragraph_dedup_bucketed_equals_broadcast(ray_session):
    import ray

    from geowave_ray.dedup import drop_dup_paragraphs

    ds = ray.data.from_arrow(_docs_table(2000)).repartition(8)
    a = (
        drop_dup_paragraphs(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        drop_dup_paragraphs(ds, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a["n_removed"] > 0).any()


def test_scrub_spans_bucketed_equals_broadcast(ray_session):
    import ray

    from geowave_ray.dedup import scrub_dup_spans

    rng = np.random.default_rng(3)
    boiler = "please subscribe to our newsletter for updates today"
    texts = [
        f"{boiler} doc {i} words {' '.join(str(x) for x in rng.integers(0, 9, 6))}"
        for i in range(1500)
    ]
    t = pa.table({"doc_id": pa.array(range(1500), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(8)
    a = scrub_dup_spans(ds, n=4).to_pandas().sort_values("doc_id")
    b = (
        scrub_dup_spans(ds, n=4, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert (a["n_removed"] > 0).any()


def test_high_duplication_driver_bytes_bounded(ray_session):
    """VERDICT r3 #1 'done' criterion: >= 50% duplicated paragraphs at
    1M docs; building the winner state on the BUCKETED plan must keep
    driver-resident Python-heap bytes bounded (one reduce block at a
    time), far below the duplicated set itself."""
    import tracemalloc

    import ray

    from geowave_ray.dedup import dup_paragraph_winners

    n = 1_000_000
    # 400k distinct boilerplate paragraphs, each duplicated 2-3x ->
    # the duplicated set is ~45 MB, far above any driver-side noise
    pool_n = 400_000
    pick = np.arange(n) % pool_n
    # vectorized text build (Python join of 1M f-strings is the slow part)
    import pyarrow.compute as pc

    boiler = pc.binary_join_element_wise(
        "shared boilerplate paragraph",
        pa.array(pick.astype(str)),
        "with trailing filler words to give it some realistic width",
        " ",
    )
    uniq = pc.binary_join_element_wise(
        "unique line", pa.array(np.arange(n).astype(str)), " "
    )
    texts = pc.binary_join_element_wise(boiler, uniq, "\n")
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t).repartition(16).materialize()

    tracemalloc.start()
    tracemalloc.reset_peak()
    base = tracemalloc.get_traced_memory()[0]
    winners = dup_paragraph_winners(ds, broadcast_limit=0)
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()

    assert winners.plan == "bucketed"
    assert len(winners) == pool_n  # every boilerplate para is duplicated
    state_bytes = sum(
        chunk.nbytes
        for _, chunk in [(b, ray.get(r)) for b, refs in winners._refs.items()
                         for r in refs]
    )
    driver_delta = peak - base
    # the state itself is several MB; the driver must hold well under
    # one copy of it (it streams block-by-block into plasma)
    assert state_bytes > 40_000_000
    # driver heap must stay well under ONE copy of the state (the old
    # take_all()+dict path held ~3-5x the state in Python objects)
    assert driver_delta < max(24_000_000, state_bytes // 2), (
        f"driver heap grew {driver_delta} bytes for a {state_bytes}-byte state"
    )


def test_tfidf_bucketed_equals_broadcast(ray_session):
    """VERDICT r3 #3: the df table is a DistributedHashedTable — the
    bucketed plan must rank identically to the broadcast plan."""
    import ray

    from geowave_ray.text import tfidf_topk

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 300, 30))
        for _ in range(800)
    ]
    t = pa.table({"doc_id": pa.array(range(800), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)
    a = tfidf_topk(ds).to_pandas().sort_values(["doc_id", "rank"])
    b = (
        tfidf_topk(ds, broadcast_limit=0)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_fused_signatures_equal_unfused(ray_session):
    """doc_signatures feeds LSH + exact dedup without re-reading text;
    results must equal the standalone operators bit-for-bit."""
    import ray

    from geowave_ray.dedup import (
        doc_signatures,
        exact_dedup,
        minhash_lsh_pairs,
    )

    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(words[j] for j in rng.integers(0, 50, 25))
             for _ in range(600)]
    for i in range(0, 600, 4):   # near-dups + exact dups
        texts[i] = texts[(i + 1) % 600]
    t = pa.table({"doc_id": pa.array(range(600), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)
    sigs = doc_signatures(ds)

    a = minhash_lsh_pairs(ds, jaccard_threshold=0.5, fused=False).to_pandas()
    b = minhash_lsh_pairs(ds, jaccard_threshold=0.5, sigs=sigs).to_pandas()
    key = ["doc_a", "doc_b"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))

    d1 = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    d2 = (
        exact_dedup(ds, content_hashes=sigs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert d1.equals(d2)


def test_budget_head_sample_high_cardinality_driver_bounded(ray_session):
    """VERDICT r4 #3 'done' criterion: budget_head_sample with 1M
    DISTINCT keys (per-domain budgets shape) — per-key state must live
    in DistributedHashedTable probe states, not driver dicts, so the
    driver Python heap stays bounded while the result is still exact."""
    import tracemalloc

    import pyarrow.compute as pc
    import ray
    import ray.data

    from geowave_ray.hashing import mix64
    from geowave_ray.text import budget_head_sample

    n_keys = 1_000_000
    two_row = 200_000  # keys 0..two_row-1 get a second doc
    rng = np.random.default_rng(11)
    ids1 = np.arange(n_keys, dtype=np.int64)
    ids2 = np.arange(n_keys, n_keys + two_row, dtype=np.int64)
    ids = np.concatenate([ids1, ids2])
    key_idx = np.concatenate([ids1, np.arange(two_row, dtype=np.int64)])
    keys = pc.binary_join_element_wise(
        "dom", pa.array(key_idx.astype(str)), ""
    )
    w = rng.integers(1, 10, len(ids)).astype(np.int64)
    budget = 5
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": keys,
        "n_chars": pa.array(w.astype(np.float64), pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(16).materialize()

    tracemalloc.start()
    tracemalloc.reset_peak()
    base = tracemalloc.get_traced_memory()[0]
    got = budget_head_sample(
        ds, budget=budget, collect_threshold=8, broadcast_limit=0
    )
    got_ids = np.sort(
        np.concatenate([
            b.column("doc_id").to_numpy()
            for b in got.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
        ])
    )
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()

    # exact truth, vectorized: every key's first-in-hash-order doc is
    # kept (exclusive cum 0 < budget); a 2-doc key's second doc is kept
    # iff the first doc's weight is < budget
    h = (mix64(ids.astype(np.uint64)) >> np.uint64(1)).astype(np.int64)
    h1, h2 = h[:n_keys][:two_row], h[n_keys:]
    w1, w2 = w[:n_keys][:two_row], w[n_keys:]
    # per 2-doc key: order by (h, id); ids1 < ids2 always
    first_is_1 = (h1 < h2) | ((h1 == h2) & True)
    first_w = np.where(first_is_1, w1, w2)
    second_kept = first_w < budget
    keep = np.ones(len(ids), bool)
    second_doc_pos = np.where(
        first_is_1, np.arange(n_keys, len(ids)),
        np.arange(two_row),
    )
    keep[second_doc_pos] = second_kept
    want = np.sort(ids[keep])
    assert got_ids.shape == want.shape and (got_ids == want).all()

    driver_delta = peak - base
    # the OLD implementation held a 1M-entry key set + per-key dicts +
    # frozensets on the driver (>100 MB); the distributed state keeps
    # the driver to bookkeeping
    assert driver_delta < 48_000_000, (
        f"driver heap grew {driver_delta} bytes for 1M distinct keys"
    )
