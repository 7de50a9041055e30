"""Text-analysis operators for training-data pipelines over the
``documents`` table — language ID, quality scoring, token counting,
document fingerprinting. All whole-batch vectorized ``map_batches``
stages (pyarrow split/is_in/regex kernels + numpy segment reductions;
no per-doc Python loops); stateful pieces (compiled patterns, hint
token sets) live in actor ``__init__``.

(The reference's text surface is its text index strategies,
``core/index/.../text/TextIndexStrategy.java`` — FORWARD/REVERSE/NGRAM
term extraction; our n-gram language ID and fingerprints reuse that
n-gram machinery shape.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import _flat_string_array, _powers

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it")

# tiny deterministic per-language character/stopword profiles for the
# n-gram heuristic language id
_LANG_HINTS = {
    "en": {"the", "and", "is", "a", "of"},
    "de": {"der", "und", "die", "das", "ist"},
    "fr": {"le", "la", "et", "les", "des"},
    "es": {"el", "la", "los", "y", "de"},
}


def _split_tokens(texts: pa.Array | pa.ChunkedArray):
    """Vectorized single-space tokenization with empties dropped.

    Returns ``(flat_tokens: StringArray incl. empties, doc_all: int64
    per flat token, keep: bool mask, n_docs)`` — DuckDB
    ``list_filter(str_split(text,' '), x -> x <> '')`` semantics."""
    texts = _flat_string_array(texts)
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    lst = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(lst)
    counts_all = pc.list_value_length(lst).to_numpy().astype(np.int64)
    doc_all = np.repeat(np.arange(len(texts), dtype=np.int64), counts_all)
    keep = pc.binary_length(flat).to_numpy().astype(np.int64) > 0
    return flat, doc_all, keep, len(texts)


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_chars_calc, n_stopwords) — one pyarrow
    split pass + bincounts; stopword membership via ``pc.is_in``
    (exact, vectorized)."""
    texts = batch.column("text")
    flat, doc_all, keep, n_docs = _split_tokens(texts)
    n_tokens = np.bincount(doc_all[keep], minlength=n_docs).astype(np.int64)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(
        doc_all[keep & is_stop.astype(bool)], minlength=n_docs
    ).astype(np.int64)
    n_chars = pc.utf8_length(_flat_string_array(texts)).to_numpy().astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_chars_calc": pa.array(n_chars, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
        }
    )


class QualityScorer:
    """Actor-pool stage: length/punct/stopword quality signals.

    Integer signals match the SQL oracle; the float ``quality`` score
    is engine-only (pytest-verified)."""

    def __init__(self):
        self.punct_re = r"[.,;:!?]"
        self.stop = pa.array(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        flat, doc_all, keep, n_docs = _split_tokens(texts)
        n_tokens = np.bincount(doc_all[keep], minlength=n_docs).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=self.stop).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            doc_all[keep & is_stop.astype(bool)], minlength=n_docs
        ).astype(np.int64)
        n_punct = (
            pc.count_substring_regex(_flat_string_array(texts), self.punct_re)
            .to_numpy()
            .astype(np.int64)
        )
        ntok = np.maximum(n_tokens, 1)
        quality = (
            np.clip(n_tokens / 100.0, 0, 1) * 0.5
            + np.clip(n_stop / ntok * 5.0, 0, 1) * 0.3
            + np.clip(1.0 - n_punct / ntok, 0, 1) * 0.2
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "quality": pa.array(quality, pa.float64()),
            }
        )


class LangId:
    """Heuristic language ID from DISTINCT-stopword-hit counts per
    language (n-gram-style profile matching); deterministic tie-break
    by language code. Vectorized: one ``pc.is_in`` per hint word,
    per-doc any() via bincount."""

    def __init__(self):
        self.profiles = sorted((k, sorted(v)) for k, v in _LANG_HINTS.items())

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_all, keep, n_docs = _split_tokens(batch.column("text"))
        doc_kept = doc_all[keep]
        flat_kept = flat.filter(pa.array(keep))
        best = np.full(n_docs, "und", dtype=object)
        best_n = np.zeros(n_docs, dtype=np.int64)
        for lang, hints in self.profiles:
            hits = np.zeros(n_docs, dtype=np.int64)
            for w in hints:
                m = pc.equal(flat_kept, w).to_numpy(zero_copy_only=False).astype(bool)
                # distinct-token semantics: a hint counts once per doc
                hits += np.bincount(doc_kept[m], minlength=n_docs) > 0
            better = hits > best_n
            best[better] = lang
            best_n[better] = hits[better]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(best.tolist(), pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Rolling-hash document fingerprint: min of 64-bit rolling hashes
    over character windows (winnowing-style single fingerprint).
    Vectorized across the batch: the polynomial window hashes are
    computed over the concatenated UTF-8 buffer with ``window`` shifted
    adds, then reduced per doc with ``minimum.reduceat``; windows that
    would cross a doc boundary are masked. Docs shorter than ``window``
    are space-padded (closed form on their own bytes)."""
    B = np.uint64(1099511628211)
    texts = _flat_string_array(batch.column("text"))
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    n_docs = len(texts)
    offsets = np.frombuffer(texts.buffers()[1], dtype=np.int64)[
        texts.offset : texts.offset + n_docs + 1
    ]
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ].astype(np.uint64)
    starts = (offsets[:-1] - offsets[0]).astype(np.int64)
    ends = (offsets[1:] - offsets[0]).astype(np.int64)
    lens = ends - starts
    fps = np.full(n_docs, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if len(data) >= window:
            m = len(data) - window + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(window):
                h = h * B + data[j : j + m]
            # window at position p is valid iff it lies inside one doc:
            # owner(p) via searchsorted, and p+window <= end(owner)
            pos = np.arange(m, dtype=np.int64)
            owner = np.searchsorted(ends, pos, side="right")
            valid = (pos >= starts[owner]) & (pos + window <= ends[owner])
            h_masked = np.where(valid, h, np.iinfo(np.uint64).max)
            long_docs = np.nonzero(lens >= window)[0]
            if len(long_docs):
                s = np.minimum(starts[long_docs], m - 1)
                mins = np.minimum.reduceat(h_masked, s)
                fps[long_docs] = mins
        # short docs: pad with spaces to one window (closed form)
        short = np.nonzero(lens < window)[0]
        pw = _powers(window)[::-1].copy()  # [B^(w-1) ... B^0]
        for d in short:  # rare; bounded by count of sub-8-char docs
            seg = data[starts[d] : ends[d]]
            padded = np.full(window, 32, dtype=np.uint64)
            padded[: len(seg)] = seg
            fps[d] = np.sum(padded * pw, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps.astype(np.int64), pa.int64()),
        }
    )


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens): BPE-style pre-tokenizer count — maximal
    runs of [A-Za-z]+, [0-9]+ or [^A-Za-z0-9 ]+ (space delimits,
    class changes split), i.e. exactly
    ``len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+'))``.

    One vectorized pass over the batch's UTF-8 byte buffer: byte ->
    class id, run starts = class transitions plus forced doc starts,
    per-doc counts via ``add.reduceat``. Byte-level equals char-level
    for any UTF-8 input (continuation bytes are >= 0x80, never
    letters/digits/space)."""
    texts = _flat_string_array(batch.column("text"))
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    n_docs = len(texts)
    offsets = np.frombuffer(texts.buffers()[1], dtype=np.int64)[
        texts.offset : texts.offset + n_docs + 1
    ]
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    lo, hi = int(offsets[0]), int(offsets[-1])
    seg = data[lo:hi]
    counts = np.zeros(n_docs, dtype=np.int64)
    if len(seg):
        cls = np.full(len(seg), 3, dtype=np.int8)
        cls[((seg >= 65) & (seg <= 90)) | ((seg >= 97) & (seg <= 122))] = 0
        cls[(seg >= 48) & (seg <= 57)] = 1
        cls[seg == 32] = 2
        start = np.ones(len(seg), dtype=bool)
        start[1:] = cls[1:] != cls[:-1]
        doc_starts = (offsets[:-1] - lo).astype(np.int64)
        start[doc_starts[doc_starts < len(seg)]] = True
        tok = (start & (cls != 2)).astype(np.int64)
        lens = np.diff(offsets)
        # sentinel zero: trailing empty docs have start == len(seg);
        # clamping that index would truncate the PREVIOUS doc's count
        tok = np.concatenate([tok, np.zeros(1, dtype=np.int64)])
        counts = np.add.reduceat(tok, doc_starts)
        counts[lens == 0] = 0  # reduceat artifacts for empty docs
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pa.array(counts, pa.int64()),
        }
    )


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1
    quality rules): fraction of tokens taken by the single most
    frequent token, and fraction of duplicate (non-distinct) bigrams.

    Whole-batch vectorized: one split pass, one dictionary encode,
    bincount/unique segment reductions — no per-doc Python. Fractions
    are a single int/int division on both engine and oracle sides, so
    values are bit-comparable."""
    flat, doc_all, keep, n_docs = _split_tokens(batch.column("text"))
    doc_f = doc_all[keep]
    enc = pc.dictionary_encode(flat.filter(pa.array(keep)))
    tok = np.asarray(enc.indices, dtype=np.int64)
    vsize = len(enc.dictionary)
    n_tokens = np.bincount(doc_f, minlength=n_docs).astype(np.int64)

    # top-unigram count per doc: unique (doc, token) with counts, max per doc
    top = np.zeros(n_docs, dtype=np.int64)
    if len(tok):
        key = doc_f * max(vsize, 1) + tok
        uk, cnt = np.unique(key, return_counts=True)
        np.maximum.at(top, (uk // max(vsize, 1)).astype(np.int64), cnt)

    # bigrams: consecutive token pairs within a doc (order preserved by
    # the boolean filter above)
    n_bigrams = np.maximum(n_tokens - 1, 0)
    distinct_bg = np.zeros(n_docs, dtype=np.int64)
    if len(tok) >= 2:
        same_doc = doc_f[1:] == doc_f[:-1]
        bd = doc_f[:-1][same_doc]
        pairs = np.stack(
            [bd, tok[:-1][same_doc], tok[1:][same_doc]], axis=1
        )
        ub = np.unique(pairs, axis=0)
        distinct_bg = np.bincount(ub[:, 0], minlength=n_docs).astype(np.int64)

    ntok = np.maximum(n_tokens, 1)
    nbg = np.maximum(n_bigrams, 1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "top_unigram_frac": pa.array(top / ntok, pa.float64()),
            "dup_bigram_frac": pa.array(
                np.where(n_bigrams > 0, (n_bigrams - distinct_bg) / nbg, 0.0),
                pa.float64(),
            ),
        }
    )


class PatternScrubber:
    """Actor-pool stage: count + redact occurrences of a compiled
    regex (PII-scrub role over web text — emails/phones/ids in real
    corpora). Pattern state lives in ``__init__``; per batch it is two
    RE2 kernel passes (count + global replace), no Python loops.

    Both pyarrow and DuckDB use RE2 leftmost-nonoverlapping semantics,
    so match counts and redacted lengths are oracle-exact."""

    def __init__(self, pattern: str, replacement: str = "*"):
        self.pattern = pattern
        self.replacement = replacement

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = _flat_string_array(batch.column("text"))
        if texts.null_count:
            texts = pc.fill_null(texts, "")
        n = pc.count_substring_regex(texts, self.pattern)
        red = pc.replace_substring_regex(texts, self.pattern, self.replacement)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_matches": n.cast(pa.int64()),
                "n_chars_redacted": pc.utf8_length(red).cast(pa.int64()),
            }
        )


def document_frequency(ds, exchange_blocks: int | None = None):
    """Per-term document frequency: per-batch partial (unique
    (doc, term) → per-term counts, the classic combiner) followed by
    one bounded groupby-sum over term partials.  A doc lives entirely
    inside one batch, so batch-local distinct-doc counts sum exactly.
    ``exchange_blocks`` defaults to the CPU-scaled exchange width."""
    if exchange_blocks is None:
        exchange_blocks = _xb()
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        flat, doc_all, keep, _ = _split_tokens(batch.column("text"))
        tok = flat.to_numpy(zero_copy_only=False)[keep]
        docs_ = doc_all[keep]
        if len(tok) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "df_part": pa.array([], pa.int64())}
            )
        codes, uniq = pd.factorize(tok)
        key = docs_ * np.int64(len(uniq)) + codes
        ucodes = (np.unique(key) % np.int64(len(uniq))).astype(np.int64)
        dfc = np.bincount(ucodes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"term": pa.array(uniq, pa.string()),
             "df_part": pa.array(dfc, pa.int64())}
        )

    return (
        ds.repartition(exchange_blocks)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"))
    )


def tfidf_topk(ds, k: int = 3, decimals: int = 6,
               broadcast_limit: int | None = None):
    """Top-``k`` TF-IDF terms per document with rank.

    ``score = tf_count * ln((1 + N) / (1 + df))`` — integer counts and
    the identical IEEE double expression on both the engine and the
    DuckDB oracle, so ranking (ties broken by term ascending) is
    deterministic; the reported score is rounded to ``decimals``.

    Scale shape (VERDICT r3 #3 — the vocabulary-sized df table is
    NEVER collected whole onto the driver): :func:`document_frequency`
    runs its combinered groupby, the result is keyed by a term hash
    and pinned as a :class:`DistributedHashedTable` (one broadcast
    object under the 4 GB rule; per-bucket object-store chunks above
    it, the driver touching one block at a time). The per-doc pass is
    a stateless map probing that state per distinct term of the batch
    (hash searchsorted + bulk Arrow text verify — exact under 64-bit
    collisions) — no token-level shuffle.
    """
    import pandas as pd

    from .hashing import hash_utf8 as _hash_utf8
    from .state.broadcast import hashed_table_from_reduced

    n_docs = ds.count()

    def add_hash(t: pa.Table) -> pa.Table:
        h = (_hash_utf8(t.column("term")) >> np.uint64(1)).astype(np.int64)
        return t.append_column("term_hash", pa.array(h, pa.int64()))

    from .state.broadcast import BROADCAST_LIMIT

    df_state = hashed_table_from_reduced(
        document_frequency(ds).map_batches(
            add_hash, batch_format="pyarrow", batch_size=None
        ),
        "term_hash",
        _xb(),
        broadcast_limit if broadcast_limit is not None else BROADCAST_LIMIT,
    )

    def topk(batch: pa.Table) -> pd.DataFrame:
        flat, doc_all, keep, _ = _split_tokens(batch.column("text"))
        tok = flat.to_numpy(zero_copy_only=False)[keep]
        docs_ = doc_all[keep]
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "rank": pd.Series([], dtype=np.int64),
                "tfidf": pd.Series([], dtype=np.float64),
            }
        )
        if len(tok) == 0:
            return empty
        codes, uniq = pd.factorize(tok)
        key2 = docs_ * np.int64(len(uniq)) + codes
        ukey, cnt = np.unique(key2, return_counts=True)
        d_l = (ukey // np.int64(len(uniq))).astype(np.int64)
        c_l = (ukey % np.int64(len(uniq))).astype(np.int64)
        uniq_arr = pa.array(uniq, pa.string())
        uh = (_hash_utf8(uniq_arr) >> np.uint64(1)).astype(np.int64)
        found, vals = df_state.lookup(uh, uniq_arr, "term", ("df",))
        # every batch term has df >= 1 by construction
        assert found.all()
        idf = np.log((1.0 + float(n_docs)) / (1.0 + vals["df"].astype(np.float64)))
        score = cnt.astype(np.float64) * idf[c_l]
        doc_ids = batch.column("doc_id").to_numpy()
        out = pd.DataFrame(
            {"doc_id": doc_ids[d_l], "term": uniq[c_l], "score": score}
        )
        out = out.sort_values(
            ["doc_id", "score", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
        out = out[out["rank"] <= k]
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(),
                "term": out["term"].to_numpy(),
                "rank": out["rank"].to_numpy().astype(np.int64),
                "tfidf": np.round(out["score"].to_numpy(), decimals),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow", batch_size=None)


def quota_sample_per_key(
    ds,
    key_col: str,
    k: int = 5,
    id_col: str = "url",
    n_buckets: int = 64,
):
    """Per-key quota sampling — cap the corpus at ``k`` documents per
    key (the per-domain cap of published web-corpus curation
    pipelines). Deterministic: within a key, rows rank by
    ``(hash64(id), id)`` so the sample is stable across runs and
    parallelism levels.

    Scale shape: stage 1 prunes every block to its LOCAL top-k per key
    (one vectorized lexsort + run-length rank — no Python loop), so at
    most ``k`` rows per (key, block) enter the exchange; stage 2 is one
    bounded bucket groupby (key-hash mod ``n_buckets``) whose in-group
    final rank is again a single lexsort. No global funnel — unlike
    ``agg.grouped_topk`` (kNN-shaped, repartition(1) merge), this stays
    distributed when keys number in the millions.

    Output columns: ``[key_col, 'rank', id_col]``, rank 1..k.
    """
    from .hashing import hash_utf8

    def _ranked_prune(t: pa.Table, cap: int) -> pa.Table:
        key = t.column(key_col).combine_chunks().dictionary_encode()
        codes = key.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        srt = pa.table(
            {"c": pa.array(codes), "h": t.column("_hkey"), "i": t.column(id_col)}
        )
        order = pc.sort_indices(
            srt,
            sort_keys=[("c", "ascending"), ("h", "ascending"), ("i", "ascending")],
        ).to_numpy()
        sc = codes[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        rank = np.arange(len(sc)) - np.repeat(starts, np.diff(np.r_[starts, len(sc)]))
        keep_mask = rank < cap
        out = t.take(pa.array(order[keep_mask]))
        return out.append_column(
            "rank", pa.array((rank[keep_mask] + 1).astype(np.int64))
        )

    def partial(b: pa.Table) -> pa.Table:
        h = (hash_utf8(b.column(id_col)) >> np.uint64(1)).astype(np.int64)
        kh = (hash_utf8(b.column(key_col)) % np.uint64(n_buckets)).astype(np.int64)
        t = pa.table(
            {
                key_col: b.column(key_col),
                id_col: b.column(id_col),
                "_hkey": pa.array(h, pa.int64()),
                "_bucket": pa.array(kh, pa.int64()),
            }
        )
        return _ranked_prune(t, k).drop_columns(["rank"])

    def final(g: pa.Table) -> pa.Table:
        out = _ranked_prune(g, k)
        return out.select([key_col, "rank", id_col])

    # coalesce before the bucketed exchange (per-block scheduling
    # overhead dominates tiny blocks — NOTES_r2)
    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(_xb())
        .groupby("_bucket")
        .map_groups(final, batch_format="pyarrow")
    )


def pack_token_shards(
    ds,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    id_range: tuple[int, int] | None = None,
):
    """Token-budget shard packing (the GPT-style sequence-packing
    front-end of training-data pipelines): concatenate documents in
    ``id_col`` order and cut every ``budget`` tokens; a document's
    ``shard_id`` is the cut its FIRST token falls into, i.e.
    ``shard_id = (tokens strictly before the doc) // budget``.

    This is a distributed PREFIX SCAN, not a groupby: the running sum
    over the global id order is computed in three bounded passes —
    (1) an id min/max aggregate, (2) per-id-range-bucket token totals
    (one tiny combinered exchange: ``n_buckets`` rows reach the
    driver, never the tokens), whose exclusive cumulative sums become
    broadcast bucket offsets, and (3) ONE bounded bucket exchange
    where each bucket sorts its own rows by id and adds its offset to
    the in-bucket cumulative sum. Nothing full-corpus ever sits on
    the driver; at 100 TB raise ``n_buckets`` so a bucket fits a
    worker (and swap the even id-split for manifest quantiles if ids
    are sparse — the offsets stay one small array either way).

    Output: ``(id_col, n_tokens, shard_id)``.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from .hashing import tokenize_hash
    from .util import cached_state

    if budget <= 0:
        raise ValueError("budget must be positive")
    if id_range is None:
        mm = ds.aggregate(Min(id_col), Max(id_col))
        lo, hi = int(mm[f"min({id_col})"]), int(mm[f"max({id_col})"])
    else:
        lo, hi = int(id_range[0]), int(id_range[1])
    span = max(hi - lo + 1, 1)

    def _bucket_of(ids: np.ndarray) -> np.ndarray:
        b = (ids.astype(np.int64) - lo) * np.int64(n_buckets) // np.int64(span)
        return np.clip(b, 0, n_buckets - 1)

    def counted(b: pa.Table) -> pa.Table:
        _, _, ntok = tokenize_hash(b.column(text_col))
        ids = b.column(id_col).to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "_bucket": pa.array(_bucket_of(ids), pa.int64()),
            }
        )

    counts = ds.map_batches(counted, batch_format="pyarrow", batch_size=None)

    def bucket_partial(b: pa.Table) -> pa.Table:
        bk = b.column("_bucket").to_numpy()
        tot = np.bincount(bk, weights=b.column("n_tokens").to_numpy(),
                          minlength=n_buckets).astype(np.int64)
        nz = np.flatnonzero(tot)
        return pa.table(
            {"_bucket": pa.array(nz, pa.int64()),
             "t_part": pa.array(tot[nz], pa.int64())}
        )

    sums = (
        counts.map_batches(bucket_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_bucket")
        .aggregate(Sum("t_part", alias_name="t"))
        .to_pandas()
    )
    totals = np.zeros(n_buckets, dtype=np.int64)
    totals[sums["_bucket"].to_numpy()] = sums["t"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    ref = ray.put(offsets)
    key = ("pack_offsets", ref.hex())

    def final(g: pa.Table) -> pa.Table:
        offs = cached_state(key, ref)
        ids = g.column(id_col).to_numpy().astype(np.int64)
        ntok = g.column("n_tokens").to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="mergesort")
        start = offs[int(g.column("_bucket")[0].as_py())] + np.concatenate(
            [[0], np.cumsum(ntok[order])[:-1]]
        )
        shard = start // np.int64(budget)
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "n_tokens": pa.array(ntok[order], pa.int64()),
                "shard_id": pa.array(shard, pa.int64()),
            }
        )

    return counts.groupby("_bucket").map_groups(final, batch_format="pyarrow")


def unigram_logprob(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
):
    """Corpus-unigram LM scoring (the perplexity-filter role of
    published web-corpus pipelines, with the corpus itself as the LM):
    ``nll(doc) = -mean over tokens of log2(count(token) / N_total)``,
    rounded to ``decimals``. High values = improbable token mix; a
    downstream filter drops the tails.

    Scale shape: pass 1 builds the global token-occurrence table by
    batch-local combine + one vocabulary-bounded groupby-sum (token
    HASHES ride the exchange, never text); the (hash → count) table —
    vocabulary-sized, ≪ corpus — broadcasts once via ``ray.put`` with
    a per-worker memo. Pass 2 streams the corpus through one
    stateless searchsorted lookup + segment mean (``np.add.reduceat``)
    per batch. Token identity is the shared 64-bit hash (collisions
    merge counts — same whp convention as the sketch oracles). Docs
    with zero tokens are dropped (no defined mean).

    Output: ``(id_col, n_tokens, nll)``.
    """
    import ray
    from ray.data.aggregate import Sum

    from .hashing import tokenize_hash
    from .util import cached_state

    def tf_partial(batch: pa.Table) -> pa.Table:
        th, _, _ = tokenize_hash(batch.column(text_col))
        if len(th) == 0:
            return pa.table(
                {"_th": pa.array([], pa.int64()),
                 "c_part": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(th, return_counts=True)
        return pa.table(
            {"_th": pa.array(uniq.view(np.int64), pa.int64()),
             "c_part": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    cp = (
        ds.map_batches(tf_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_th")
        .aggregate(Sum("c_part", alias_name="c"))
        .to_pandas()
    )
    vocab = np.sort(cp["_th"].to_numpy().view(np.uint64))
    order = np.argsort(cp["_th"].to_numpy().view(np.uint64), kind="mergesort")
    counts = cp["c"].to_numpy().astype(np.int64)[order]
    n_total = int(counts.sum())
    ref = ray.put((vocab, counts, n_total))
    key = ("unigram_lm", ref.hex())

    def build(state):
        v, c, n = state
        return v, -np.log2(c.astype(np.float64) / float(n))

    def score(batch: pa.Table) -> pa.Table:
        v, nlp = cached_state(key, ref, builder=build)
        th, doc, ntok = tokenize_hash(batch.column(text_col))
        ids = batch.column(id_col).to_numpy()
        n_docs = len(ids)
        per_tok = nlp[np.searchsorted(v, th)]
        sums = np.zeros(n_docs, dtype=np.float64)
        if len(th):
            first = np.searchsorted(doc, np.arange(n_docs))
            # sentinel zero keeps starts at the buffer end (trailing
            # zero-token docs) valid without truncating the preceding
            # doc's segment
            ext = np.concatenate([per_tok, np.zeros(1, dtype=np.float64)])
            seg = np.add.reduceat(ext, first)
            sums[ntok > 0] = seg[ntok > 0]
        keep = ntok > 0
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                "n_tokens": pa.array(ntok[keep], pa.int64()),
                "nll": pa.array(
                    np.round(sums[keep] / ntok[keep], decimals), pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def top_ngrams(ds, n: int = 2, k: int = 20, exchange_blocks: int | None = None):
    """Corpus-wide top-``k`` word ``n``-grams with counts and rank —
    the vocabulary/boilerplate census of web-corpus curation (what you
    run before choosing dedup thresholds and stopword lists).

    Scale shape: per block ONE tokenize pass builds gram strings
    vectorized (``binary_join_element_wise`` over shifted token
    arrays), combines to (gram, partial_count) via a factorize +
    bincount — so the exchange ships one row per DISTINCT gram per
    block, never tokens. Grams are routed to buckets by their 64-bit
    hash; each bucket sums partials and keeps only its LOCAL top-k
    (exact: a gram lives in exactly one bucket), and the driver merges
    ``buckets x k`` rows — bounded by k, not by vocabulary.

    Ranking is deterministic: count desc, gram asc; ``rank`` is
    1-based. Returns a pyarrow Table (small result)."""
    if exchange_blocks is None:
        exchange_blocks = _xb()
    import pandas as pd

    from .hashing import hash_utf8

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gram": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int64())}
        )
        flat, doc_all, keep, _ = _split_tokens(batch.column("text"))
        toks = flat.filter(pa.array(keep))
        doc = doc_all[keep]
        m = len(toks) - (n - 1)
        if m <= 0:
            return empty
        valid = doc[:m] == doc[n - 1 : n - 1 + m]
        if not valid.any():
            return empty
        parts = []
        for j in range(n):
            parts.append(toks.slice(j, m).filter(pa.array(valid)))
        sep = pa.scalar(" ", parts[0].type)  # match large_string inputs
        grams = pc.binary_join_element_wise(*parts, sep)
        codes, uniq = pd.factorize(grams.to_numpy(zero_copy_only=False))
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        ug = pa.array(uniq, pa.string())
        bucket = (hash_utf8(ug) % np.uint64(exchange_blocks)).astype(np.int64)
        return pa.table(
            {"gram": ug, "cnt": pa.array(cnt, pa.int64()),
             "bucket": pa.array(bucket, pa.int64())}
        )

    def bucket_topk(g: pa.Table) -> pa.Table:
        tot = pa.TableGroupBy(g, "gram").aggregate([("cnt", "sum")])
        tot = tot.rename_columns(["gram", "cnt"]).sort_by(
            [("cnt", "descending"), ("gram", "ascending")]
        )
        return tot.slice(0, k)

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(exchange_blocks)
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pyarrow")
        .take_all()
    )
    merged = pd.DataFrame(rows, columns=["gram", "cnt"])
    merged = merged.sort_values(
        ["cnt", "gram"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.table(
        {
            "gram": pa.array(merged["gram"].to_numpy(), pa.string()),
            "cnt": pa.array(merged["cnt"].to_numpy(), pa.int64()),
            "rank": pa.array(np.arange(1, len(merged) + 1), pa.int64()),
        }
    )


def blocklist_filter(
    ds,
    blocked_domains,
    url_col: str = "url",
    invert: bool = False,
):
    """URL domain blocklist filter (the UT1/adult-blocklist role of
    published web-corpus pipelines): drop every row whose url host
    equals a blocked domain OR is a subdomain of one (suffix match at
    a label boundary — ``ads.site3.example`` matches ``site3.example``
    but ``notsite3.example`` does not).

    Scale shape: the blocklist (thousands to millions of entries)
    ships once via ``ray.put`` and is worker-cached grouped by label
    count; each batch runs one anchored ``extract_regex`` per DISTINCT
    label count in the list (a handful) + ``pc.is_in`` — fully
    vectorized, zero shuffle. ``invert=True`` keeps only the blocked
    rows (audit mode)."""
    import ray

    from .util import cached_state

    by_depth: dict[int, list[str]] = {}
    for d in blocked_domains:
        d = d.strip().lower().strip(".")
        if d:
            by_depth.setdefault(d.count(".") + 1, []).append(d)
    ref = ray.put(by_depth)
    key = ("blocklist", ref.hex())

    def build(state):
        return {
            c: pa.array(sorted(set(v)), pa.string()) for c, v in state.items()
        }

    def filt(batch: pa.Table) -> pa.Table:
        depth_sets = cached_state(key, ref, builder=build)
        urls = batch.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        st = pc.extract_regex(
            pc.utf8_lower(pc.fill_null(urls, "")), r"^[a-z][a-z0-9+.-]*://(?P<host>[^/:?#]+)"
        )
        host = pc.fill_null(st.field("host") if len(st) else pa.array([], pa.string()), "")
        blocked = np.zeros(len(batch), dtype=bool)
        for c, entries in depth_sets.items():
            # last c labels of the host, anchored at a dot boundary
            pat = "(?:^|\\.)(?P<sfx>(?:[^.]+\\.){%d}[^.]+)$" % (c - 1)
            sfx = pc.extract_regex(host, pat)
            lab = sfx.field("sfx") if len(sfx) else pa.array([], host.type)
            hit = pc.fill_null(pc.is_in(lab, value_set=entries), False)
            blocked |= hit.to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(blocked if invert else ~blocked))

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=None)


def hash_split(
    ds,
    id_col: str = "url",
    fractions=(("train", 90), ("val", 5), ("test", 5)),
    n_buckets: int = 100,
):
    """Deterministic corpus split (train/val/test assignment): bucket =
    ``hash64(id) % n_buckets``; consecutive bucket ranges map to the
    named splits in order. Pure map-side — assignment depends only on
    the id bytes, so it is stable under reshuffling, resumable
    ingestion, and cluster-size changes (the property a training
    pipeline needs: a doc can NEVER migrate across the eval boundary).
    Weights must sum to ``n_buckets``. Zero shuffle, one vectorized
    hash pass per batch."""
    from .hashing import hash_utf8

    names = [n for n, _ in fractions]
    bounds = np.cumsum([w for _, w in fractions]).astype(np.uint64)
    if int(bounds[-1]) != n_buckets:
        raise ValueError("fractions must sum to n_buckets")
    labels = np.array(names, dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        b = hash_utf8(batch.column(id_col)) % np.uint64(n_buckets)
        idx = np.searchsorted(bounds, b, side="right")
        return batch.append_column(
            "split", pa.array(labels[idx].tolist(), pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


# the published transform chain for HTML -> text extraction (the
# C4 / RefinedWeb boilerplate-strip role): each step is ONE global
# RE2 replace, applied in this exact order on both the engine
# (pyarrow.compute) and the oracle (DuckDB regexp_replace 'g'), so
# outputs are byte-identical across the two independent regex engines
HTML_EXTRACT_STEPS: list[tuple[str, str]] = [
    # drop non-content subtrees wholesale (scripts, styles, comments)
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level closers/separators become newlines so paragraph
    # structure survives tag stripping
    (r"(?i)<(?:br|hr)\s*/?>", "\n"),
    (r"(?i)</(?:p|div|h[1-6]|li|tr|table|section|article|blockquote)>",
     "\n"),
    # every remaining tag disappears
    (r"(?s)<[^>]*>", " "),
    # minimal entity set (the named entities every page uses).
    # ORDER MATTERS: &amp; must decode LAST, else escaped entities
    # double-decode (&amp;lt; must yield the literal text "&lt;",
    # not "<")
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    # whitespace discipline: spaces/tabs collapse, newline runs
    # collapse to one, ends trimmed
    (r"[ \t\r\f]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
]


def extract_html_text_array(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Binary/string HTML column -> extracted plain text (vectorized:
    one RE2 kernel per published step, no Python per row)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if pa.types.is_binary(html.type):
        try:
            t = html.cast(pa.string())
        except pa.ArrowInvalid:
            # real crawls carry Latin-1/Shift-JIS bodies: decode
            # lossily rather than killing the whole batch (same
            # 'replace' tolerance as the WARC header parser)
            t = pa.array(
                [v.as_py().decode("utf-8", "replace")
                 if v.is_valid else None for v in html],
                pa.string(),
            )
    else:
        t = html
    t = pc.fill_null(t, "")
    for pat, repl in HTML_EXTRACT_STEPS:
        t = pc.replace_substring_regex(t, pat, repl)
    # trim with the SAME RE2 \s class the oracle uses (Arrow's
    # utf8_trim_whitespace would also strip U+00A0 etc., silently
    # breaking the byte-identical cross-engine invariant)
    return pc.replace_substring_regex(t, r"^\s+|\s+$", "")


def extract_html_text(ds, html_col: str = "html", out_col: str = "text"):
    """HTML payload column -> extracted text column (the web-pipeline
    extraction stage ahead of quality/dedup; trafilatura role).
    Map-side only, zero shuffle."""

    def ex(batch: pa.Table) -> pa.Table:
        t = extract_html_text_array(batch.column(html_col))
        out = batch.drop_columns([html_col])
        out = out.append_column(out_col, t)
        return out.append_column(
            "n_chars", pc.cast(pc.utf8_length(t), pa.int64())
        )

    return ds.map_batches(ex, batch_format="pyarrow", batch_size=None)


def chunk_documents(
    ds,
    max_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into token-bounded chunks with overlap — the
    standard pre-training prep step between extraction and sequence
    packing: chunk ``i`` covers whitespace tokens
    ``[i*(max_tokens-overlap), i*(max_tokens-overlap)+max_tokens)``;
    the last chunk keeps its tail short rather than re-padding, and a
    chunk fully contained in the previous one is not emitted.
    Map-side flat-map, zero shuffle: one split pass per batch, chunk
    assembly via offsets into the flattened token array."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap

    def fb(batch: pa.Table) -> pa.Table:
        flat, doc_all, keep, n_docs = _split_tokens(batch.column(text_col))
        doc_f = doc_all[keep]
        toks = flat.filter(pa.array(keep))
        n_tok = np.bincount(doc_f, minlength=n_docs)
        ids = batch.column(id_col)
        out_ids, out_idx, out_txt, out_n = [], [], [], []
        # per-doc token spans in the flattened array
        starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_tok, out=starts[1:])
        toks_py = toks.to_pylist()
        for d in range(n_docs):
            nt = int(n_tok[d])
            base = int(starts[d])
            # ceil(max(nt - overlap, 1) / step) chunks: the last chunk
            # keeps a short tail, and no chunk is ever fully contained
            # in its predecessor
            n_chunks = -(-max(nt - overlap, 1) // step) if nt else 0
            for ci in range(n_chunks):
                lo = ci * step
                hi = min(lo + max_tokens, nt)
                piece = toks_py[base + lo:base + hi]
                out_ids.append(ids[d].as_py())
                out_idx.append(ci)
                out_txt.append(" ".join(piece))
                out_n.append(hi - lo)
        return pa.table(
            {
                id_col: pa.array(out_ids, ids.type),
                "chunk_idx": pa.array(out_idx, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(fb, batch_format="pyarrow", batch_size=None)


def normalize_text(ds, text_col: str = "text", lowercase: bool = False):
    """Text normalization (the cleaning pass ahead of hashing/dedup so
    byte-identical-modulo-whitespace pages collapse together): control
    characters become spaces, whitespace runs collapse to one space,
    ends are trimmed, optional lowercasing. Pure map-side — three
    vectorized RE2/utf8 kernels per batch, zero shuffle, no Python
    per row. Replaces ``text_col`` in place (adds ``n_chars_norm``)."""

    def norm(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        t = pc.fill_null(t, "")
        t = pc.replace_substring_regex(t, r"[\x00-\x1f\x7f]", " ")
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        if lowercase:
            t = pc.utf8_lower(t)
        i = batch.schema.get_field_index(text_col)
        out = batch.set_column(i, text_col, t)
        return out.append_column(
            "n_chars_norm", pc.cast(pc.utf8_length(t), pa.int64())
        )

    return ds.map_batches(norm, batch_format="pyarrow", batch_size=None)


def _xb():
    from .util import exchange_blocks
    return exchange_blocks()


# ----------------------------------------------------------- URL canonical

# Canonicalization rules (the CCNet/web-pipeline URL-dedup key;
# reference parallel: dedup at the data-id level,
# core/store/.../query/filter/DedupeFilter.java — here the "data id"
# is the canonical URL):
#   1. scheme and host lowercased
#   2. default port dropped (http:80, https:443); other ports kept
#   3. fragment dropped
#   4. query params: empties and tracking params dropped (utm_*,
#      fbclid, gclid, msclkid, ref, mc_cid, mc_eid), the rest SORTED
#      and rejoined; '?' dropped when nothing survives
#   5. trailing slashes stripped from the path; empty path -> '/'
#   6. non-URL strings (no scheme://host) pass through trimmed
# IPv6 host literals are out of scope (documented; the host grammar
# is [^:]+).
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<hostport>[^/?#]+)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)
_HOSTPORT_RE = r"^(?P<host>[^:]+)(?::(?P<port>[0-9]+))?$"
_TRACKING_RE = r"^(utm_[^=&]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=.*)?$"


def canonicalize_url_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized URL canonicalization over a whole batch: one
    extract_regex for structure, one for host:port, one tracking-param
    match, and ONE Arrow sort for all rows' param ordering — no
    per-row Python."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    u0 = pc.utf8_trim_whitespace(pc.fill_null(urls, ""))
    m = pc.extract_regex(u0, _URL_RE)
    valid = m.is_valid()

    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    hm = pc.extract_regex(
        pc.utf8_lower(pc.fill_null(pc.struct_field(m, "hostport"), "")),
        _HOSTPORT_RE,
    )
    host = pc.struct_field(hm, "host")
    port = pc.fill_null(pc.struct_field(hm, "port"), "")
    default_port = pc.if_else(
        pc.equal(scheme, "http"),
        pa.scalar("80"),
        pc.if_else(pc.equal(scheme, "https"), pa.scalar("443"), pa.scalar("")),
    )
    keep_port = pc.and_(
        pc.not_equal(port, ""), pc.not_equal(port, pc.fill_null(default_port, ""))
    )
    portpart = pc.if_else(
        pc.fill_null(keep_port, False),
        pc.binary_join_element_wise(pa.scalar(":"), port, pa.scalar("")),
        pa.scalar(""),
    )

    path = pc.replace_substring_regex(
        pc.fill_null(pc.struct_field(m, "path"), ""), "/+$", ""
    )
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)

    # query params: flatten all rows' params, drop empties/tracking,
    # one global (row, param) Arrow sort, segment-rebuild, rejoin
    q = pc.fill_null(pc.struct_field(m, "query"), "")
    qlist = pc.split_pattern(q, "&")
    flat = pc.list_flatten(qlist)
    counts = pc.list_value_length(qlist).to_numpy().astype(np.int64)
    row = np.repeat(np.arange(len(u0), dtype=np.int64), counts)
    keepm = pc.and_(
        pc.not_equal(flat, ""),
        pc.invert(pc.match_substring_regex(flat, _TRACKING_RE)),
    ).to_numpy(zero_copy_only=False)
    keepm = np.asarray(keepm, dtype=bool)
    srt = pa.table(
        {"row": pa.array(row[keepm], pa.int64()), "p": flat.filter(pa.array(keepm))}
    ).sort_by([("row", "ascending"), ("p", "ascending")])
    kept_per_row = np.bincount(
        srt.column("row").to_numpy(), minlength=len(u0)
    ).astype(np.int64)
    offs = np.zeros(len(u0) + 1, dtype=np.int64)
    np.cumsum(kept_per_row, out=offs[1:])
    la = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), srt.column("p").combine_chunks()
    )
    qjoin = pc.binary_join(la, "&")
    qpart = pc.if_else(
        pc.not_equal(qjoin, ""),
        pc.binary_join_element_wise(pa.scalar("?"), qjoin, pa.scalar("")),
        pa.scalar(""),
    )

    canon = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, portpart, path, qpart, pa.scalar("")
    )
    return pc.if_else(valid, canon, u0)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canon_url"):
    """Append the canonical form of ``url_col`` as ``out_col``.
    Pure map-side, zero shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, canonicalize_url_batch(batch.column(url_col))
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def canonical_url_dedup(ds, url_col: str = "url", id_col: str = "row_id"):
    """URL-level dedup: keep the min-id row per CANONICAL url (the
    first dedup stage of a crawl pipeline — collapses tracking-param /
    case / port / fragment variants before any content hashing).
    Composition: map-side canonicalize + the two-pass exact dedup
    keyed on the canonical column (unique canonicals never shuffle;
    only duplicated ones carry their row through one bounded
    exchange)."""
    from .dedup import exact_dedup

    return exact_dedup(
        canonicalize_urls(ds, url_col=url_col),
        id_col=id_col,
        text_col="canon_url",
    )


# ------------------------------------------------------ model scoring

class LinearTextScorer:
    """Batched model-inference stage: a fastText-style linear
    classifier over hashed bag-of-words features (the quality-
    classifier slot of an LLM data pipeline; reference parallel: the
    per-feature scoring UDFs of
    ``analytics/spark/sparksql/udf/GeomFunction.java`` generalized to
    text).  Used as a CALLABLE CLASS with ``map_batches(cls,
    concurrency=N)``: the weight table materializes ONCE per actor in
    ``__init__`` (the model-load slot — swap the deterministic table
    for a real checkpoint read), and ``__call__`` scores a whole batch
    with two vectorized passes (tokenize+hash, bincount gather).

    Weights are INTEGER milli-units derived from the bucket id
    (``w[b] = (b*2654435761 + seed) % 2001 - 1000``) so the score is
    an exact integer sum — bit-replicable in SQL (float64 accumulation
    of integers this small is exact in any order)."""

    def __init__(self, n_buckets: int = 4096, seed: int = 0, text_col: str = "text"):
        b = np.arange(n_buckets, dtype=np.uint64)
        self.w = (
            ((b * np.uint64(2654435761) + np.uint64(seed)) % np.uint64(2001))
            .astype(np.int64)
            - 1000
        )
        self.n_buckets = n_buckets
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashing import tokenize_hash

        th, doc, _ = tokenize_hash(batch.column(self.text_col))
        bk = ((th >> np.uint64(1)) % np.uint64(self.n_buckets)).astype(np.int64)
        s = np.bincount(
            doc, weights=self.w[bk].astype(np.float64), minlength=len(batch)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score_milli": pa.array(s, pa.int64()),
                "label": pa.array((s > 0).astype(np.int64), pa.int64()),
            }
        )


def score_documents(ds, n_buckets: int = 4096, seed: int = 0, concurrency: int = 2):
    """Actor-pool scoring pass: weights load once per actor, batches
    stream through; zero shuffle."""
    return ds.map_batches(
        LinearTextScorer,
        fn_constructor_kwargs={"n_buckets": n_buckets, "seed": seed},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def mixture_sample(
    ds,
    key_col: str,
    target: dict[str, float],
    n_total: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
):
    """Domain-mixture resampling (the DSIR / DoReMi domain-reweighting
    role, deterministic form): sample the corpus so each ``key_col``
    domain contributes ``round(target[k] * n_total)`` rows; domains
    absent from ``target`` are dropped, and a domain with fewer rows
    than its quota contributes everything it has.  Selection within a
    domain is by ``(hash64(id), id)`` rank, so the sample is identical
    across runs and parallelism levels.

    Same two-stage scale shape as :func:`quota_sample_per_key` — block-
    local top-quota prune, then ONE bounded key-hash bucket exchange —
    but with a per-key cap vectorized through a dictionary lookup over
    each batch's UNIQUE keys (never per row).  Output:
    ``[key_col, 'rank', id_col]``, rank 1..quota."""
    import ray

    from .hashing import hash_utf8

    quotas = {k: int(round(f * n_total)) for k, f in target.items()}
    qref = ray.put(quotas)

    def _capped_prune(t: pa.Table) -> pa.Table:
        from .util import cached_state

        q: dict = cached_state(("mixq", qref.hex()), qref)
        key = t.column(key_col).combine_chunks().dictionary_encode()
        codes = key.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        caps_u = np.array(
            [q.get(k, 0) for k in key.dictionary.to_pylist()], dtype=np.int64
        )
        srt = pa.table(
            {"c": pa.array(codes), "h": t.column("_hkey"), "i": t.column(id_col)}
        )
        order = pc.sort_indices(
            srt,
            sort_keys=[("c", "ascending"), ("h", "ascending"), ("i", "ascending")],
        ).to_numpy()
        sc = codes[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        rank = np.arange(len(sc)) - np.repeat(starts, np.diff(np.r_[starts, len(sc)]))
        keep_mask = rank < caps_u[sc]
        out = t.take(pa.array(order[keep_mask]))
        return out.append_column(
            "rank", pa.array((rank[keep_mask] + 1).astype(np.int64))
        )

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_s = ids if pa.types.is_string(ids.type) else pc.cast(ids, pa.string())
        h = (hash_utf8(ids_s) >> np.uint64(1)).astype(np.int64)
        kh = (hash_utf8(b.column(key_col)) % np.uint64(n_buckets)).astype(np.int64)
        t = pa.table(
            {
                key_col: b.column(key_col),
                id_col: b.column(id_col),
                "_hkey": pa.array(h, pa.int64()),
                "_bucket": pa.array(kh, pa.int64()),
            }
        )
        return _capped_prune(t).drop_columns(["rank"])

    def final(g: pa.Table) -> pa.Table:
        return _capped_prune(g).select([key_col, "rank", id_col])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(_xb())
        .groupby("_bucket")
        .map_groups(final, batch_format="pyarrow")
    )


def remove_dup_lines(
    docs: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Within-document duplicate-line removal (the RefinedWeb /
    CCNet-style "remove repeated lines within a page" cleanup; the
    reference has no text ops — this extends the engine's LLM-corpus
    surface). Each document keeps the FIRST occurrence of every
    distinct line, preserving original line order. Purely map-side
    (zero shuffle): per batch, one split -> dictionary-encode ->
    first-occurrence mask -> list rebuild + join, no per-row Python.

    Exactness: dedup keys are the line TEXTS (dictionary codes), not
    hashes — no collision caveat; the SQL oracle's
    group-by-(doc, line) min-ordinal replica matches byte-for-byte.
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lst = pc.split_pattern(texts, "\n")
        flat = pc.list_flatten(lst)
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        n_docs = len(counts)
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        codes = (
            pc.dictionary_encode(flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # first occurrence of (doc, code), preserving original order:
        # lexsort by (code, doc) finds firsts; keep mask back in
        # original positions keeps ordering stable
        order = np.lexsort((np.arange(len(doc)), codes, doc))
        ds_, cs_ = doc[order], codes[order]
        first = np.ones(len(order), bool)
        first[1:] = (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1])
        keep = np.zeros(len(doc), bool)
        keep[order[first]] = True
        kept_counts = np.bincount(doc[keep], minlength=n_docs).astype(np.int64)
        offsets = np.zeros(n_docs + 1, np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        kept_lines = flat.filter(pa.array(keep))
        rebuilt = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()).cast(pa.int32()), kept_lines
        )
        joined = pc.binary_join(rebuilt, pa.scalar("\n", kept_lines.type))
        return pa.table(
            {
                id_col: batch.column(id_col),
                text_col: joined,
                "n_lines": pa.array(counts, pa.int64()),
                "n_kept": pa.array(kept_counts, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=None)


def budget_head_sample(
    docs: ray.data.Dataset,
    budget: int,
    key_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    bins: int = 256,
    collect_threshold: int = 100_000,
    max_rounds: int = 10,
    n_buckets: int = 256,
    broadcast_limit: int | None = None,
) -> ray.data.Dataset:
    """EXACT per-key budget head sampling: order each key's docs by the
    deterministic shuffle key ``(hash64(id) >> 1, id)`` and keep docs
    while the EXCLUSIVE cumulative weight is still below ``budget`` —
    the standard "take ~N tokens per language" corpus-mixing step, with
    the crossing doc included so every key reaches its budget.

    Scale shape (the weighted-selection sibling of
    ``stats.exact_kth_value`` — NO global sort, no per-key group
    materialization, and NO driver-resident per-key state, so the key
    column may have millions of distinct values): each round one
    streaming pass histograms weights by hash bin per key (block-local
    (key, bin) partials), a ``groupby(key-hash)`` exchange of those
    bounded partials walks each key's bins to the budget-crossing bin
    and narrows; when the crossing bin's candidate count fits
    ``collect_threshold`` a survivors pass collects that key's window
    rows (ids + weights only) THROUGH the same exchange and resolves
    the boundary exactly, ties by id. All per-key state (active
    windows, resolved cuts, boundary include ids) lives in
    ``state.broadcast.DistributedHashedTable`` probe states — driver
    heap is bounded by one reduce block regardless of key cardinality.
    The final pass is a map-side filter.
    """
    import pyarrow.compute as pc

    from .hashing import hash_utf8, mix64
    from .state.broadcast import BROADCAST_LIMIT, hashed_table_from_reduced

    def _probe_table(ds, hash_col):
        return hashed_table_from_reduced(
            ds, hash_col, n_buckets,
            broadcast_limit=(BROADCAST_LIMIT if broadcast_limit is None
                             else broadcast_limit),
        )

    HMAX = np.int64(2**63 - 1)  # h <= 2^63-1 after >>1 (inclusive top)

    def h_of(ids: np.ndarray) -> np.ndarray:
        return (mix64(ids.astype(np.uint64)) >> np.uint64(1)).astype(np.int64)

    def key_arr(col) -> tuple[pa.Array, np.ndarray]:
        """Normalized string key column + its non-negative int64 hash.
        Key identity is ALWAYS resolved by string equality in the probe
        tables (DistributedHashedTable.lookup), so hash collisions
        cannot merge two keys."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_large_string(col.type):
            col = col.cast(pa.large_string())
        return col, (hash_utf8(col) >> np.uint64(1)).astype(np.int64)

    _HIST_SCHEMA = pa.schema(
        [("bucket", pa.int64()),
         ("kh", pa.int64()), ("key", pa.large_string()), ("b", pa.int64()),
         ("w", pa.int64()), ("n", pa.int64()), ("lo", pa.int64()),
         ("hi", pa.int64()), ("acc", pa.int64())]
    )
    _DEC_SCHEMA = pa.schema(
        [("bucket", pa.int64()),
         ("kh", pa.int64()), ("key", pa.large_string()), ("lo", pa.int64()),
         ("hi", pa.int64()), ("acc", pa.int64()), ("cross_n", pa.int64()),
         ("status", pa.int8())]  # 0=active 1=collect 2=keepall
    )
    _SRV_SCHEMA = pa.schema(
        [("bucket", pa.int64()),
         ("kh", pa.int64()), ("key", pa.large_string()), ("h", pa.int64()),
         ("id", pa.int64()), ("w", pa.int64()), ("lo", pa.int64()),
         ("acc", pa.int64())]
    )
    _RES_SCHEMA = pa.schema(
        [("bucket", pa.int64()),
         ("kh", pa.int64()), ("key", pa.large_string()), ("kind", pa.int8()),
         ("keep_all", pa.int8()), ("h_cut", pa.int64()), ("id", pa.int64())]
    )
    _CUT_SCHEMA = pa.schema(
        [("kh", pa.int64()), ("key", pa.large_string()),
         ("keep_all", pa.int8()), ("h_cut", pa.int64())]
    )
    _INC_SCHEMA = pa.schema([("ch", pa.int64()), ("kid", pa.large_string())])

    def _t(schema: pa.Schema, cols: dict) -> pa.Table:
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) if not isinstance(
                cols[f.name], (pa.Array, pa.ChunkedArray)
            ) else cols[f.name].cast(f.type) for f in schema},
            schema=schema,
        )

    # -- pass 0: distinct keys -> initial (lo=0, hi=HMAX, acc=0) state --
    def init_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _t(_DEC_SCHEMA, {c: [] for c in _DEC_SCHEMA.names})
        uniq, kh = key_arr(pc.unique(batch.column(key_col).combine_chunks()))
        z = np.zeros(len(kh), np.int64)
        return _t(_DEC_SCHEMA, {
            "bucket": kh % np.int64(n_buckets),
            "kh": kh, "key": uniq.cast(pa.large_string()), "lo": z,
            "hi": np.full(len(kh), HMAX, np.int64), "acc": z,
            "cross_n": z, "status": np.zeros(len(kh), np.int8),
        })

    def _distinct_keys(t: pa.Table) -> pa.Table:
        uniq, kh = key_arr(pc.unique(t.column("key").combine_chunks()))
        z = np.zeros(len(kh), np.int64)
        return _t(_DEC_SCHEMA, {
            "bucket": kh % np.int64(n_buckets),
            "kh": kh, "key": uniq.cast(pa.large_string()), "lo": z,
            "hi": np.full(len(kh), HMAX, np.int64), "acc": z,
            "cross_n": z, "status": np.zeros(len(kh), np.int8),
        })

    active_ds = (
        docs.map_batches(init_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_distinct_keys, batch_format="pyarrow")
        .materialize()
    )
    if active_ds.count() == 0:
        return docs  # empty input: nothing to sample

    def _decide(t: pa.Table) -> pa.Table:
        """One BUCKET group of (key, bin) partials -> per-key narrowing
        decisions, fully vectorized: keys are sub-grouped by their
        dictionary index (string identity, so kh collisions cannot
        merge two keys), per-block partials of each (key, bin) are
        merged, then one segmented cumsum finds each key's
        budget-crossing bin."""
        if t.num_rows == 0:
            return _t(_DEC_SCHEMA, {c: [] for c in _DEC_SCHEMA.names})
        enc = t.column("key").combine_chunks().dictionary_encode()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bs = t.column("b").to_numpy()
        ws = t.column("w").to_numpy()
        ns = t.column("n").to_numpy()
        los = t.column("lo").to_numpy()
        his = t.column("hi").to_numpy()
        accs = t.column("acc").to_numpy()
        khs = t.column("kh").to_numpy()
        order = np.lexsort((bs, kidx))
        k_o, b_o, w_o, n_o = kidx[order], bs[order], ws[order], ns[order]
        # merge the per-BLOCK partials of each (key, bin): the crossing
        # test and acc-below-window are per whole bin
        pch = np.r_[True, (k_o[1:] != k_o[:-1]) | (b_o[1:] != b_o[:-1])]
        ps = np.flatnonzero(pch)
        pk, pb = k_o[ps], b_o[ps]
        pw = np.add.reduceat(w_o, ps)
        pn = np.add.reduceat(n_o, ps)
        pfirst = order[ps]  # one source row per (key, bin)
        # per-key segments over the merged-pair arrays
        kch = np.r_[True, pk[1:] != pk[:-1]]
        ks = np.flatnonzero(kch)
        kseg = np.cumsum(kch) - 1
        kfirst = pfirst[ks]  # one source row per key
        lo_k, hi_k, acc_k = los[kfirst], his[kfirst], accs[kfirst]
        cum = np.cumsum(pw)
        base = (cum[ks] - pw[ks])[kseg]
        rel = cum - base + acc_k[kseg]  # acc + INCLUSIVE per-key cumsum
        pos = np.arange(len(pk), dtype=np.int64)
        sentinel = np.int64(len(pk))
        firstc = np.minimum.reduceat(
            np.where(rel >= budget, pos, sentinel), ks
        )
        keepall = firstc == sentinel
        width = (hi_k - lo_k) // bins + 1
        ci = np.where(keepall, ks, firstc)  # safe index where keepall
        nlo = lo_k + pb[ci] * width
        nhi = np.minimum(lo_k + (pb[ci] + 1) * width - 1, hi_k)
        nacc = rel[ci] - pw[ci]
        cross_n = pn[ci]
        status = np.where(
            keepall, 2,
            np.where((cross_n <= collect_threshold) | (nlo == nhi), 1, 0),
        ).astype(np.int8)
        kh_out = khs[kfirst]
        return _t(_DEC_SCHEMA, {
            "bucket": kh_out % np.int64(n_buckets),
            "kh": kh_out,
            "key": enc.dictionary.take(pa.array(pk[ks])).cast(pa.large_string()),
            "lo": np.where(keepall, lo_k, nlo),
            "hi": np.where(keepall, hi_k, nhi),
            "acc": np.where(keepall, acc_k, nacc),
            "cross_n": np.where(keepall, 0, cross_n),
            "status": status,
        })

    def _finish_group(t: pa.Table) -> pa.Table:
        """One BUCKET group of window-survivor rows -> exact per-key
        boundary, vectorized: each key's kept-below-cut sentinel row
        (kind=0, h_cut=lo) plus one kind=1 row per included boundary id
        (<= cross_n <= collect_threshold rows per key), ties by id via
        the (h, id) lexsort."""
        if t.num_rows == 0:
            return _t(_RES_SCHEMA, {c: [] for c in _RES_SCHEMA.names})
        enc = t.column("key").combine_chunks().dictionary_encode()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hs = t.column("h").to_numpy()
        ids = t.column("id").to_numpy()
        ws = t.column("w").to_numpy()
        los = t.column("lo").to_numpy()
        accs = t.column("acc").to_numpy()
        khs = t.column("kh").to_numpy()
        order = np.lexsort((ids, hs, kidx))
        k_o, w_o = kidx[order], ws[order]
        kch = np.r_[True, k_o[1:] != k_o[:-1]]
        ks = np.flatnonzero(kch)
        kseg = np.cumsum(kch) - 1
        kfirst = order[ks]
        cum = np.cumsum(w_o)
        rel = cum - (cum[ks] - w_o[ks])[kseg] - w_o + accs[kfirst][kseg]
        keepm = rel < budget  # EXCLUSIVE cumulative weight under budget
        inc_src = order[keepm]
        nk, ni = len(ks), int(keepm.sum())
        kh_all = np.concatenate([khs[kfirst], khs[inc_src]])
        dict_ls = enc.dictionary.cast(pa.large_string())
        key_all = pa.concat_arrays([
            dict_ls.take(pa.array(k_o[ks])),
            dict_ls.take(pa.array(k_o[keepm])),
        ])
        return _t(_RES_SCHEMA, {
            "bucket": kh_all % np.int64(n_buckets),
            "kh": kh_all,
            "key": key_all,
            "kind": np.r_[np.zeros(nk, np.int8), np.ones(ni, np.int8)],
            "keep_all": np.zeros(nk + ni, np.int8),
            "h_cut": np.r_[los[kfirst], np.zeros(ni, np.int64)],
            "id": np.r_[np.zeros(nk, np.int64), ids[inc_src]],
        })

    def _status_filter(t: pa.Table, status: int) -> pa.Table:
        return t.filter(pc.equal(t.column("status"), status))

    cut_parts: list = []  # Datasets of _CUT_SCHEMA rows
    inc_parts: list = []  # Datasets of _RES_SCHEMA kind=1 rows

    def _keepall_to_cuts(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return _t(_CUT_SCHEMA, {
            "kh": t.column("kh"), "key": t.column("key"),
            "keep_all": np.ones(n, np.int8), "h_cut": np.zeros(n, np.int64),
        })

    def _res_to_cuts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), 0))
        return _t(_CUT_SCHEMA, {
            "kh": t.column("kh"), "key": t.column("key"),
            "keep_all": t.column("keep_all"), "h_cut": t.column("h_cut"),
        })

    for _ in range(max_rounds):
        stT = _probe_table(
            active_ds.drop_columns(["cross_n", "status"]), "kh"
        )

        def hist(batch: pa.Table, stT=stT) -> pa.Table:
            if batch.num_rows == 0:
                return _t(_HIST_SCHEMA, {c: [] for c in _HIST_SCHEMA.names})
            ka, khs = key_arr(batch.column(key_col))
            ids = batch.column(id_col).to_numpy()
            wts = batch.column(weight_col).to_numpy().astype(np.int64)
            hs = h_of(ids)
            found, vals = stT.lookup(khs, ka, "key", ("lo", "hi", "acc"))
            m = found & (hs >= vals["lo"]) & (hs <= vals["hi"])
            if not m.any():
                return _t(_HIST_SCHEMA, {c: [] for c in _HIST_SCHEMA.names})
            sel = np.flatnonzero(m)
            ka_m = ka.take(pa.array(sel))
            lo_m, hi_m, acc_m = vals["lo"][sel], vals["hi"][sel], vals["acc"][sel]
            width = (hi_m - lo_m) // bins + 1
            b = (hs[sel] - lo_m) // width
            # block-local reduce by (key, bin) — key identity by the
            # DICTIONARY index (string equality), never the hash alone
            kidx = ka_m.dictionary_encode().indices.to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            order = np.lexsort((b, kidx))
            k_s, b_s, w_s = kidx[order], b[order], wts[sel][order]
            change = np.r_[True, (k_s[1:] != k_s[:-1]) | (b_s[1:] != b_s[:-1])]
            starts = np.flatnonzero(change)
            first = order[starts]
            kh_first = khs[sel][first]
            return _t(_HIST_SCHEMA, {
                "bucket": kh_first % np.int64(n_buckets),
                "kh": kh_first, "key": ka_m.take(pa.array(first)),
                "b": b_s[starts], "w": np.add.reduceat(w_s, starts),
                "n": np.add.reduceat(np.ones(len(w_s), np.int64), starts),
                "lo": lo_m[first], "hi": hi_m[first], "acc": acc_m[first],
            })

        dec = (
            docs.map_batches(hist, batch_format="pyarrow", batch_size=None)
            .groupby("bucket")
            .map_groups(_decide, batch_format="pyarrow")
            .materialize()
        )
        keepall_ds = dec.map_batches(
            _status_filter, fn_kwargs={"status": 2},
            batch_format="pyarrow", batch_size=None,
        )
        cut_parts.append(keepall_ds.map_batches(
            _keepall_to_cuts, batch_format="pyarrow", batch_size=None
        ))
        collect_ds = dec.map_batches(
            _status_filter, fn_kwargs={"status": 1},
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        if collect_ds.count() > 0:
            colT = _probe_table(
                collect_ds.drop_columns(["cross_n", "status"]), "kh"
            )

            def survivors(batch: pa.Table, colT=colT) -> pa.Table:
                if batch.num_rows == 0:
                    return _t(_SRV_SCHEMA, {c: [] for c in _SRV_SCHEMA.names})
                ka, khs = key_arr(batch.column(key_col))
                ids = batch.column(id_col).to_numpy()
                wts = batch.column(weight_col).to_numpy().astype(np.int64)
                hs = h_of(ids)
                found, vals = colT.lookup(khs, ka, "key", ("lo", "hi", "acc"))
                m = found & (hs >= vals["lo"]) & (hs <= vals["hi"])
                sel = np.flatnonzero(m)
                return _t(_SRV_SCHEMA, {
                    "bucket": khs[sel] % np.int64(n_buckets),
                    "kh": khs[sel], "key": ka.take(pa.array(sel)),
                    "h": hs[sel], "id": ids[sel], "w": wts[sel],
                    "lo": vals["lo"][sel], "acc": vals["acc"][sel],
                })

            res = (
                docs.map_batches(survivors, batch_format="pyarrow", batch_size=None)
                .groupby("bucket")
                .map_groups(_finish_group, batch_format="pyarrow")
                .materialize()
            )
            cut_parts.append(res.map_batches(
                _res_to_cuts, batch_format="pyarrow", batch_size=None
            ))
            inc_parts.append(res.map_batches(
                lambda t: t.filter(pc.equal(t.column("kind"), 1)),
                batch_format="pyarrow", batch_size=None,
            ))
        active_ds = dec.map_batches(
            _status_filter, fn_kwargs={"status": 0},
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        if active_ds.count() == 0:
            break
    else:
        raise RuntimeError(
            f"budget_head_sample failed to converge within {max_rounds} rounds"
        )

    cuts_ds = cut_parts[0]
    for p in cut_parts[1:]:
        cuts_ds = cuts_ds.union(p)
    cutT = _probe_table(cuts_ds, "kh")

    def _inc_encode(t: pa.Table) -> pa.Table:
        """(key, id) -> combined hash + exact-equality text probe."""
        if t.num_rows == 0:
            return _t(_INC_SCHEMA, {c: [] for c in _INC_SCHEMA.names})
        khv = t.column("kh").to_numpy().astype(np.uint64)
        idv = t.column("id").to_numpy().astype(np.uint64)
        from .hashing import mix64 as _mx

        ch = (_mx(khv ^ _mx(idv)) >> np.uint64(1)).astype(np.int64)
        kid = pc.binary_join_element_wise(
            t.column("key").cast(pa.large_string()),
            pc.cast(t.column("id"), pa.large_string()),
            pa.scalar("\x00", pa.large_string()),
        )
        return _t(_INC_SCHEMA, {"ch": ch, "kid": kid})

    incT = None
    if inc_parts:
        inc_ds = inc_parts[0]
        for p in inc_parts[1:]:
            inc_ds = inc_ds.union(p)
        incT = _probe_table(
            inc_ds.map_batches(_inc_encode, batch_format="pyarrow", batch_size=None),
            "ch",
        )

    def select(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ka, khs = key_arr(batch.column(key_col))
        ids = batch.column(id_col).to_numpy()
        hs = h_of(ids)
        found, vals = cutT.lookup(khs, ka, "key", ("keep_all", "h_cut"))
        keep = found & ((vals["keep_all"] == 1) | (hs < vals["h_cut"]))
        if incT is not None and incT.total:
            khv = khs.astype(np.uint64)
            ch = (mix64(khv ^ mix64(ids.astype(np.uint64)))
                  >> np.uint64(1)).astype(np.int64)
            kid = pc.binary_join_element_wise(
                ka.cast(pa.large_string()),
                pc.cast(batch.column(id_col), pa.large_string()),
                pa.scalar("\x00", pa.large_string()),
            )
            fi, _ = incT.lookup(ch, kid, "kid", ())
            keep |= fi
        return batch.filter(pa.array(keep))

    return docs.map_batches(select, batch_format="pyarrow", batch_size=None)
