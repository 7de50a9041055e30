"""Vectorized 64-bit hashing primitives shared by dedup / text /
sampling stages.

The round-1 hot paths hashed per row (or per token) with ``hashlib``
inside ``map_batches`` — correct but the dominant cost at scale.
Routing/sketching needs speed, not cryptographic strength, so these
kernels hash whole Arrow string columns in one pass: a polynomial hash
mod 2**64 over the UTF-8 byte buffer (segmented by the Arrow offsets
vector, ``np.add.reduceat`` for the per-string sums) followed by a
splitmix64-style avalanche. Everything is numpy over zero-copy views
of the Arrow buffers — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)
_P = np.uint64(1099511628211)  # FNV prime as the polynomial base

_ERRSTATE = {"over": "ignore"}


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche (vectorized, wraps mod 2**64)."""
    with np.errstate(**_ERRSTATE):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(33)
        x *= _M1
        x ^= x >> np.uint64(33)
        x *= _M2
        x ^= x >> np.uint64(33)
    return x


def mix64_inplace(x: np.ndarray) -> np.ndarray:
    """mix64 mutating ``x`` (uint64) in place — no transient copies
    (see the chunked-scratch note above: fresh large temporaries are a
    per-worker page-fault tax in this sandbox)."""
    with np.errstate(**_ERRSTATE):
        x ^= x >> np.uint64(33)
        x *= _M1
        x ^= x >> np.uint64(33)
        x *= _M2
        x ^= x >> np.uint64(33)
    return x


def _powers(n: int) -> np.ndarray:
    """[P^0, P^1, ..., P^(n-1)] mod 2**64."""
    out = np.ones(max(n, 1), dtype=np.uint64)
    if n > 1:
        with np.errstate(**_ERRSTATE):
            out[1:] = np.cumprod(np.full(n - 1, _P, dtype=np.uint64))
    return out


# Chunked scratch: this sandbox's kernel (and many virtualized hosts)
# makes FIRST-TOUCH of fresh mmap'd pages ~100x slower than warm
# memory — the original one-pass form allocated ~6 transient arrays of
# 8 B/byte, costing ~5 s of page faults per 16 MB batch in every fresh
# worker. Processing in 2 MB chunks through preallocated per-process
# buffers bounds transient memory to ~50 MB total, reused for the
# process lifetime. uint64 sums are associative mod 2**64, so chunked
# accumulation is BIT-IDENTICAL to the one-pass form (pytest-pinned).
_CHUNK = 1 << 21
_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, n: int, dtype) -> np.ndarray:
    buf = _SCRATCH.get(name)
    if buf is None or len(buf) < n:
        _SCRATCH[name] = buf = np.empty(max(n, _CHUNK), dtype)
    return buf[:n]


def _iota(n: int) -> np.ndarray:
    """[0, 1, ..., n-1] from a reused buffer, initialized at
    allocation time (never sniff buffer contents to decide whether a
    scratch array is initialized — np.empty memory is arbitrary)."""
    buf = _SCRATCH.get("arange")
    if buf is None or len(buf) < n:
        _SCRATCH["arange"] = buf = np.arange(max(n, _CHUNK), dtype=np.int64)
    return buf[:n]


def poly_hash_segments(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Hash ``len(offsets)-1`` byte segments of ``data`` (uint8) in
    bounded chunks. ``offsets`` are absolute into ``data`` (Arrow
    string-array offsets). Returns uint64 hashes; empty segments hash
    to a fixed value distinct from any non-empty one.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = np.diff(offsets)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lo, hi = int(offsets[0]), int(offsets[-1])
    if hi == lo:
        return mix64(lens.astype(np.uint64))
    starts = offsets[:-1]
    ends = offsets[1:]
    pw = _powers(int(lens.max()))
    sums = np.zeros(n, dtype=np.uint64)
    arange = _iota(_CHUNK)
    with np.errstate(**_ERRSTATE):
        for c0 in range(lo, hi, _CHUNK):
            c1 = min(c0 + _CHUNK, hi)
            m = c1 - c0
            # segments overlapping [c0, c1) with >= 1 byte in it
            d0 = int(np.searchsorted(ends, c0, side="right"))
            d1 = int(np.searchsorted(starts, c1, side="left"))  # exclusive
            cs = np.clip(starts[d0:d1], c0, c1)
            ce = np.clip(ends[d0:d1], c0, c1)
            cnt = ce - cs
            nz = np.flatnonzero(cnt)
            if len(nz) == 0:
                continue
            v_end = ends[d0:d1][nz]  # absolute end per contributing seg
            local_starts = cs[nz] - c0  # strictly increasing, < m
            # owner_end repeated cnt[nz] times, via diff + cumsum into
            # scratch (np.repeat would allocate fresh pages per call)
            owner = _scratch("owner", m, np.int64)
            owner.fill(0)
            bnd = np.cumsum(cnt[nz])
            owner[0] = v_end[0]
            if len(v_end) > 1:
                owner[bnd[:-1]] = np.diff(v_end)
            np.cumsum(owner, out=owner)
            # exp = owner_end - 1 - abs_pos
            exp = _scratch("exp", m, np.int64)
            np.subtract(owner, c0 + 1, out=exp)
            np.subtract(exp, arange[:m], out=exp)
            # contrib = (byte + 1) * P^exp
            s64 = _scratch("s64", m, np.uint64)
            np.copyto(s64, data[c0:c1])
            np.add(s64, np.uint64(1), out=s64)
            pwe = _scratch("pwe", m, np.uint64)
            np.take(pw, exp, out=pwe)
            np.multiply(s64, pwe, out=s64)
            part = np.add.reduceat(s64, local_starts)
            sums[d0 + nz] += part
    # empty segments keep sums == 0 (fixed value distinct from any
    # non-empty segment's polynomial sum after the final mix)
    return mix64(sums ^ mix64(lens.astype(np.uint64)))


def _flat_string_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    return arr


def hash_utf8(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 hash per string of an Arrow string column (one pass)."""
    arr = _flat_string_array(arr)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return poly_hash_segments(data, offsets)


def tokenize_hash(
    texts: pa.Array | pa.ChunkedArray, sep: str = " "
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-separator tokenization with empty tokens dropped,
    returning ``(token_hash: uint64, doc_idx: int64, n_tokens: int64)``
    where ``doc_idx`` is nondecreasing and ``n_tokens[d]`` counts the
    kept tokens of doc ``d``. All vectorized (pyarrow split + one
    hashing pass over the flattened token array).
    """
    texts = _flat_string_array(texts)
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    n_docs = len(texts)
    lst = pc.split_pattern(texts, sep)
    flat = pc.list_flatten(lst)
    counts_all = pc.list_value_length(lst).to_numpy().astype(np.int64)
    doc_all = np.repeat(np.arange(n_docs, dtype=np.int64), counts_all)
    keep = pc.binary_length(flat).to_numpy().astype(np.int64) > 0
    th = hash_utf8(flat)[keep]
    doc = doc_all[keep]
    n_tokens = np.bincount(doc, minlength=n_docs).astype(np.int64)
    return th, doc, n_tokens


def segment_min(
    values: np.ndarray, starts: np.ndarray, chunk: int = 1 << 17
) -> np.ndarray:
    """Per-segment minimum of a 2-D (P, S) array along axis 1 with
    segment start indices ``starts`` (sorted, absolute into S), in
    bounded-memory chunks. Returns (P, len(starts))."""
    P, S = values.shape
    n_seg = len(starts)
    out = np.full((P, n_seg), np.iinfo(np.uint64).max, dtype=values.dtype)
    if S == 0 or n_seg == 0:
        return out
    seg_of = np.searchsorted(starts, np.arange(0, S, chunk), side="right") - 1
    for ci, lo in enumerate(range(0, S, chunk)):
        hi = min(lo + chunk, S)
        d0 = seg_of[ci]
        d1 = np.searchsorted(starts, hi, side="left")
        local_starts = np.maximum(starts[d0:d1], lo) - lo
        part = np.minimum.reduceat(values[:, lo:hi], local_starts, axis=1)
        np.minimum(out[:, d0:d1], part, out=out[:, d0:d1])
    return out
