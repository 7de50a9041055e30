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


def _powers(n: int) -> np.ndarray:
    """[P^0, P^1, ..., P^(n-1)] mod 2**64."""
    out = np.ones(max(n, 1), dtype=np.uint64)
    if n > 1:
        with np.errstate(**_ERRSTATE):
            out[1:] = np.cumprod(np.full(n - 1, _P, dtype=np.uint64))
    return out


def poly_hash_segments(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Hash ``len(offsets)-1`` byte segments of ``data`` (uint8) in one
    vectorized pass. ``offsets`` are absolute into ``data`` (Arrow
    string-array offsets). Returns uint64 hashes; empty segments hash
    to a fixed value distinct from any non-empty one.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = np.diff(offsets)
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lo, hi = int(offsets[0]), int(offsets[-1])
    seg = data[lo:hi].astype(np.uint64)
    if len(seg) == 0:
        return mix64(lens.astype(np.uint64))
    starts = offsets[:-1] - lo
    ends = offsets[1:] - lo
    pos = np.arange(len(seg), dtype=np.int64)
    # exponent = distance of each byte from the END of its owning string
    owner_end = np.repeat(ends, lens)
    exp = owner_end - 1 - pos
    pw = _powers(int(lens.max()))
    with np.errstate(**_ERRSTATE):
        contrib = (seg + np.uint64(1)) * pw[exp]
        # sentinel zero so segment starts AT the buffer end (trailing
        # empty strings) are valid reduceat indices — clamping them to
        # len-1 instead would truncate the PRECEDING segment's range
        contrib = np.concatenate([contrib, np.zeros(1, dtype=np.uint64)])
        sums = np.add.reduceat(contrib, starts)
    sums[lens == 0] = 0  # reduceat yields a spurious value for empty segments
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
