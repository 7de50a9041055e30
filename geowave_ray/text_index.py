"""Text index strategies — the reference's custom text indexes
(``core/index/.../text/TextIndexStrategy.java``, FORWARD / REVERSE /
NGRAM term extraction, ``TextIndexType.java:11-12``).

- FORWARD  -> prefix search (``starts_with`` on the indexed column)
- REVERSE  -> suffix search (prefix on the reversed column)
- NGRAM    -> contains search: trigram postings prune candidates, an
              exact substring check verifies (same two-phase shape as
              the spatial coarse-range + fine-filter path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _trigrams(s: str) -> set[int]:
    b = s.encode("utf-8", errors="ignore")
    if len(b) < 3:
        b = b + b"\x00" * (3 - len(b))
    return {
        (b[i] << 16) | (b[i + 1] << 8) | b[i + 2] for i in range(len(b) - 2)
    }


def trigram_postings(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Inverted NGRAM index as a Dataset of (trigram, doc_id) postings
    (written partitioned at scale; the index build path)."""

    def fb(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_t, out_d = [], []
        for d, t in zip(ids, texts):
            for g in _trigrams(t):
                out_t.append(g)
                out_d.append(d)
        return pa.table(
            {
                "trigram": pa.array(out_t, pa.int64()),
                id_col: pa.array(out_d, pa.int64()),
            }
        )

    return docs.map_batches(fb, batch_format="pyarrow", batch_size=None)


def search_contains(
    docs: ray.data.Dataset, term: str, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """NGRAM-index contains search: trigram prefilter + exact verify.

    Exact (the verify step is authoritative); the trigram pass only
    prunes. Matches SQL ``contains(text, term)``.
    """
    need = _trigrams(term) if len(term) >= 3 else set()
    need_ref = ray.put(np.array(sorted(need), dtype=np.int64))

    def fb(batch: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        texts = batch.column(text_col).to_pylist()
        if len(needed):
            keep = []
            for t in texts:
                tg = _trigrams(t)
                keep.append(all(int(g) in tg for g in needed))
            batch = batch.filter(pa.array(keep))
        # exact verify (authoritative)
        return batch.filter(pc.match_substring(batch.column(text_col), term))

    return docs.map_batches(fb, batch_format="pyarrow", batch_size=None).select_columns(
        [id_col]
    )


def search_prefix(
    docs: ray.data.Dataset, prefix: str, col: str, id_col: str
) -> ray.data.Dataset:
    """FORWARD-index prefix search (vectorized)."""
    return docs.map_batches(
        lambda b: b.filter(pc.starts_with(b.column(col), prefix)),
        batch_format="pyarrow",
        batch_size=None,
    ).select_columns([id_col])


def search_suffix(
    docs: ray.data.Dataset, suffix: str, col: str, id_col: str
) -> ray.data.Dataset:
    """REVERSE-index suffix search."""
    return docs.map_batches(
        lambda b: b.filter(pc.ends_with(b.column(col), suffix)),
        batch_format="pyarrow",
        batch_size=None,
    ).select_columns([id_col])


# ---------------------------------------------------------------------------
# enum-valued secondary index (EnumIndexStrategy)
# ---------------------------------------------------------------------------


def build_enum_index(
    ds: ray.data.Dataset,
    terms: list[str],
    out_dir: str,
    value_col: str = "lang",
) -> list[str]:
    """Enumerated-value secondary index — the reference's
    ``EnumIndexStrategy`` (``core/index/.../text/EnumIndexStrategy.java:
    75-100``): each row's value maps to its binary-search position in
    the SORTED term list and that index IS the sort key; rows whose
    value is not in the enumeration are NOT indexed (the reference
    skips them with a warning). Here the sort key becomes the
    partition column, so a term lookup reads exactly one
    ``enum_idx=N`` directory — the same pruned-path shape as the
    spatial cell-bucket store. Returns the sorted term list (the
    index metadata a search needs)."""
    import shutil

    terms_sorted = sorted(set(terms))
    arr = np.array(terms_sorted, dtype=object)

    def assign(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(arr, v)
        ok = (pos < len(arr)) & (arr[np.minimum(pos, len(arr) - 1)] == v)
        t = b.filter(pa.array(ok))
        return t.append_column("enum_idx", pa.array(pos[ok], pa.int64()))

    from .pipelines.maintenance import _swap_into_place

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.map_batches(assign, batch_format="pyarrow", batch_size=None).write_parquet(
        tmp, partition_cols=["enum_idx"]
    )
    _swap_into_place(tmp, out_dir)
    return terms_sorted


def enum_partition_files(
    index_dir: str,
    terms_sorted: list[str],
    values,
) -> tuple[list[str], int, int]:
    """Parquet files serving the given enumerated values, across a
    flat ``enum_idx=N`` tree or per-ingest-group ``g_*/enum_idx=N``
    subtrees (the DataStore facade appends one subtree per group).
    Returns (files, partition_dirs_read, partition_dirs_total) — the
    pruning evidence the planner's explain surfaces."""
    import bisect
    import glob
    import os

    wanted: set[int] = set()
    for v in values:
        i = bisect.bisect_left(terms_sorted, v)
        if i < len(terms_sorted) and terms_sorted[i] == v:
            wanted.add(i)
    all_dirs = sorted(
        glob.glob(os.path.join(index_dir, "enum_idx=*"))
        + glob.glob(os.path.join(index_dir, "g_*", "enum_idx=*"))
    )
    files: list[str] = []
    read = 0
    for d in all_dirs:
        idx = int(os.path.basename(d).split("=", 1)[1])
        if idx in wanted:
            read += 1
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return files, read, len(all_dirs)


def search_enum(
    index_dir: str,
    terms_sorted: list[str],
    term: str,
    columns=None,
) -> "ray.data.Dataset":
    """Exact-term lookup against an enum index: binary search resolves
    the term to its sort key; a miss matches nothing (the reference
    passes an unmatchable sort key through — ``EnumIndexStrategy.java:
    90-100``). The read touches ONE partition directory."""
    import bisect
    import glob
    import os

    i = bisect.bisect_left(terms_sorted, term)
    files: list[str] = []
    if i < len(terms_sorted) and terms_sorted[i] == term:
        files = sorted(
            glob.glob(os.path.join(index_dir, f"enum_idx={i}", "*.parquet"))
        )
    if not files:
        # schema-correct empty result: zero rows of any real partition
        allf = sorted(
            glob.glob(os.path.join(index_dir, "enum_idx=*", "*.parquet"))
        )
        if allf:
            return ray.data.read_parquet(allf[:1], columns=columns).limit(0)
        import pyarrow as _pa

        return ray.data.from_arrow(
            _pa.table({c: _pa.array([], _pa.string()) for c in (columns or ["_"])})
        ).limit(0)
    return ray.data.read_parquet(files, columns=columns)
