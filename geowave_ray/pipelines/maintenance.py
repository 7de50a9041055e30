"""Store maintenance — the reference's index lifecycle commands
re-expressed over the partitioned-Parquet store:

- :func:`compact_store` — ``geowave index compact``
  (``core/store/.../cli/store/CompactIndexCommand.java``; in the
  reference this triggers the KV store's major compaction so each
  range lives in one sorted run). Here: every ``cell_bucket``
  partition's files (one per ingest group) merge into the minimum
  number of sorted files — zero shuffle, one task per bucket.
- :func:`copy_store` — ``geowave store copy`` / ``CopyCommand``
  (``core/store/.../cli/store/CopyStoreCommand.java``): rewrite a
  store into a new index configuration (different bucket count /
  curve), streaming one bounded exchange.

Scale notes: compaction is embarrassingly parallel over buckets; a
bucket whose rows exceed ``rows_per_file`` is split into several
sorted files at row-group-aligned cut points, so no task ever needs
more than one bucket in memory and the 100-TB variant just raises the
task count. ``copy_store`` is a partitioned re-write — the exchange is
the point (the data must move to its new partition) — and reuses the
ingest path's groupby-consolidated write so output file count stays
``O(buckets)``, not ``O(blocks × buckets)``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..sfc import MAX_TIER
from .query import _bucket_dirs


def _guard_out_dir(src_dir: str, out_dir: str) -> None:
    """Refuse in-place rewrites: ``out_dir`` equal to, inside, or
    containing the source would destroy the inputs mid-build (e.g.
    ``geowave compact <store> <store>`` from the CLI)."""
    src = os.path.realpath(src_dir)
    out = os.path.realpath(out_dir)
    if out == src or out.startswith(src + os.sep) or src.startswith(out + os.sep):
        raise ValueError(
            f"out_dir {out_dir!r} must not equal, contain, or live inside "
            f"the source store {src_dir!r} — the rewrite is not in-place"
        )


def _swap_into_place(tmp: str, out_dir: str) -> None:
    """Atomically-ish promote a fully-built ``tmp`` to ``out_dir``.
    A pre-existing ``out_dir`` is only deleted AFTER the build
    succeeded (renamed aside first — ``os.replace`` can't overwrite a
    non-empty directory), so a mid-build failure never loses it."""
    old = out_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)


def _bucket_files(store_dir, col: str = "cell_bucket") -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    for b, d in _bucket_dirs(store_dir, col=col):
        out.setdefault(b, []).extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return out


def compact_store(
    store_dir: str,
    out_dir: str,
    col: str = "cell_bucket",
    sort_col: str = "cell_id",
    rows_per_file: int = 4_000_000,
) -> dict:
    """Merge every bucket's ingest-group files into sorted compacted
    files under ``out_dir/<col>=N/``. Returns a summary dict with
    per-store file counts before/after and total rows.

    One Ray task per bucket (no exchange — the store is already
    partitioned by bucket on disk); each task k-way-merges its
    already-sorted inputs via a concat + stable sort and splits the
    output at ``rows_per_file``. The lineage manifest is carried over
    unchanged (compaction moves bytes, never rows), plus a
    ``_compaction.json`` audit record.
    """
    _guard_out_dir(store_dir, out_dir)
    buckets = _bucket_files(store_dir, col)
    if not buckets:
        raise ValueError(f"no {col}= partitions under {store_dir}")
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    items = [
        {"bucket": b, "files": files, "dest": os.path.join(tmp, f"{col}={b}")}
        for b, files in sorted(buckets.items())
    ]

    def compact_one(batch: pa.Table) -> pa.Table:
        rows = []
        for item in batch.to_pylist():
            files = list(item["files"])
            t = pa.concat_tables([pq.read_table(f) for f in files])
            if sort_col in t.column_names:
                t = t.sort_by(sort_col)
            os.makedirs(item["dest"], exist_ok=True)
            n_out = 0
            for off in range(0, max(len(t), 1), rows_per_file):
                part = t.slice(off, rows_per_file)
                pq.write_table(
                    part, os.path.join(item["dest"], f"part-{n_out:05d}.parquet")
                )
                n_out += 1
            rows.append(
                {
                    "bucket": item["bucket"],
                    "files_in": len(files),
                    "files_out": n_out,
                    "rows": len(t),
                }
            )
        return pa.Table.from_pylist(rows)

    stats = (
        ray.data.from_items(items)
        .map_batches(compact_one, batch_size=1, batch_format="pyarrow")
        .to_pandas()
    )
    manifest = os.path.join(store_dir, "_manifest")
    if os.path.isdir(manifest):
        shutil.copytree(manifest, os.path.join(tmp, "_manifest"))
    summary = {
        "buckets": int(len(stats)),
        "files_in": int(stats["files_in"].sum()),
        "files_out": int(stats["files_out"].sum()),
        "rows": int(stats["rows"].sum()),
    }
    with open(os.path.join(tmp, "_compaction.json"), "w") as f:
        json.dump(summary, f)
    _swap_into_place(tmp, out_dir)
    return summary


def copy_store(
    store_dir: str,
    out_dir: str,
    n_buckets: int = 64,
    tier: int = MAX_TIER,
    col: str = "cell_bucket",
    sort_col: str = "cell_id",
) -> dict:
    """Rewrite a cell-bucket store under a NEW bucket count (index
    reconfiguration; ``CopyStoreCommand`` + ``AddSpatialIndexCommand``
    with different params). Buckets are the top 8 bits of the cell id
    mod ``n_buckets`` — same rule as ingest — so the pruned readers
    work on the copy unchanged."""
    from ..stages.cell_encode import bucket_of

    _guard_out_dir(store_dir, out_dir)
    files = [f for fs in _bucket_files(store_dir, col).values() for f in fs]
    if not files:
        raise ValueError(f"no {col}= partitions under {store_dir}")

    def rebucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column(sort_col).to_numpy(), tier, n_buckets)
        # drop hive partition columns inferred from the SOURCE layout
        # (old bucket, ingest group) — the copy defines its own
        stale = [c for c in (col, "group") if c in batch.column_names]
        if stale:
            batch = batch.drop_columns(stale)
        return batch.append_column(col, pa.array(b, pa.int64()))

    ds = ray.data.read_parquet(files).map_batches(
        rebucket, batch_format="pyarrow", batch_size=None
    )
    ds = ds.groupby(col).map_groups(
        lambda t: t.sort_by(sort_col), batch_format="pyarrow"
    )
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, partition_cols=[col])
    _swap_into_place(tmp, out_dir)
    rows = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out_dir, f"{col}=*", "*.parquet"))
    )
    return {"rows": rows, "n_buckets": n_buckets, "out_dir": out_dir}


def delete_pyramid_level(
    tiles_dir: str, out_dir: str, level: int, level_col: str = "level"
) -> dict:
    """``DeletePyramidLevelCommand`` role: drop one pyramid level from
    a tile store by streaming filter + partitioned rewrite."""
    _guard_out_dir(tiles_dir, out_dir)
    ds = ray.data.read_parquet(tiles_dir).filter(
        expr=f"{level_col} != {int(level)}"
    )
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, partition_cols=[level_col])
    _swap_into_place(tmp, out_dir)
    return {"out_dir": out_dir}


def recalc_stats(store_dir: str, col: str = "cell_bucket") -> pa.Table:
    """``RecalculateStatsCommand`` role: rebuild the per-bucket
    row-count statistic from the store's parquet FOOTERS — no data
    pages are read. Fans one Ray task per bucket (footer I/O bound),
    so a 100-TB store with O(10^5) files still recalculates in one
    short wave. Returns (bucket, n) sorted by bucket."""
    buckets = _bucket_files(store_dir, col)
    if not buckets:
        raise ValueError(f"no {col}= partitions under {store_dir}")
    items = [{"bucket": b, "files": fs} for b, fs in sorted(buckets.items())]

    def count_one(batch: pa.Table) -> pa.Table:
        rows = [
            {
                "cell_bucket": it["bucket"],
                "n": sum(pq.read_metadata(f).num_rows for f in it["files"]),
            }
            for it in batch.to_pylist()
        ]
        return pa.Table.from_pylist(rows)

    out = (
        ray.data.from_items(items)
        .map_batches(count_one, batch_size=1, batch_format="pyarrow")
        .to_pandas()
        .sort_values("cell_bucket")
    )
    return pa.table(
        {
            "cell_bucket": pa.array(out["cell_bucket"].to_numpy(), pa.int64()),
            "n": pa.array(out["n"].to_numpy(), pa.int64()),
        }
    )


def presplit_partitions(
    store_dir: str, n_splits: int, col: str = "cell_bucket"
) -> pa.Table:
    """``PreSplitPartitionIdCommand`` role: pick ``n_splits - 1``
    bucket boundaries that balance ROW COUNT (not key space) using the
    footer histogram, so a re-partition / new cluster can pre-create
    evenly loaded ranges. Boundary k = smallest bucket whose cumulative
    count reaches k/n_splits of the total (exact integer comparison
    ``cum * n_splits >= k * total`` — no float quantiles)."""
    hist = recalc_stats(store_dir, col)
    b = hist.column("cell_bucket").to_numpy()
    n = hist.column("n").to_numpy()
    cum = np.cumsum(n)
    total = int(cum[-1])
    ks = np.arange(1, n_splits)
    idx = np.searchsorted(cum * n_splits, ks * total, side="left")
    return pa.table(
        {
            "split_idx": pa.array(ks, pa.int64()),
            "boundary_bucket": pa.array(b[idx], pa.int64()),
            "rows_below": pa.array(cum[idx], pa.int64()),
        }
    )
