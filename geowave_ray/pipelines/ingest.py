"""Ingest pipeline: pages parquet -> geotag -> cell encode -> partitioned
parquet + per-partition lineage manifest; resumable.

Reference lifecycle: ``geowave ingest localtogw``
(``core/ingest/.../AbstractLocalFileIngestDriver.java:39-310`` — walk
files, plugin parse, threaded writers computing insertion ids,
statistics callbacks). Ray-Data shape: one streaming Dataset pipeline
per shard group — ``read_parquet -> map_batches(geotag) ->
map_batches(cell encode) -> write_parquet(partition by cell bucket)``
— with the statistics callback role played by per-shard cell
histograms recorded in the manifest.

Resumability (north rule): partition key = input file path; completed
files are recorded in the manifest dir and skipped on rerun; output
goes to ``out_dir/shard=<n>/`` atomically per shard group.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..geotag import geotag_batch
from ..sfc import MAX_TIER
from ..stages.cell_encode import encode_points
from ..state import manifest as mf


def _encode_stage(batch: pa.Table, tier: int, n_buckets: int) -> pa.Table:
    batch = geotag_batch(batch)
    batch = encode_points(batch, tier=tier)
    bucket = (
        batch.column("cell_id").to_numpy().astype(np.uint64) >> np.uint64(2 * tier - 8)
    ).astype(np.int64) % n_buckets
    return batch.append_column("cell_bucket", pa.array(bucket, pa.int64()))


def ingest_pages(
    input_paths: str | list[str],
    out_dir: str,
    tier: int = MAX_TIER,
    n_buckets: int = 64,
    resume: bool = True,
    files_per_group: int = 16,
    columns: list[str] | None = None,
) -> dict:
    """Run the ingest; returns summary {files, rows, skipped}.

    ``cell_bucket`` (high bits of the cell id) is the partition column —
    spatially-coherent output layout so bbox queries prune whole
    directories (the KV-store partition-key role).
    """
    if isinstance(input_paths, str):
        files = sorted(glob.glob(os.path.join(input_paths, "*.parquet"))) or [input_paths]
    else:
        files = sorted(input_paths)
    manifest_dir = os.path.join(out_dir, "_manifest")
    skipped = 0
    total_rows = 0
    # Group numbering runs over the FULL sorted file list so group dirs
    # have a stable identity across resumed runs (a resumed run must
    # never renumber groups — that would collide with and destroy the
    # output of previously-completed groups). A group with any
    # incomplete file is re-ingested whole (idempotent: rmtree + write).
    for gi in range(0, len(files), files_per_group):
        group = files[gi : gi + files_per_group]
        if resume and all(mf.is_complete(manifest_dir, f) for f in group):
            skipped += len(group)
            continue
        ds = ray.data.read_parquet(group, columns=columns)
        ds = ds.map_batches(
            _encode_stage,
            fn_kwargs=dict(tier=tier, n_buckets=n_buckets),
            batch_format="pyarrow",
            batch_size=None,
        )
        # Consolidate to ONE block per cell_bucket before the
        # partitioned write — otherwise every (input block × bucket)
        # pair becomes its own tiny parquet file and the query-side
        # read drowns in per-file metadata/task overhead. This is the
        # KV-store "sorted write" role: bounded file count
        # (buckets × groups), spatially clustered.
        ds = ds.groupby("cell_bucket").map_groups(
            lambda t: t, batch_format="pyarrow"
        )
        dest = os.path.join(out_dir, f"group={gi:06d}")
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)
        ds.write_parquet(tmp, partition_cols=["cell_bucket"])
        os.replace(tmp, dest)
        # lineage manifest from the written parquet FOOTERS (no recompute):
        # per-bucket row counts = the coarse cell histogram that later
        # drives salting + split planning.
        hist: dict[str, int] = {}
        rows_group = 0
        for part in glob.glob(os.path.join(dest, "cell_bucket=*", "*.parquet")):
            n = pq.read_metadata(part).num_rows
            bucket = os.path.basename(os.path.dirname(part)).split("=", 1)[1]
            hist[bucket] = hist.get(bucket, 0) + n
            rows_group += n
        # Per-file row counts from the INPUT footers: point encoding is
        # 1:1 (one insertion id per point), so input rows == output rows;
        # validated here so statistics answers (optimal_count) can never
        # silently drift from the on-disk data.
        file_rows = {f: pq.read_metadata(f).num_rows for f in group}
        if sum(file_rows.values()) != rows_group:
            raise RuntimeError(
                f"ingest row mismatch for {dest}: inputs "
                f"{sum(file_rows.values())} != written {rows_group}"
            )
        for fi, f in enumerate(group):
            mf.write_entry(
                manifest_dir,
                f,
                {
                    "input_file": f,
                    "file_rows": file_rows[f],
                    "group_rows": rows_group,
                    "output_dir": dest,
                    # histogram recorded once per group (avoid double count
                    # when merging across entries)
                    "cell_histogram": hist if fi == 0 else {},
                },
            )
        total_rows += rows_group
    return {"files": len(files), "rows": total_rows, "skipped": skipped}
