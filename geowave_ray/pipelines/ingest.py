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
from ..stages.cell_encode import bucket_of, encode_points
from ..state import manifest as mf


def _encode_stage(batch: pa.Table, tier: int, n_buckets: int) -> pa.Table:
    batch = geotag_batch(batch)
    batch = encode_points(batch, tier=tier)
    bucket = bucket_of(batch.column("cell_id").to_numpy(), tier, n_buckets)
    return batch.append_column("cell_bucket", pa.array(bucket, pa.int64()))


# Spatial-temporal composite bias presets: bit split between the
# spatial bucket and the time bin granularity, mirroring the
# reference's SPATIAL 25/10 / BALANCED 20/20 / TEMPORAL 10/40
# bits-per-dimension presets
# (``SpatialTemporalDimensionalityTypeProvider.java:207-245``) at
# partition-key scale: more spatial buckets <=> coarser time bins.
ST_BIAS = {
    "SPATIAL": dict(n_spatial_buckets=64, bin_days=92),
    "BALANCED": dict(n_spatial_buckets=16, bin_days=31),
    "TEMPORAL": dict(n_spatial_buckets=4, bin_days=7),
}
_EPOCH_US = 0
_DAY_US = 24 * 3600 * 1_000_000


def st_bucket_of(ts_us: np.ndarray, cell_id: np.ndarray, tier: int, bias: str) -> np.ndarray:
    """Composite (time_bin ‖ spatial_bucket) partition key.

    time_bin = absolute bin index since epoch (UNBOUNDED, the
    reference's binned unbounded dimension —
    ``core/index/.../dimension/UnboundedDimensionDefinition.java``);
    spatial bucket = top Morton bits folded to the preset's budget."""
    cfg = ST_BIAS[bias]
    nsb = cfg["n_spatial_buckets"]
    tbin = (ts_us - _EPOCH_US) // (cfg["bin_days"] * _DAY_US)
    shift = np.uint64(max(0, 2 * tier - 8))
    sb = (cell_id.astype(np.uint64) >> shift).astype(np.int64) % nsb
    return tbin * np.int64(nsb) + sb


def _encode_stage_st(batch: pa.Table, tier: int, bias: str) -> pa.Table:
    batch = geotag_batch(batch)
    batch = encode_points(batch, tier=tier)
    ts = batch.column("warc_ts").to_numpy().astype("datetime64[us]").astype(np.int64)
    stb = st_bucket_of(ts, batch.column("cell_id").to_numpy(), tier, bias)
    return batch.append_column("st_bucket", pa.array(stb, pa.int64()))


def ingest_pages_st(
    input_paths: str | list[str],
    out_dir: str,
    tier: int = MAX_TIER,
    bias: str = "BALANCED",
    resume: bool = True,
    files_per_group: int = 16,
    columns: list[str] | None = None,
) -> dict:
    """Ingest into the SPATIAL-TEMPORAL composite layout: partition
    dirs ``st_bucket=<time_bin * n_sb + spatial_bucket>`` so a
    (bbox, time-range) query prunes on BOTH dimensions at the read
    (the reference's spatial-temporal index,
    ``SpatialTemporalDimensionalityTypeProvider.java``)."""
    if isinstance(input_paths, str):
        files = sorted(glob.glob(os.path.join(input_paths, "*.parquet"))) or [input_paths]
    else:
        files = sorted(input_paths)
    manifest_dir = os.path.join(out_dir, "_manifest")
    skipped = 0
    total_rows = 0
    for gi in range(0, len(files), files_per_group):
        group = files[gi : gi + files_per_group]
        if resume and all(mf.is_complete(manifest_dir, f) for f in group):
            skipped += len(group)
            continue
        ds = ray.data.read_parquet(group, columns=columns)
        ds = ds.map_batches(
            _encode_stage_st,
            fn_kwargs=dict(tier=tier, bias=bias),
            batch_format="pyarrow",
            batch_size=None,
        )
        ds = ds.groupby("st_bucket").map_groups(
            lambda t: t.sort_by("cell_id"), batch_format="pyarrow"
        )
        dest = os.path.join(out_dir, f"group={gi:06d}")
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)
        ds.write_parquet(tmp, partition_cols=["st_bucket"])
        os.replace(tmp, dest)
        rows_group = sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(os.path.join(dest, "st_bucket=*", "*.parquet"))
        )
        file_rows = {f: pq.read_metadata(f).num_rows for f in group}
        if sum(file_rows.values()) != rows_group:
            raise RuntimeError(f"st ingest row mismatch for {dest}")
        for f in group:
            mf.write_entry(
                manifest_dir,
                f,
                {"input_file": f, "file_rows": file_rows[f], "output_dir": dest,
                 "bias": bias, "tier": tier},
            )
        total_rows += rows_group
    return {"files": len(files), "rows": total_rows, "skipped": skipped}


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
        # sorted-by-cell_id within each bucket file: parquet row-group
        # statistics then prune cell-id RANGES inside a bucket (the
        # KV-store's SFC-sorted scan order, SortedIndexStrategy role);
        # the pruned readers push bbox cell ranges as a read filter
        ds = ds.groupby("cell_bucket").map_groups(
            lambda t: t.sort_by("cell_id"), batch_format="pyarrow"
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
