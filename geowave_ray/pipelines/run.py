"""Checkpointed end-to-end headline job: pages -> geotag -> broadcast
PIP join -> partitioned pair output, with per-partition lineage and
resume.

This is the north rule's "resumable from checkpoint with per-partition
lineage + metrics" applied to the JOIN job itself (the ingest pipeline
has its own manifest in ``pipelines/ingest.py``): partition = input
shard group, output written atomically (tmp + rename), manifest entry
records {input files, page rows, matched pairs, wall seconds, output
dir}; a rerun skips complete groups and replays only the rest from the
original Parquet files.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..geotag import geotag_batch
from ..state import manifest as mf
from .spatial_join import broadcast_pip_join


def run_join_job(
    pages_dir: str,
    regions_parquet: str,
    out_dir: str,
    resume: bool = True,
    files_per_group: int = 8,
    emit_region_idx: bool = True,
) -> dict:
    """Returns {groups, skipped, pages, pairs, sec}."""
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    regions = pq.read_table(regions_parquet)
    manifest_dir = os.path.join(out_dir, "_manifest")
    groups = [
        files[i : i + files_per_group] for i in range(0, len(files), files_per_group)
    ]
    total_pages = total_pairs = skipped = 0
    t_start = time.time()
    for gi, group in enumerate(groups):
        key = "|".join(group)
        if resume and mf.is_complete(manifest_dir, key):
            skipped += 1
            continue
        t0 = time.time()
        ds = ray.data.read_parquet(group, columns=["row_id", "url", "lang"])
        ds = ds.map_batches(geotag_batch, batch_format="pyarrow", batch_size=None)
        pairs = broadcast_pip_join(
            ds,
            regions,
            keep_cols=("row_id",) if emit_region_idx else ("url",),
            region_cols=() if emit_region_idx else ("region_id",),
            emit_region_idx=emit_region_idx,
        )
        dest = os.path.join(out_dir, f"part={gi:05d}")
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)
        pairs.write_parquet(tmp)
        os.replace(tmp, dest)
        n_pairs = sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(os.path.join(dest, "*.parquet"))
        )
        n_pages = sum(pq.read_metadata(f).num_rows for f in group)
        mf.write_entry(
            manifest_dir,
            key,
            {
                "input_files": group,
                "pages": n_pages,
                "pairs": n_pairs,
                "sec": round(time.time() - t0, 3),
                "output_dir": dest,
            },
        )
        total_pages += n_pages
        total_pairs += n_pairs
    return {
        "groups": len(groups),
        "skipped": skipped,
        "pages": total_pages,
        "pairs": total_pairs,
        "sec": round(time.time() - t_start, 3),
    }
