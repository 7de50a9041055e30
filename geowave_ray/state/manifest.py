"""Per-partition lineage manifests + resumable-run bookkeeping.

The reference has no in-engine checkpointing (the durable KV store is
its implicit checkpoint); the north rule makes it explicit: every
output partition carries a manifest entry

    {input_file, row_count, cell_histogram, checksum, output_dir}

keyed by the immutable input identity, written atomically
(tmp + rename), so a rerun skips complete partitions and replays only
failed ones from their Parquet files. Statistics in the manifest
(cell histograms) also drive hot-cell salting and split planning —
the role of the reference's RowRangeHistogramStatistic
(``core/mapreduce/.../splits/SplitsProvider.java:62-380``) and
PartitionsStatistic.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any


def _entry_path(manifest_dir: str, key: str) -> str:
    safe = hashlib.sha256(key.encode()).hexdigest()[:24]
    return os.path.join(manifest_dir, f"{safe}.json")


def write_entry(manifest_dir: str, key: str, payload: dict[str, Any]) -> None:
    """Atomically record a completed partition."""
    os.makedirs(manifest_dir, exist_ok=True)
    path = _entry_path(manifest_dir, key)
    tmp = path + ".tmp"
    payload = dict(payload, key=key)
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)


def read_entry(manifest_dir: str, key: str) -> dict[str, Any] | None:
    path = _entry_path(manifest_dir, key)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def is_complete(manifest_dir: str, key: str) -> bool:
    return read_entry(manifest_dir, key) is not None


def load_all(manifest_dir: str) -> list[dict[str, Any]]:
    if not os.path.isdir(manifest_dir):
        return []
    out = []
    for name in sorted(os.listdir(manifest_dir)):
        if name.endswith(".json"):
            with open(os.path.join(manifest_dir, name)) as f:
                out.append(json.load(f))
    return out


def merged_cell_histogram(manifest_dir: str) -> dict[str, int]:
    """Merge per-partition cell histograms — feeds hot-cell salting."""
    hist: dict[str, int] = {}
    for e in load_all(manifest_dir):
        for cell, n in e.get("cell_histogram", {}).items():
            hist[cell] = hist.get(cell, 0) + n
    return hist
