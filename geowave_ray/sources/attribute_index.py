"""Attribute (secondary) index — sorted-column parquet layout.

Reference: ``core/store/.../api/AttributeIndex.java`` +
``SpatialAttributeIndexProvider`` — a secondary index sorts rows by an
attribute so attribute-range queries scan only the matching key range.
Parquet-native analogue: write the table GLOBALLY SORTED by the
attribute with small row groups; range queries push a filter into
``read_parquet`` and parquet row-group min/max statistics prune
everything outside the range (the sorted-KV-scan role).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import ray.data


def build_attribute_index(
    ds: ray.data.Dataset,
    column: str,
    out_dir: str,
    rows_per_group: int = 10_000,
) -> str:
    """Sort by ``column`` and write with bounded row groups; returns dir."""
    os.makedirs(out_dir, exist_ok=True)
    ds.sort(column).write_parquet(out_dir, row_group_size=rows_per_group)
    return out_dir


def query_attribute_range(index_dir: str, column: str, lo, hi) -> ray.data.Dataset:
    """Range scan [lo, hi] over the sorted layout — parquet row-group
    statistics prune non-overlapping groups at the read."""
    import pyarrow.compute as pc

    flt = (pc.field(column) >= lo) & (pc.field(column) <= hi)
    return ray.data.read_parquet(index_dir, filter=flt)


def row_groups_scanned(index_dir: str, column: str, lo, hi) -> tuple[int, int]:
    """(matching_row_groups, total_row_groups) from footer statistics —
    evidence that the sorted layout prunes (used by tests)."""
    match = total = 0
    for path in sorted(
        glob.glob(os.path.join(index_dir, "**", "*.parquet"), recursive=True)
    ):
        md = pq.read_metadata(path)
        arrow_names = md.schema.to_arrow_schema().names
        ci = arrow_names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                match += 1
    return match, total
