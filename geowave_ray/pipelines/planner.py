"""Index planner: route a query's constraints to the best physical
layout — the ``chooseBestIndex`` role
(``core/store/.../base/BaseDataStoreUtils.java:1004-1150``: the
reference ranks each candidate index by how many of its dimensions the
query constrains, preferring full-coverage matches; attribute/data-id
lookups short-circuit to the secondary index).

The repo has four physical layouts; the planner picks per query
instead of callers hard-wiring one (VERDICT r2 #7):

- ``attribute``        — column-sorted parquet secondary index
                         (``sources/attribute_index.py``): exact/range
                         lookups on an indexed column.
- ``spatial_temporal`` — ``st_bucket = time_bin * n_sb + sb`` composite
                         store: queries constraining BOTH space & time
                         (and time-only queries — the spatial dimension
                         degrades to all-buckets, time bins still prune).
- ``spatial``          — ``cell_bucket`` store: bbox-only constraints
                         (a time window, if present without the st
                         store, filters downstream).
- ``full_scan``        — the raw table.

Every route still applies the exact fine filter downstream, so the
planner changes I/O, never results.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data

_WORLD = (-180.0, -90.0, 180.0, 90.0)


@dataclass
class Catalog:
    """Available physical layouts for one logical table."""

    spatial_store: str | list | None = None
    st_store: str | None = None
    st_bias: str = "BALANCED"
    attr_indexes: dict[str, str] = field(default_factory=dict)
    # col -> (index_dir, sorted term list) — EnumIndexStrategy layout
    # (text_index.build_enum_index partition tree, possibly one subtree
    # per ingest group)
    enum_indexes: dict[str, tuple] = field(default_factory=dict)
    table_dir: str | None = None


@dataclass
class Constraints:
    """Normalized query constraints.

    ``boxes``: list of (xmin, ymin, xmax, ymax); ``time``: one (t0_us,
    t1_us) half-open window applied to every box, or a LIST of per-box
    windows aligned with ``boxes``; ``attr``: ("col", values) point
    lookup or ("col", lo, hi) range."""

    boxes: list[tuple] | None = None
    time: tuple | list | None = None
    attr: tuple | None = None


def choose_best_index(c: Constraints, cat: Catalog) -> str:
    """The routing table (ranked like ``chooseBestIndex``)."""
    spatial = bool(c.boxes)
    temporal = c.time is not None
    if c.attr is not None and not spatial and not temporal:
        col = c.attr[0]
        if len(c.attr) == 2 and col in cat.enum_indexes:
            # enum partition prune beats row-group prune — but ONLY
            # when every queried value is in the declared enumeration
            # (EnumIndexStrategy skips out-of-enumeration rows, so a
            # non-enumerated value must not be served from this index)
            terms = set(cat.enum_indexes[col][1])
            if all(v in terms for v in c.attr[1]):
                return "enum"
        if col in cat.attr_indexes:
            return "attribute"
        return "full_scan"
    if spatial and temporal and cat.st_store:
        return "spatial_temporal"
    if spatial and cat.spatial_store is not None:
        return "spatial"
    if temporal and cat.st_store:
        return "spatial_temporal"  # time bins prune; spatial dim open
    return "full_scan"


def plan_read(
    c: Constraints, cat: Catalog, columns=None
) -> tuple[ray.data.Dataset, dict]:
    """Route + pruned read. Returns (dataset, info); ``info`` carries
    the chosen index and its pruning evidence. The returned dataset is
    a SUPERSET of the constraint (partition/row-group pruned); exact
    predicates still run downstream, identical for every route."""
    route = choose_best_index(c, cat)
    info: dict = {"index": route}

    if route == "enum":
        from ..text_index import enum_partition_files

        col = c.attr[0]
        idx_dir, terms = cat.enum_indexes[col]
        files, read, total = enum_partition_files(idx_dir, terms, c.attr[1])
        info["partitions_read"] = read
        info["partitions_total"] = total
        if not files:
            # schema-correct empty: zero rows of any real partition
            import glob as _g
            import os as _os

            allf = sorted(
                _g.glob(_os.path.join(idx_dir, "**", "*.parquet"),
                        recursive=True)
            )
            ds = ray.data.read_parquet(allf[:1], columns=columns).limit(0)
            return ds, info
        return ray.data.read_parquet(files, columns=columns), info

    if route == "attribute":
        import pyarrow.compute as pc

        from ..sources.attribute_index import row_groups_scanned

        col = c.attr[0]
        idx_dir = cat.attr_indexes[col]
        if len(c.attr) == 2:  # point lookup(s)
            vals = list(c.attr[1])
            filt = pc.field(col).isin(vals)
            lo, hi = min(vals), max(vals)
        else:
            lo, hi = c.attr[1], c.attr[2]
            filt = (pc.field(col) >= lo) & (pc.field(col) <= hi)
        scanned, total = row_groups_scanned(idx_dir, col, lo, hi)
        info["row_groups_scanned"] = scanned
        info["row_groups_total"] = total
        return ray.data.read_parquet(idx_dir, columns=columns, filter=filt), info

    if route == "spatial_temporal":
        from .query import read_pages_st_pruned

        boxes = c.boxes or [_WORLD]
        times = c.time if isinstance(c.time, list) else [c.time] * len(boxes)
        ds, pinfo = read_pages_st_pruned(
            cat.st_store,
            [
                (x0, y0, x1, y1, t0, t1)
                for (x0, y0, x1, y1), (t0, t1) in zip(boxes, times)
            ],
            bias=cat.st_bias,
            columns=columns,
        )
        info.update(pinfo)
        return ds, info

    if route == "spatial":
        from .query import read_pages_pruned_multi

        ds, pinfo = read_pages_pruned_multi(
            cat.spatial_store, list(c.boxes), columns=columns
        )
        info.update(pinfo)
        return ds, info

    if cat.table_dir is None:
        raise ValueError("full_scan route requires Catalog.table_dir")
    return ray.data.read_parquet(cat.table_dir, columns=columns), info


def explain(c: Constraints, cat: Catalog) -> dict:
    """``geowave explain`` role (``ExplainCommand.java`` — prints the
    chosen index and the scan ranges a query WOULD use, without
    running it). Driver-side only: route + pruning arithmetic, no
    Dataset is built and no data files are opened (attribute route
    reads parquet FOOTERS only)."""
    route = choose_best_index(c, cat)
    info: dict = {"index": route}
    if route == "enum":
        from ..text_index import enum_partition_files

        col = c.attr[0]
        idx_dir, terms = cat.enum_indexes[col]
        _, read, total = enum_partition_files(idx_dir, terms, c.attr[1])
        info.update(partitions_read=read, partitions_total=total)
        return info
    if route == "attribute":
        from ..sources.attribute_index import row_groups_scanned

        col = c.attr[0]
        if len(c.attr) == 2:
            vals = list(c.attr[1])
            lo, hi = min(vals), max(vals)
        else:
            lo, hi = c.attr[1], c.attr[2]
        scanned, total = row_groups_scanned(cat.attr_indexes[col], col, lo, hi)
        info.update(row_groups_scanned=scanned, row_groups_total=total)
        return info
    if route == "spatial":
        from .query import _bucket_dirs, buckets_for_bbox

        union: set[int] = set()
        for (x0, y0, x1, y1) in c.boxes:
            union |= buckets_for_bbox(x0, y0, x1, y1)
        pairs = _bucket_dirs(cat.spatial_store)
        info.update(
            buckets_read=len(union),
            buckets_total=64,
            dirs_read=sum(1 for b, _ in pairs if b in union),
            dirs_total=len(pairs),
        )
        return info
    if route == "spatial_temporal":
        from .ingest import ST_BIAS, _DAY_US
        from .query import _bucket_dirs, buckets_for_bbox

        cfg = ST_BIAS[cat.st_bias]
        nsb = cfg["n_spatial_buckets"]
        bin_us = cfg["bin_days"] * _DAY_US
        boxes = c.boxes or [_WORLD]
        times = c.time if isinstance(c.time, list) else [c.time] * len(boxes)
        wanted: set[int] = set()
        for (x0, y0, x1, y1), (t0, t1) in zip(boxes, times):
            sbs = buckets_for_bbox(x0, y0, x1, y1, n_buckets=nsb)
            for tb in range(int(t0) // bin_us, (int(t1) - 1) // bin_us + 1):
                for sb in sbs:
                    wanted.add(tb * nsb + sb)
        pairs = _bucket_dirs(cat.st_store, col="st_bucket")
        info.update(
            st_buckets_read=len([b for b, _ in pairs if b in wanted]),
            st_buckets_total=len(pairs),
        )
        return info
    return info
