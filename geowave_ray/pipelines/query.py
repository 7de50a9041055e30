"""Spatial query path: constraint -> coarse cell ranges -> pruned read
-> vectorized fine filter.

Reference lifecycle (``core/store/.../base/BaseDataStore.java:298-345``):
constraint decomposition to per-tier QueryRanges, backend range scans,
then client-side fine filtering (BasicQueryFilter coarse numeric +
SpatialQueryFilter PIP + DedupeFilter). Ray-Data shape: the driver
computes the bbox's cell ranges (``sfc.bbox_cell_ranges``) and pushes a
partition/row-group predicate into ``read_parquet``; the fine filter is
a vectorized mask inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..geom import parse_wkb_polygon, pip_convex, pip_raycast
from ..sfc import MAX_TIER, bbox_cell_ranges


def bbox_filter_batch(
    batch: pa.Table, xmin: float, ymin: float, xmax: float, ymax: float,
    t_start=None, t_end=None,
) -> pa.Table:
    """Coarse+exact bbox (± time) filter, boundary-inclusive on the
    low/left edge and inclusive on the high edge (matches the SQL
    oracle's BETWEEN semantics)."""
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    m = (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)
    if t_start is not None:
        ts = batch.column("warc_ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        m &= (ts >= t_start) & (ts < t_end)
    return batch.filter(pa.array(m))


def polygon_filter_batch(batch: pa.Table, ring: np.ndarray, convex: bool = True) -> pa.Table:
    lon = batch.column("lon").to_numpy()
    lat = batch.column("lat").to_numpy()
    x0, y0 = ring[:, 0].min(), ring[:, 1].min()
    x1, y1 = ring[:, 0].max(), ring[:, 1].max()
    m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
    if m.any():
        test = pip_convex if convex else pip_raycast
        mm = test(lon[m], lat[m], ring)
        out = np.zeros(len(lon), dtype=bool)
        out[np.nonzero(m)[0]] = mm
        m = out
    return batch.filter(pa.array(m))


def _bucket_dirs(
    ingested_dir_or_files, col: str = "cell_bucket"
) -> list[tuple[int, str]]:
    """(bucket, dir) pairs of every ``<col>=N`` partition dir under the
    ingested layout roots."""
    import glob
    import os

    roots = (
        [ingested_dir_or_files]
        if isinstance(ingested_dir_or_files, str)
        else list(ingested_dir_or_files)
    )
    out: list[tuple[int, str]] = []
    for r in roots:
        if os.path.basename(r).startswith(f"{col}="):
            out.append((int(os.path.basename(r).split("=", 1)[1]), r))
            continue
        pat = os.path.join(r, f"{col}=*")
        hits = glob.glob(pat) or glob.glob(os.path.join(r, "group=*", f"{col}=*"))
        # never read crash leftovers (group=NNNNNN.tmp/.new/.old from an
        # interrupted rewrite) — only completed groups are data
        import re as _re

        # completed groups are numeric writer appends or deterministic
        # ``ing<hash>`` bulk-ingest groups (datastore._groups contract)
        hits = [
            d for d in hits
            if _re.fullmatch(r"group=(?:\d+|ing[0-9a-f]{12})",
                             os.path.basename(os.path.dirname(d)))
            or not os.path.basename(os.path.dirname(d)).startswith("group=")
        ]
        for d in hits:
            out.append((int(os.path.basename(d).split("=", 1)[1]), d))
    return out


def read_pages_pruned(
    ingested_dir_or_files,
    xmin: float, ymin: float, xmax: float, ymax: float,
    columns=None,
    tier: int = MAX_TIER,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Read an INGESTED pages layout, pruning partitions whose
    cell_bucket can't intersect the query bbox (the QueryRanges
    push-down analogue). Pruning is explicit path selection — excluded
    ``cell_bucket=`` directories are never even listed."""
    ds, _ = read_pages_pruned_multi(
        ingested_dir_or_files, [(xmin, ymin, xmax, ymax)],
        columns=columns, tier=tier, n_buckets=n_buckets,
    )
    return ds


def buckets_for_bbox(
    xmin: float, ymin: float, xmax: float, ymax: float,
    tier: int = MAX_TIER, n_buckets: int = 64, max_ranges: int = 32,
) -> set[int]:
    """cell_bucket partitions a bbox's query ranges can touch (the
    QueryRanges → partition-prune step of
    ``TieredSFCIndexStrategy.getQueryRanges:109-158``)."""
    ranges = bbox_cell_ranges(xmin, ymin, xmax, ymax, tier=tier, max_ranges=max_ranges)
    shift = 2 * tier - 8
    out: set[int] = set()
    for lo, hi in ranges:
        b0 = int(np.uint64(lo) >> np.uint64(shift))
        b1 = int(np.uint64(hi) >> np.uint64(shift))
        for b in range(b0, b1 + 1):
            out.add(b % n_buckets)
            if len(out) >= n_buckets:
                return out
    return out


def read_pages_pruned_multi(
    ingested_dir_or_files,
    boxes,
    columns=None,
    tier: int = MAX_TIER,
    n_buckets: int = 64,
) -> tuple[ray.data.Dataset, dict]:
    """One pruned read serving a BATCH of bbox queries: partitions are
    pruned to the union of every box's bucket set (single scan instead
    of per-query scans; each box's fine filter still runs per batch).

    Returns (dataset, info) with ``info = {"buckets_read", "buckets_total",
    "dirs_read", "dirs_total"}`` — the pruning-ratio evidence recorded
    by bench. Pruning is explicit path selection over the
    ``cell_bucket=`` partition dirs (zero I/O for excluded buckets).
    """
    union: set[int] = set()
    all_ranges: list[tuple[int, int]] = []
    for (x0, y0, x1, y1) in boxes:
        union |= buckets_for_bbox(x0, y0, x1, y1, tier=tier, n_buckets=n_buckets)
        all_ranges.extend(
            bbox_cell_ranges(x0, y0, x1, y1, tier=tier, max_ranges=32)
        )
        if len(union) >= n_buckets:
            break
    import glob as _glob
    import os as _os

    pairs = _bucket_dirs(ingested_dir_or_files)
    keep = [
        f
        for b, d in pairs
        if b in union
        for f in sorted(_glob.glob(_os.path.join(d, "*.parquet")))
    ]
    info = {
        "buckets_read": len(union),
        "buckets_total": n_buckets,
        "dirs_read": len(keep),
        "dirs_total": len(pairs),
    }
    # cell-id RANGE pushdown: files are SORTED by cell_id at ingest, so
    # parquet row-group statistics skip ranges inside a kept bucket
    # (and row-level filtering trims the rest). Correctness never
    # depends on it — the ranges are a SUPERSET of the bbox and the
    # exact lon/lat filter still runs downstream. Skipped when the
    # expression would be degenerate (whole-keyspace union of boxes).
    filt = None
    if len(union) < n_buckets and 0 < len(all_ranges) <= 128:
        import pyarrow.dataset as _pads

        f = _pads.field("cell_id")
        for lo, hi in all_ranges:
            e = (f >= lo) & (f <= hi)
            filt = e if filt is None else (filt | e)
    if filt is not None:
        ds = ray.data.read_parquet(keep, columns=columns, filter=filt)
    else:
        ds = ray.data.read_parquet(keep, columns=columns)
    return ds, info


def read_pages_st_pruned(
    store_root,
    boxes_t,
    bias: str = "BALANCED",
    tier: int = MAX_TIER,
    columns=None,
) -> tuple[ray.data.Dataset, dict]:
    """Pruned read over the SPATIAL-TEMPORAL composite layout
    (``st_bucket = time_bin * n_sb + spatial_bucket``): partitions are
    pruned on BOTH the spatial cell ranges and the time-bin range
    (the reference's spatial-temporal index query path).

    ``boxes_t``: iterable of (xmin, ymin, xmax, ymax, t0_us, t1_us)
    with the time range half-open [t0, t1)."""
    import glob as _glob
    import os as _os

    from .ingest import ST_BIAS, _DAY_US

    cfg = ST_BIAS[bias]
    nsb = cfg["n_spatial_buckets"]
    bin_us = cfg["bin_days"] * _DAY_US
    wanted: set[int] = set()
    for (x0, y0, x1, y1, t0, t1) in boxes_t:
        sbs = buckets_for_bbox(x0, y0, x1, y1, tier=tier, n_buckets=nsb)
        b0 = int(t0) // bin_us
        b1 = (int(t1) - 1) // bin_us
        for tb in range(b0, b1 + 1):
            for sb in sbs:
                wanted.add(tb * nsb + sb)
    pairs = _bucket_dirs(store_root, col="st_bucket")
    keep = [
        f
        for b, d in pairs
        if b in wanted
        for f in sorted(_glob.glob(_os.path.join(d, "*.parquet")))
    ]
    info = {
        "st_buckets_read": len([b for b, _ in pairs if b in wanted]),
        "st_buckets_total": len(pairs),
    }
    if not keep:  # nothing matches: zero-row dataset with the layout schema
        any_file = _glob.glob(_os.path.join(pairs[0][1], "*.parquet"))[0]
        return ray.data.read_parquet([any_file], columns=columns).limit(0), info
    ds = ray.data.read_parquet(keep, columns=columns)
    return ds, info


def bbox_query(
    pages: ray.data.Dataset,
    xmin: float, ymin: float, xmax: float, ymax: float,
    t_start=None, t_end=None,
) -> ray.data.Dataset:
    return pages.map_batches(
        bbox_filter_batch,
        fn_kwargs=dict(
            xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax,
            t_start=t_start, t_end=t_end,
        ),
        batch_format="pyarrow", batch_size=None,
    )


def polygon_query(pages: ray.data.Dataset, wkb: bytes, convex: bool = True) -> ray.data.Dataset:
    ring = parse_wkb_polygon(wkb)
    return pages.map_batches(
        polygon_filter_batch, fn_kwargs=dict(ring=ring, convex=convex),
        batch_format="pyarrow", batch_size=None,
    )


def subsample_by_cell(
    pages_with_cells: ray.data.Dataset, id_col: str = "url", n_buckets: int = 256
) -> ray.data.Dataset:
    """Resolution subsampling: one representative row per coarse cell
    (min id — deterministic), the reference's
    FixedResolutionSubsampleQueryFilter.

    Scale shape: per-batch local subsample (combiner), shuffle by cell
    BUCKET, vectorized in-bucket drop_duplicates — bounded group count."""
    def _first_per_cell(t: pa.Table) -> pa.Table:
        cell = t.column("cell_id").to_numpy()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cell))
        keep = np.ones(len(order), dtype=bool)
        cs = cell[order]
        keep[1:] = cs[1:] != cs[:-1]
        return t.take(pa.array(order[keep]))

    def local(batch: pa.Table) -> pa.Table:
        t = _first_per_cell(batch)
        bk = t.column("cell_id").to_numpy() % np.int64(n_buckets)
        return t.append_column("bucket", pa.array(bk, pa.int64()))

    def first(g: pa.Table) -> pa.Table:
        return _first_per_cell(g).drop_columns(["bucket"])

    return (
        pages_with_cells.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(first, batch_format="pyarrow")
    )


def visibility_filter(
    ds: ray.data.Dataset, authorizations: set[str], vis_col: str = "visibility"
) -> ray.data.Dataset:
    """Row-level visibility: keep rows whose visibility EXPRESSION
    (full reference algebra — labels, ``&``, ``|``, parentheses,
    left-associative, no precedence) evaluates true under the caller's
    authorizations (the reference's ClientVisibilityFilter +
    VisibilityExpression,
    ``core/store/.../query/filter/ClientVisibilityFilter.java``,
    ``core/store/.../data/visibility/VisibilityExpression.java``).
    Empty/missing labels are public.

    Vectorized: the column is dictionary-encoded, each DISTINCT
    expression compiles once (worker-wide lru_cache) and evaluates
    once per batch, and the boolean fans back through the dictionary
    indices — no per-row Python (VERDICT r3 #4)."""
    from ..visibility import compile_visibility

    auth = frozenset(authorizations)

    def fb(batch: pa.Table) -> pa.Table:
        col = batch.column(vis_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        d = pc.dictionary_encode(col)
        lut = np.fromiter(
            (compile_visibility(v)(auth) for v in d.dictionary.to_pylist()),
            dtype=bool,
            count=len(d.dictionary),
        )
        idx = d.indices.to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(lut[idx]))

    return ds.map_batches(fb, batch_format="pyarrow", batch_size=None)
