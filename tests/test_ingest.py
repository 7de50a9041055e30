import glob
import os

import pyarrow.parquet as pq
import pytest

from geowave_ray import fixtures
from geowave_ray.pipelines import ingest
from geowave_ray.state import manifest as mf


@pytest.fixture()
def pages_dir(tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    for start in (0, 1000, 2000):
        t = fixtures.gen_pages_slice(start, start + 1000, 3000)
        pq.write_table(t, str(d / f"part-{start:06d}.parquet"))
    return str(d)


def test_ingest_writes_partitioned_layout_and_manifest(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    res = ingest.ingest_pages(pages_dir, out, files_per_group=2)
    assert res["rows"] == 3000
    assert res["skipped"] == 0
    parts = glob.glob(os.path.join(out, "group=*", "cell_bucket=*", "*.parquet"))
    assert parts
    # text byte-identical invariant survives ingest
    t = pq.read_table(os.path.join(out, "group=000000"))
    orig = pq.read_table(pages_dir)
    got = dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    for u, txt in zip(orig["url"].to_pylist(), orig["text"].to_pylist()):
        if u in got:
            assert got[u] == txt
    # manifest complete for every input file; histogram totals match
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    for f in files:
        assert mf.is_complete(os.path.join(out, "_manifest"), f)
    hist = mf.merged_cell_histogram(os.path.join(out, "_manifest"))
    assert sum(hist.values()) == 3000


def test_ingest_resume_skips_complete(ray_session, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ingest.ingest_pages(pages_dir, out, files_per_group=2)
    res2 = ingest.ingest_pages(pages_dir, out, files_per_group=2)
    assert res2["skipped"] == 3
    assert res2["rows"] == 0
    # partial completion: drop one manifest entry -> only its group reruns
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    path = mf._entry_path(os.path.join(out, "_manifest"), files[-1])
    os.remove(path)
    res3 = ingest.ingest_pages(pages_dir, out, files_per_group=2)
    assert res3["skipped"] == 2
    assert res3["rows"] == 1000


def test_ingest_partial_resume_preserves_all_rows(ray_session, pages_dir, tmp_path):
    """ADVICE repro: dropping one manifest entry and resuming must NOT
    destroy other groups' data — on-disk rows and optimal_count stay at
    the full total (group dirs have stable identity across resumes)."""
    from geowave_ray.stats import optimal_count

    out = str(tmp_path / "out")
    ingest.ingest_pages(pages_dir, out, files_per_group=1)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    # drop the FIRST file's entry (the old bug renumbered groups from 0
    # over the pending list, clobbering a completed group's dir)
    os.remove(mf._entry_path(os.path.join(out, "_manifest"), files[0]))
    res = ingest.ingest_pages(pages_dir, out, files_per_group=1)
    assert res["skipped"] == 2 and res["rows"] == 1000
    on_disk = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(out, "group=*", "cell_bucket=*", "*.parquet"))
    )
    assert on_disk == 3000
    assert optimal_count(os.path.join(out, "_manifest")) == 3000


def test_pruned_query_over_ingested_layout(ray_session, pages_dir, tmp_path):
    """bbox query over the ingested (cell_bucket-partitioned) layout
    with partition pruning returns exactly the full-scan result."""
    import pyarrow.parquet as pq
    import ray.data

    from geowave_ray.pipelines import query as qp
    from geowave_ray.pipelines.ingest import ingest_pages

    out = str(tmp_path / "ingested")
    ingest_pages(pages_dir, out, files_per_group=3)
    parts = glob.glob(os.path.join(out, "group=*"))
    box = (-80.0, 30.0, -70.0, 45.0)  # covers hot cluster 0
    pruned = qp.read_pages_pruned(parts, *box)
    got = qp.bbox_query(pruned, *box).to_pandas()
    full = pq.read_table(pages_dir)
    lon = full["lon"].to_numpy()
    lat = full["lat"].to_numpy()
    m = (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    import numpy as np

    expect = set(np.asarray(full["url"].to_pylist(), object)[m])
    assert expect, "test box should be non-empty"
    assert set(got["url"]) == expect


def test_join_job_checkpoint_resume(ray_session, pages_dir, tmp_path):
    """The headline join job resumes: complete partitions skip, pair
    counts match a single full run."""
    import pyarrow.parquet as pq

    from geowave_ray import fixtures
    from geowave_ray.pipelines.run import run_join_job
    from geowave_ray.state import manifest as mf

    regions_path = str(tmp_path / "regions.parquet")
    regions, _ = fixtures.gen_regions(64)
    pq.write_table(regions, regions_path)

    out = str(tmp_path / "joinout")
    r1 = run_join_job(pages_dir, regions_path, out, files_per_group=1)
    assert r1["skipped"] == 0 and r1["groups"] == 3
    # rerun: everything skips
    r2 = run_join_job(pages_dir, regions_path, out, files_per_group=1)
    assert r2["skipped"] == 3 and r2["pairs"] == 0
    # simulate a failed partition: drop its manifest entry + output
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    os.remove(mf._entry_path(os.path.join(out, "_manifest"), files[0]))
    r3 = run_join_job(pages_dir, regions_path, out, files_per_group=1)
    assert r3["skipped"] == 2
    # total pairs across manifests == full-run pairs
    entries = mf.load_all(os.path.join(out, "_manifest"))
    assert sum(e["pairs"] for e in entries) == r1["pairs"]


def test_spatial_temporal_composite_index(ray_session, pages_dir, tmp_path):
    """ST composite layout: (bbox, time-range) query over the pruned
    read equals the brute-force filter, and pruning actually skips
    partitions (SpatialTemporalDimensionalityTypeProvider semantics)."""
    import numpy as np

    from geowave_ray.pipelines.ingest import ingest_pages_st
    from geowave_ray.pipelines.query import read_pages_st_pruned

    out = str(tmp_path / "st")
    for bias in ("BALANCED", "TEMPORAL"):
        store = out + bias
        res = ingest_pages_st(pages_dir, store, bias=bias, files_per_group=3)
        assert res["rows"] == 3000
        full = pq.read_table(pages_dir)
        lon = full["lon"].to_numpy()
        lat = full["lat"].to_numpy()
        ts = full["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        box = (-80.0, 30.0, -70.0, 45.0)
        t0 = int(ts.min())
        t1 = t0 + (int(ts.max()) - t0) // 4
        ds, info = read_pages_st_pruned(store, [(*box, t0, t1)], bias=bias)
        got = ds.to_pandas()
        m = (
            (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
            & (ts >= t0) & (ts < t1)
        )
        gm = (
            (got["lon"] >= box[0]) & (got["lon"] <= box[2])
            & (got["lat"] >= box[1]) & (got["lat"] <= box[3])
            & (got["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64) >= t0)
            & (got["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64) < t1)
        )
        expect = set(np.asarray(full["url"].to_pylist(), object)[m])
        assert set(got["url"][gm]) == expect
        assert info["st_buckets_read"] < info["st_buckets_total"], (bias, info)


def test_cell_range_filter_trims_pruned_read(ray_session, pages_dir, tmp_path):
    """The sorted-layout cell-id range pushdown returns a strict subset
    of the kept buckets' rows (a superset of the bbox hits), and the
    fine filter result is unchanged."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from geowave_ray.pipelines import query as qp
    from geowave_ray.pipelines.ingest import ingest_pages

    out = str(tmp_path / "ingested")
    ingest_pages(pages_dir, out, files_per_group=3)
    parts = glob.glob(os.path.join(out, "group=*"))
    box = (-80.0, 30.0, -70.0, 45.0)

    pruned, info = qp.read_pages_pruned_multi(parts, [box])
    n_filtered = pruned.count()
    # bucket-only row count (no range filter): read the kept dirs raw
    import glob as g2

    keep_files = []
    for b, d in qp._bucket_dirs(parts):
        if b in qp.buckets_for_bbox(*box):
            keep_files.extend(g2.glob(os.path.join(d, "*.parquet")))
    n_buckets_only = sum(pq.read_metadata(f).num_rows for f in keep_files)
    assert 0 < n_filtered < n_buckets_only

    # per-file layout is sorted by cell_id (row-group stats usable)
    t = pq.read_table(keep_files[0], columns=["cell_id"])
    c = t["cell_id"].to_numpy()
    assert (np.diff(c) >= 0).all()

    got = qp.bbox_query(pruned, *box).to_pandas()
    full = pq.read_table(pages_dir)
    lon = full["lon"].to_numpy()
    lat = full["lat"].to_numpy()
    m = (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    expect = set(np.asarray(full["url"].to_pylist(), object)[m])
    assert set(got["url"]) == expect
