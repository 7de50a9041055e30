"""Store maintenance (CompactIndexCommand / CopyStoreCommand /
DeletePyramidLevelCommand / ExplainCommand roles)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geowave_ray import fixtures
from geowave_ray.pipelines import ingest
from geowave_ray.pipelines.maintenance import (
    compact_store,
    copy_store,
    delete_pyramid_level,
)
from geowave_ray.pipelines.planner import Catalog, Constraints, explain


@pytest.fixture()
def store(ray_session, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    for start in (0, 1000, 2000, 3000):
        t = fixtures.gen_pages_slice(start, start + 1000, 4000)
        pq.write_table(t, str(d / f"part-{start:06d}.parquet"))
    out = str(tmp_path / "store")
    ingest.ingest_pages(str(d), out, files_per_group=1)  # 4 groups
    return out


def _digest(files):
    """Order-free content digest: (rows, sum(cell_id), sum(row_id))."""
    t = pa.concat_tables([pq.read_table(f, columns=["cell_id", "row_id"]) for f in files])
    return (
        len(t),
        int(t.column("cell_id").to_numpy().astype(np.int64).sum()),
        int(t.column("row_id").to_numpy().sum()),
    )


def test_compact_merges_per_bucket_sorted(store, tmp_path, ray_session):
    src_files = glob.glob(os.path.join(store, "group=*", "cell_bucket=*", "*.parquet"))
    out = str(tmp_path / "compacted")
    summary = compact_store(store, out)
    dst_files = glob.glob(os.path.join(out, "cell_bucket=*", "*.parquet"))
    # one file per bucket, content identical, sorted by cell_id
    assert summary["files_out"] == summary["buckets"] == len(dst_files)
    assert summary["files_in"] == len(src_files) > len(dst_files)
    assert _digest(src_files) == _digest(dst_files)
    for f in dst_files[:8]:
        c = pq.read_table(f, columns=["cell_id"]).column("cell_id").to_numpy()
        assert (np.diff(c) >= 0).all()
    # manifest carried over
    assert os.path.isdir(os.path.join(out, "_manifest"))
    # pruned readers work on the compacted layout unchanged
    from geowave_ray.pipelines.query import read_pages_pruned

    ds = read_pages_pruned(out, -30, -30, 30, 30, columns=["cell_id"])
    assert ds.count() > 0


def test_compact_rows_per_file_split(store, tmp_path, ray_session):
    out = str(tmp_path / "compacted_split")
    summary = compact_store(store, out, rows_per_file=16)
    assert summary["files_out"] > summary["buckets"]
    src = glob.glob(os.path.join(store, "group=*", "cell_bucket=*", "*.parquet"))
    dst = glob.glob(os.path.join(out, "cell_bucket=*", "*.parquet"))
    assert _digest(src) == _digest(dst)
    assert max(pq.read_metadata(f).num_rows for f in dst) <= 16


def test_copy_store_rebuckets(store, tmp_path, ray_session):
    out = str(tmp_path / "copy16")
    res = copy_store(store, out, n_buckets=16)
    src = glob.glob(os.path.join(store, "group=*", "cell_bucket=*", "*.parquet"))
    dst = glob.glob(os.path.join(out, "cell_bucket=*", "*.parquet"))
    assert res["rows"] == _digest(src)[0]
    assert _digest(src) == _digest(dst)
    # every row sits in the bucket its cell_id maps to under the NEW count
    shift = np.uint64(2 * 16 - 8)
    for d in glob.glob(os.path.join(out, "cell_bucket=*")):
        b = int(os.path.basename(d).split("=")[1])
        assert 0 <= b < 16
        for f in glob.glob(os.path.join(d, "*.parquet")):
            cell = pq.read_table(f, columns=["cell_id"]).column("cell_id").to_numpy()
            got = (cell.astype(np.uint64) >> shift) % np.uint64(16)
            assert (got.astype(np.int64) == b).all()


def test_delete_pyramid_level(ray_session, tmp_path):
    t = pa.table(
        {
            "level": pa.array([0, 0, 1, 1, 2, 2], pa.int64()),
            "tile_x": pa.array([0, 1, 0, 1, 0, 1], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    src = str(tmp_path / "tiles")
    os.makedirs(src)
    pq.write_table(t, os.path.join(src, "t.parquet"))
    out = str(tmp_path / "tiles_out")
    delete_pyramid_level(src, out, level=1)
    back = pq.read_table(out)
    assert sorted(back.column("level").to_pylist()) == [0, 0, 2, 2]
    assert set(back.column("v").to_pylist()) == {1.0, 2.0, 5.0, 6.0}


def test_explain_routes_and_prunes(store, ray_session):
    cat = Catalog(spatial_store=store, table_dir=store)
    # spatial: small bbox prunes most buckets; no dataset built
    info = explain(Constraints(boxes=[(20, 10, 30, 20)]), cat)
    assert info["index"] == "spatial"
    assert 0 < info["buckets_read"] < info["buckets_total"]
    assert info["dirs_read"] <= info["dirs_total"]
    # no constraints -> full scan
    assert explain(Constraints(), cat)["index"] == "full_scan"
    # matches what plan_read actually does
    from geowave_ray.pipelines.planner import plan_read

    _, run_info = plan_read(Constraints(boxes=[(20, 10, 30, 20)]), cat)
    assert run_info["index"] == info["index"]
    assert run_info["buckets_read"] == info["buckets_read"]


def test_explain_cli(store):
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "geowave_ray.cli", "explain", store,
         "--bbox", "20", "10", "30", "20"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["index"] == "spatial" and info["buckets_read"] > 0


def test_recalc_stats_footer_only(store, ray_session):
    import pyarrow.parquet as _pq

    from geowave_ray.pipelines.maintenance import recalc_stats

    hist = recalc_stats(store).to_pandas()
    files = glob.glob(os.path.join(store, "group=*", "cell_bucket=*", "*.parquet"))
    truth = {}
    for f in files:
        b = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        truth[b] = truth.get(b, 0) + _pq.read_metadata(f).num_rows
    got = dict(zip(hist["cell_bucket"], hist["n"]))
    assert got == truth
    assert hist["n"].sum() == 4000


def test_presplit_balanced(store, ray_session):
    from geowave_ray.pipelines.maintenance import presplit_partitions, recalc_stats

    n_splits = 8
    sp = presplit_partitions(store, n_splits=n_splits).to_pandas()
    assert list(sp["split_idx"]) == list(range(1, n_splits))
    hist = recalc_stats(store).to_pandas()
    total = hist["n"].sum()
    cum = dict(zip(hist["cell_bucket"], hist["n"].cumsum()))
    b = list(hist["cell_bucket"])
    for _, r in sp.iterrows():
        bb = int(r["boundary_bucket"])
        # boundary reaches the k/n quantile...
        assert cum[bb] * n_splits >= r["split_idx"] * total
        # ...and is the FIRST bucket that does
        prev = [x for x in b if x < bb]
        if prev:
            assert cum[prev[-1]] * n_splits < r["split_idx"] * total
        assert r["rows_below"] == cum[bb]
    # boundaries are monotone
    assert (sp["boundary_bucket"].diff().dropna() >= 0).all()


def test_maintenance_refuses_in_place(tmp_path):
    """compact/copy must never rewrite a store onto itself (the CLI
    can be invoked with identical paths) — guard fires before any
    deletion, and a pre-existing out_dir survives a failed build."""
    import pytest
    from geowave_ray.pipelines import maintenance as m

    store = tmp_path / "store"
    store.mkdir()
    with pytest.raises(ValueError):
        m.compact_store(str(store), str(store))
    with pytest.raises(ValueError):
        m.compact_store(str(store), str(store / "nested"))
    with pytest.raises(ValueError):
        m.copy_store(str(store), str(store))
    # failed build (empty store) must not delete an existing out_dir
    out = tmp_path / "out"
    out.mkdir()
    (out / "keep.txt").write_text("x")
    with pytest.raises(ValueError):
        m.compact_store(str(store), str(out))
    assert (out / "keep.txt").read_text() == "x"
