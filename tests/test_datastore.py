"""DataStore facade (datastore.py — the reference's primary user API,
core/store/api/DataStore.java:53-475): addType / createWriter / ingest
/ query (bbox, CQL, GWQL string) / aggregate / statistics / delete /
copyTo / removeType / deleteAll over facade-managed stores."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geowave_ray.datastore import DataStore


def _points(n, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "pid": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(rng.uniform(-170, 170, n), pa.float64()),
            "lat": pa.array(rng.uniform(-80, 80, n), pa.float64()),
            "kind": pa.array([["a", "b", "c"][i % 3] for i in range(n)]),
        }
    )


@pytest.fixture()
def store(tmp_path, ray_session):
    s = DataStore(str(tmp_path / "store"))
    s.add_type("roads")
    with s.create_writer("roads") as w:
        w.write(_points(3000))
    return s


def test_type_registry(tmp_path):
    s = DataStore(str(tmp_path / "s"))
    s.add_type("a")
    s.add_type("b", lon_col="x", lat_col="y", n_buckets=16)
    assert s.get_types() == ["a", "b"]
    assert s.get_type("b")["n_buckets"] == 16
    assert s.get_indices("a") == ["spatial"]
    with pytest.raises(ValueError):
        s.add_type("a")
    s.remove_type("a")
    assert s.get_types() == ["b"]
    s.delete_all()
    assert s.get_types() == []


def test_writer_appends_groups_with_layout(store):
    t = _points(500, seed=9)
    with store.create_writer("roads") as w:
        for i in range(t.num_rows):  # row-at-a-time write() API
            if i < 5:
                w.write({k: t.column(k)[i].as_py() for k in t.column_names})
        w.write(t.slice(5))
    groups = sorted(
        os.listdir(os.path.dirname(store._type_dir("roads") + "/x"))
    )
    gdir = store._type_dir("roads")
    assert sorted(g for g in os.listdir(gdir) if g.startswith("group=")) == [
        "group=000000", "group=000001",
    ]
    # bucket partitioning + cell_id sort inside each bucket file
    part = next(
        os.path.join(r, f)
        for r, _, fs in os.walk(gdir) for f in fs if f.endswith(".parquet")
    )
    tt = pq.read_table(part)
    cid = tt.column("cell_id").to_numpy()
    assert (np.diff(cid.astype(np.uint64).astype(np.int64)) >= 0).all() or (
        np.diff(cid) >= 0
    ).all()
    assert store.aggregate("roads", "count") == 3500


def test_query_bbox_matches_bruteforce(store):
    box = (-60.0, -30.0, 55.0, 40.0)
    got = store.query_bbox("roads", box).to_pandas()
    full = store._scan("roads").to_pandas()
    want = full[
        (full.lon >= box[0]) & (full.lon <= box[2])
        & (full.lat >= box[1]) & (full.lat <= box[3])
    ]
    assert sorted(got["pid"]) == sorted(want["pid"])


def test_query_gwql_and_cql(store):
    out = store.query(
        "SELECT pid FROM roads WHERE BBOX(geometry, -60, -30, 55, 40) "
        "AND kind = 'a'"
    ).to_pandas()
    full = store._scan("roads").to_pandas()
    want = full[
        (full.lon >= -60) & (full.lon <= 55)
        & (full.lat >= -30) & (full.lat <= 40) & (full.kind == "a")
    ]
    assert sorted(out["pid"]) == sorted(want["pid"])
    out_cql = store.query_cql(
        "roads", "BBOX(geometry, -60, -30, 55, 40) AND kind = 'a'"
    ).to_pandas()
    assert sorted(out_cql["pid"]) == sorted(want["pid"])


def test_aggregates_and_statistics(store):
    full = store._scan("roads").to_pandas()
    assert store.aggregate("roads", "count") == len(full)  # manifest, no scan
    bb = store.aggregate("roads", "bbox")
    assert bb["xmin"] == full.lon.min() and bb["ymax"] == full.lat.max()
    assert store.aggregate("roads", "max", "pid") == full.pid.max()
    assert store.get_statistic_value("roads", "count") == len(full)
    hist = store.get_statistic_value("roads", "bucket_histogram")
    assert sum(hist.values()) == len(full)
    rt = store.recalc_statistic("roads")
    assert sum(rt.column("n").to_pylist()) == len(full)


def test_delete_rewrites_and_fixes_stats(store):
    full = store._scan("roads").to_pandas()
    n_b = (full.kind == "b").sum()
    deleted = store.delete("roads", "kind = 'b'")
    assert deleted == n_b
    left = store._scan("roads").to_pandas()
    assert len(left) == len(full) - n_b
    assert (left.kind != "b").all()
    # manifest statistics rebuilt: optimal count matches the data
    assert store.get_statistic_value("roads", "count") == len(left)
    assert store.aggregate("roads", "count") == len(left)
    # pruned query still works on the rewritten layout
    got = store.query_bbox("roads", (-60, -30, 55, 40)).to_pandas()
    want = left[
        (left.lon >= -60) & (left.lon <= 55)
        & (left.lat >= -30) & (left.lat <= 40)
    ]
    assert sorted(got["pid"]) == sorted(want["pid"])


def test_crash_leftover_dirs_are_ignored(store):
    """group=N.new/.tmp/.old from an interrupted rewrite must not be
    read, renumbered over, or counted (review finding)."""
    import shutil

    gdir = store._type_dir("roads")
    src = os.path.join(gdir, "group=000000")
    for suffix in (".new", ".tmp", ".old"):
        shutil.copytree(src, src + suffix)
    full = store._scan("roads").to_pandas()
    assert len(full) == 3000  # leftovers not double-read
    # appends still allocate the next clean number
    with store.create_writer("roads") as w:
        w.write(_points(10, seed=4))
    assert os.path.basename(store._groups("roads")[-1]) == "group=000001"
    # delete doesn't resurrect or swap leftover dirs
    store.delete("roads", "kind = 'c'")
    assert store.aggregate("roads", "count") == len(
        store._scan("roads").to_pandas()
    )
    for suffix in (".new", ".tmp", ".old"):
        shutil.rmtree(src + suffix, ignore_errors=True)


def test_generic_ingest_requires_coordinates(tmp_path, ray_session):
    import pyarrow.parquet as pqt

    s = DataStore(str(tmp_path / "g"))
    s.add_type("pts")
    src = tmp_path / "in"
    os.makedirs(src)
    pqt.write_table(_points(500), str(src / "a.parquet"))
    res = s.ingest("pts", str(src))
    assert res["rows"] == 500
    assert s.aggregate("pts", "count") == 500
    # real coordinates survive (no geotag derivation)
    got = s._scan("pts").to_pandas().sort_values("pid")
    want = _points(500).to_pandas().sort_values("pid")
    assert np.allclose(got["lon"].to_numpy(), want["lon"].to_numpy())
    # resume: second run skips everything
    res2 = s.ingest("pts", str(src))
    assert res2["skipped"] == 1 and res2["rows"] == 0
    # an input without the coordinate columns is refused loudly
    bad = tmp_path / "bad"
    os.makedirs(bad)
    pqt.write_table(
        pa.table({"url": ["a"], "lang": ["en"]}), str(bad / "b.parquet")
    )
    s.add_type("web")
    with pytest.raises(ValueError, match="coordinate columns"):
        s.ingest("web", str(bad))


def test_copy_to_rebuckets(store, tmp_path):
    other = DataStore(str(tmp_path / "copy"))
    store.copy_to(other, "roads", n_buckets=16)
    assert other.get_type("roads")["n_buckets"] == 16
    a = store._scan("roads").to_pandas().sort_values("pid").reset_index(drop=True)
    b = other._scan("roads").to_pandas().sort_values("pid").reset_index(drop=True)
    assert a["pid"].tolist() == b["pid"].tolist()
    got = other.query_bbox("roads", (-60, -30, 55, 40)).to_pandas()
    want = a[(a.lon >= -60) & (a.lon <= 55) & (a.lat >= -30) & (a.lat <= 40)]
    assert sorted(got["pid"]) == sorted(want["pid"])


def test_query_with_authorizations(tmp_path, ray_session):
    s = DataStore(str(tmp_path / "vis"))
    s.add_type("obs")
    t = _points(300)
    vis = pa.array(
        [["", "secret", "secret&ops", "public|ops"][i % 4] for i in range(300)]
    )
    with s.create_writer("obs") as w:
        w.write(t.append_column("visibility", vis))
    box = (-180.0, -90.0, 180.0, 90.0)
    all_rows = s.query_bbox("obs", box).to_pandas()
    assert len(all_rows) == 300
    got = s.query_bbox("obs", box, authorizations={"secret"}).to_pandas()
    # visible: empty (public) + 'secret'; not 'secret&ops' or 'public|ops'
    assert len(got) == 75 + 75
    got2 = s.query_bbox(
        "obs", box, authorizations={"secret", "ops"}
    ).to_pandas()
    assert len(got2) == 300


def test_bulk_ingest_path(tmp_path, ray_session):
    import glob as _glob

    from geowave_ray.fixtures import ensure_fixtures

    s = DataStore(str(tmp_path / "bulk"))
    s.add_type("pages")
    fx = ensure_fixtures("sf0.001")
    res = s.ingest("pages", os.path.join(fx, "pages"),
                   columns=["row_id", "url", "warc_ts", "lang"])
    assert res["rows"] > 0
    assert s.aggregate("pages", "count") == res["rows"]
    assert _glob.glob(os.path.join(s._type_dir("pages"), "group=*"))

def test_time_range_projection_tend_only(tmp_path, ray_session):
    """ADVICE r4: a t_end-ONLY time-range query with an explicit columns
    list must still project the time column into the pruned read (the
    fine filter reads it), and same for t_start-only."""
    s = DataStore(str(tmp_path / "tr"))
    s.add_type("obs", time_col="ts")
    t = _points(400)
    ts = pa.array(
        (np.datetime64("2024-01-01") + np.arange(400).astype("timedelta64[h]"))
        .astype("datetime64[us]")
    )
    with s.create_writer("obs") as w:
        w.write(t.append_column("ts", ts))
    box = (-180.0, -90.0, 180.0, 90.0)
    end = "2024-01-05"
    got = s.query_bbox("obs", box, columns=["pid"], t_end=end).to_pandas()
    want = (np.datetime64(end) - np.datetime64("2024-01-01")) // np.timedelta64(1, "h")
    assert sorted(got["pid"]) == list(range(int(want)))
    assert list(got.columns) == ["pid"]
    got2 = s.query_bbox("obs", box, columns=["pid"], t_start=end).to_pandas()
    assert sorted(got2["pid"]) == list(range(int(want), 400))


def test_bulk_ingest_resume_is_idempotent(tmp_path, ray_session):
    """ADVICE r4: a crash AFTER the group dir lands but BEFORE the
    per-file completeness entries are written must not duplicate rows
    on rerun — the group name is derived from the input file list, so
    the rerun rewrites the same dir."""
    import glob as _glob

    import pyarrow.parquet as pqt

    s = DataStore(str(tmp_path / "res"))
    s.add_type("pts")
    src = tmp_path / "in"
    os.makedirs(src)
    pqt.write_table(_points(700), str(src / "a.parquet"))
    s.ingest("pts", str(src))
    assert s.aggregate("pts", "count") == 700
    # simulate the crash window: wipe the per-FILE completeness entries
    # (keep the group dir + its group-keyed manifest entry)
    from geowave_ray.state import manifest as mf

    man = os.path.join(s._type_dir("pts"), "_manifest")
    for f in sorted(_glob.glob(os.path.join(str(src), "*.parquet"))):
        p = mf._entry_path(man, f)
        assert os.path.exists(p)
        os.remove(p)
    res2 = s.ingest("pts", str(src))
    assert res2["skipped"] == 0  # it did re-run the group...
    # ...but into the SAME deterministic dir: no duplicate rows
    groups = _glob.glob(os.path.join(s._type_dir("pts"), "group=*"))
    assert len(groups) == 1
    assert s._scan("pts").count() == 700
    assert s.aggregate("pts", "count") == 700


def test_safe_bbox_conjunct_ignores_string_literals(store):
    """ADVICE r4: clause-terminator keywords and OR inside string
    literals must not confuse the pruning-safety analysis."""
    # 'limit one' inside a literal + a top-level OR after it: pruning
    # must be REFUSED (full scan), and results must include the other
    # disjunct's rows outside the bbox.
    q = ("SELECT pid FROM roads WHERE BBOX(geometry, 0, 0, 1, 1) "
         "AND kind = 'limit one' OR kind = 'a'")
    assert DataStore._safe_bbox_conjunct(q) is None
    got = store.query(q).to_pandas()
    full = store._scan("roads").to_pandas()
    want = full[
        ((full.lon >= 0) & (full.lon <= 1) & (full.lat >= 0) & (full.lat <= 1)
         & (full.kind == "limit one")) | (full.kind == "a")
    ]
    assert sorted(got["pid"]) == sorted(want["pid"])
    # an OR INSIDE a literal is not a disjunction: pruning stays on
    q2 = ("SELECT pid FROM roads WHERE BBOX(geometry, -60, -30, 55, 40) "
          "AND kind = 'a or b'")
    assert DataStore._safe_bbox_conjunct(q2) == (-60.0, -30.0, 55.0, 40.0)


def test_index_planning_routes_and_extends(store):
    """Facade-level chooseBestIndex (VERDICT r4 #8,
    BaseDataStoreUtils.java:1004-1150): a leading non-spatial equality
    routes through the enum/attribute secondary index, appends extend
    the index, non-enumerated values and disjunctions fall back, and a
    BBOX-led conjunction still wins the spatial route."""
    store.add_index("roads", "kind", kind="enum")
    store.add_index("roads", "pid", kind="attribute")

    q = "SELECT pid, kind FROM roads WHERE kind = 'b'"
    plan = store.explain(q)
    assert plan["index"] == "enum"
    assert plan["partitions_read"] < plan["partitions_total"]
    got = sorted(store.query(q).to_pandas()["pid"])
    full = store._scan("roads").to_pandas()
    assert got == sorted(full[full.kind == "b"]["pid"])

    # attribute-index route for the numeric column
    plan2 = store.explain("SELECT pid FROM roads WHERE pid = 17")
    assert plan2["index"] == "attribute"
    assert store.query(
        "SELECT pid, kind FROM roads WHERE pid = 17"
    ).to_pandas()["pid"].tolist() == [17]

    # append through the writer: indexes must serve the new rows
    t = _points(40, seed=9)
    t = t.set_column(3, "kind", pa.array(["b"] * 40))
    t = t.set_column(0, "pid", pa.array(np.arange(100000, 100040), pa.int64()))
    with store.create_writer("roads") as w:
        w.write(t)
    got2 = store.query(q).to_pandas()
    assert len(got2) == len(got) + 40

    # non-enumerated value: enum index must NOT serve it
    plan3 = store.explain("SELECT pid FROM roads WHERE kind = 'zz'")
    assert plan3["index"] != "enum"

    # disjunction: no index route (conservative full scan)
    assert DataStore._safe_attr_conjunct(
        "SELECT pid FROM roads WHERE kind = 'a' OR kind = 'b'"
    ) is None
    # literal containing OR is not a disjunction
    assert DataStore._safe_attr_conjunct(
        "SELECT pid FROM roads WHERE kind = 'a or b'"
    ) == ("kind", "a or b")

    # spatial predicate first: spatial route wins as before
    plan4 = store.explain(
        "SELECT pid FROM roads WHERE BBOX(geometry, 0, 0, 20, 20) "
        "AND kind = 'a'"
    )
    assert plan4["index"] == "spatial"
