"""End-to-end pipeline tests vs brute-force oracles (the
GeoWaveSparkSpatialJoinIT / AbstractGeoWaveBasicVectorIT model:
exact count + id-set equality)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from geowave_ray import fixtures
from geowave_ray.geom import parse_wkb_polygon, pip_convex, planar_sqdist
from geowave_ray.pipelines import kde, knn, query, spatial_join, tiles


@pytest.fixture(scope="module")
def small(ray_session):
    pages = fixtures.gen_pages_slice(0, 2000, 2000)
    regions, edges = fixtures.gen_regions(96)
    return pages, regions, edges


def brute_force_pairs(pages: pa.Table, regions: pa.Table) -> set:
    lon = pages["lon"].to_numpy()
    lat = pages["lat"].to_numpy()
    urls = pages["url"].to_pylist()
    out = set()
    for j in range(regions.num_rows):
        ring = parse_wkb_polygon(regions["geometry_wkb"][j].as_py())
        m = pip_convex(lon, lat, ring)
        rid = regions["region_id"][j].as_py()
        for i in np.nonzero(m)[0]:
            out.add((urls[i], rid))
    return out


def test_broadcast_join_matches_bruteforce(small):
    pages, regions, _ = small
    ds = ray.data.from_arrow(pages)
    got = spatial_join.broadcast_pip_join(ds, regions, concurrency=2).to_pandas()
    got_set = set(zip(got["url"], got["region_id"]))
    expect = brute_force_pairs(pages, regions)
    assert got_set == expect
    assert len(got) == len(got_set)  # no duplicate pairs


def test_cogroup_join_matches_broadcast(small):
    pages, regions, _ = small
    pds = ray.data.from_arrow(pages)
    rds = ray.data.from_arrow(regions)
    got = spatial_join.cogroup_pip_join(pds, rds).to_pandas()
    got_set = set(zip(got["url"], got["region_id"]))
    assert got_set == brute_force_pairs(pages, regions)
    assert len(got) == len(got_set)


def test_anti_join(small):
    pages, regions, _ = small
    ds = ray.data.from_arrow(pages)
    got = spatial_join.broadcast_pip_join(ds, regions, mode="anti", concurrency=2).to_pandas()
    matched = {u for (u, r) in brute_force_pairs(pages, regions)}
    expect = set(pages["url"].to_pylist()) - matched
    assert set(got["url"]) == expect


def test_knn_matches_bruteforce(small):
    pages, _, _ = small
    qt = fixtures.gen_knn_queries(30)
    ds = ray.data.from_arrow(pages)
    got = knn.knn(ds, qt, concurrency=2).to_pandas()
    lon = pages["lon"].to_numpy()
    lat = pages["lat"].to_numpy()
    urls = np.asarray(pages["url"].to_pylist(), dtype=object)
    for qi in range(qt.num_rows):
        qid = qt["query_id"][qi].as_py()
        k = qt["k"][qi].as_py()
        d = planar_sqdist(qt["lon"][qi].as_py(), qt["lat"][qi].as_py(), lon, lat)
        order = np.lexsort((urls, d))[:k]
        expect = urls[order].tolist()
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert sub["url"].tolist() == expect, qid


def test_knn_pruned_exact_matches_full_scan(small, tmp_path):
    """Property: ring-expansion pruned kNN over the ingested store ==
    full-scan kNN, tie-break included (the reference's ring-expansion
    exactness bound, OrthodromicDistancePartitioner.java:61-112)."""
    import os

    import pyarrow.parquet as pq

    from geowave_ray.pipelines.ingest import ingest_pages

    pages, _, _ = small
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "part.parquet"))
    store = str(tmp_path / "store")
    ingest_pages(str(pdir), store)
    qt = fixtures.gen_knn_queries(30)
    full = knn.knn(ray.data.from_arrow(pages), qt, concurrency=2).to_pandas()
    for tier in (None, 4, 7):  # manifest-chosen + forced coarse/fine
        pruned = knn.knn_pruned_exact(
            store, qt, manifest_dir=os.path.join(store, "_manifest"), tier=tier
        ).to_pandas()
        a = pruned.sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a[["query_id", "rank", "url"]].equals(b[["query_id", "rank", "url"]]), tier


def test_bbox_and_polygon_query(small):
    pages, _, _ = small
    ds = ray.data.from_arrow(pages)
    qt = fixtures.gen_queries()
    lon = pages["lon"].to_numpy()
    lat = pages["lat"].to_numpy()
    # bbox
    r = qt.slice(4, 1)
    x0, y0, x1, y1 = (r[c][0].as_py() for c in ["xmin", "ymin", "xmax", "ymax"])
    got = query.bbox_query(ds, x0, y0, x1, y1).to_pandas()
    m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
    assert set(got["url"]) == set(np.asarray(pages["url"].to_pylist(), object)[m])
    # polygon
    polys = qt.filter(pa.compute.equal(qt["kind"], "polygon"))
    wkb = polys["geometry_wkb"][0].as_py()  # hot-cluster polygon -> non-empty
    ring = parse_wkb_polygon(wkb)
    got = query.polygon_query(ds, wkb).to_pandas()
    mm = pip_convex(lon, lat, ring)
    assert mm.sum() > 0
    assert set(got["url"]) == set(np.asarray(pages["url"].to_pylist(), object)[mm])


def test_tile_assignment_closed_form(small, ray_session):
    chunks = fixtures.gen_raster_chunks(32)
    ds = ray.data.from_arrow(chunks)
    got = tiles.assign_tiles(ds).to_pandas()
    for i in range(chunks.num_rows):
        cid = chunks["chunk_id"][i].as_py()
        xmin = chunks["xmin"][i].as_py()
        xmax = chunks["xmax"][i].as_py()
        ymin = chunks["ymin"][i].as_py()
        ymax = chunks["ymax"][i].as_py()
        w = chunks["width"][i].as_py()
        res = (xmax - xmin) / w
        level = int(np.clip(np.floor(np.log2(360.0 / (res * 64))), 0, 16))
        td = 360.0 / (1 << level)
        n_tiles = (
            (int(np.ceil((xmax + 180) / td)) - int(np.floor((xmin + 180) / td)))
            * (int(np.ceil((ymax + 90) / td)) - int(np.floor((ymin + 90) / td)))
        )
        sub = got[got["chunk_id"] == cid]
        assert len(sub) == n_tiles
        assert (sub["level"] == level).all()


def test_tile_merge_sum_and_avg(ray_session):
    # two identical fully-aligned chunks: sum doubles, avg equals single
    td = 360.0 / (1 << 8)  # level 8 tile
    chunk = dict(
        xmin=-180.0, ymin=-90.0, xmax=-180.0 + td, ymax=-90.0 + td,
        width=64, height=64,
    )
    pix = ((np.arange(64 * 64) % 97).astype(np.float64))
    t = pa.table(
        {
            "chunk_id": ["a", "b"],
            "xmin": [chunk["xmin"]] * 2,
            "ymin": [chunk["ymin"]] * 2,
            "xmax": [chunk["xmax"]] * 2,
            "ymax": [chunk["ymax"]] * 2,
            "width": pa.array([64, 64], pa.int32()),
            "height": pa.array([64, 64], pa.int32()),
            "pixels": pa.array([pix, pix], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t)
    merged = tiles.merge_tiles(ds, strategy="sum").to_pandas()
    assert len(merged) == 1
    got = np.asarray(merged["pixels"].iloc[0])
    assert np.allclose(got, 2 * pix)
    avg = tiles.merge_tiles(ds, strategy="avg").to_pandas()
    assert np.allclose(np.asarray(avg["pixels"].iloc[0]), pix)


def test_cell_histogram_and_rank(small):
    pages, _, _ = small
    ds = ray.data.from_arrow(pages)
    hist = kde.cell_histogram(ds, tier=6).to_pandas()
    assert hist["n"].sum() == pages.num_rows
    ranked = kde.cell_histogram_ranked(ds, tier=6).to_pandas()
    assert ranked["rank"].iloc[0] == 1
    assert (ranked.sort_values("rank")["n"].diff().dropna() <= 0).all()
    # hot clusters dominate: top-4 cells hold ~30% of rows
    assert ranked.nlargest(4, "n")["n"].sum() >= 0.29 * pages.num_rows


def test_subsample_by_cell(small):
    pages, _, _ = small
    from geowave_ray.stages.cell_encode import encode_points

    ds = ray.data.from_arrow(pages).map_batches(
        lambda b: encode_points(b, tier=4), batch_format="pyarrow"
    )
    sub = query.subsample_by_cell(ds).to_pandas()
    # one row per distinct cell, each the min-url representative
    full = encode_points(pages, tier=4).to_pandas()
    expect = full.sort_values("url").groupby("cell_id").first()
    assert len(sub) == full["cell_id"].nunique()
    got = sub.set_index("cell_id")["url"].sort_index()
    assert got.equals(expect["url"].sort_index())


def test_pip_join_ids_matches_string_pairs(small):
    pages, regions, _ = small
    ds = ray.data.from_arrow(pages)
    got = spatial_join.broadcast_pip_join(
        ds, regions, keep_cols=("row_id",), region_cols=(),
        emit_region_idx=True, concurrency=2,
    ).to_pandas()
    rid_by_row = dict(zip(pages["row_id"].to_pylist(), pages["url"].to_pylist()))
    region_ids = regions["region_id"].to_pylist()
    got_set = {(rid_by_row[r], region_ids[i]) for r, i in zip(got["row_id"], got["region_idx"])}
    assert got_set == brute_force_pairs(pages, regions)


def test_polygon_intersects_join(small):
    """Independent oracle: A intersects B iff a vertex of one is inside
    the other OR some edge pair crosses (different algorithm than the
    engine's SAT)."""
    _, regions, _ = small
    qt = fixtures.gen_queries()
    polys = qt.filter(pa.compute.equal(qt["kind"], "polygon"))
    got = spatial_join.polygon_intersects_join(
        ray.data.from_arrow(regions), polys
    ).to_pandas()
    got_set = set(zip(got["region_id"], got["query_id"]))

    def seg_cross(p1, p2, p3, p4):
        d1 = np.cross(p2 - p1, p3 - p1)
        d2 = np.cross(p2 - p1, p4 - p1)
        d3 = np.cross(p4 - p3, p1 - p3)
        d4 = np.cross(p4 - p3, p2 - p3)
        return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))

    expect = set()
    qrings = [parse_wkb_polygon(w.as_py())[:-1] for w in polys["geometry_wkb"]]
    qids = polys["query_id"].to_pylist()
    for i in range(regions.num_rows):
        a = parse_wkb_polygon(regions["geometry_wkb"][i].as_py())[:-1]
        rid = regions["region_id"][i].as_py()
        for j, b in enumerate(qrings):
            hit = (
                pip_convex(a[:, 0], a[:, 1], b).any()
                or pip_convex(b[:, 0], b[:, 1], a).any()
                or any(
                    seg_cross(a[x], a[(x + 1) % len(a)], b[y], b[(y + 1) % len(b)])
                    for x in range(len(a))
                    for y in range(len(b))
                )
            )
            if hit:
                expect.add((rid, qids[j]))
    assert got_set == expect


def test_broadcast_join_actor_pool_mode(small):
    """use_actors=True (callable-class actor pool) produces the same
    pairs as the stateless worker-cached mode."""
    pages, regions, _ = small
    ds = ray.data.from_arrow(pages)
    got = spatial_join.broadcast_pip_join(
        ds, regions, concurrency=2, use_actors=True
    ).to_pandas()
    assert set(zip(got["url"], got["region_id"])) == brute_force_pairs(pages, regions)


def test_polygon_within_contains_predicates(small, ray_session):
    """within/contains predicates on nested polygons."""
    import pyarrow as pa

    from geowave_ray.geom import polygon_wkb

    inner = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    outer = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0]])
    far = outer + 100.0
    left = pa.table(
        {
            "region_id": ["inner", "outer", "far"],
            "geometry_wkb": [polygon_wkb(inner), polygon_wkb(outer), polygon_wkb(far)],
        }
    )
    right = pa.table(
        {
            "query_id": ["OUTER"],
            "geometry_wkb": [polygon_wkb(outer)],
        }
    )
    lds = ray.data.from_arrow(left)
    w = spatial_join.polygon_intersects_join(lds, right, predicate="within").to_pandas()
    assert set(w["region_id"]) == {"inner", "outer"}
    c = spatial_join.polygon_intersects_join(lds, right, predicate="contains").to_pandas()
    assert set(c["region_id"]) == {"outer"}


def test_add_salt_stage(small):
    from geowave_ray.stages.cell_encode import add_salt, encode_points

    pages, _, _ = small
    enc = encode_points(pages, tier=6)
    cells = enc["cell_id"].to_numpy()
    hot = {int(c) for c in np.unique(cells)[:3]}
    salted = add_salt(enc, hot_cells=hot, n_salt=4)
    s = salted["salt"].to_numpy()
    mask_hot = np.isin(cells, np.fromiter(hot, dtype=np.int64))
    assert (s[~mask_hot] == 0).all()
    assert s[mask_hot].max() <= 3
    # deterministic
    s2 = add_salt(enc, hot_cells=hot, n_salt=4)["salt"].to_numpy()
    assert np.array_equal(s, s2)


def test_copart_bucket_rule_consistency(ray_session, tmp_path):
    """A point inside a region's covered cell must land in the same
    bucket as that region cell row (the co-partitioned join's
    correctness precondition)."""
    import numpy as np
    import pyarrow as pa

    from geowave_ray.geom import polygon_wkb
    from geowave_ray.pipelines.spatial_join import (
        _load_region_bucket,
        copart_pip_join,
        ingest_regions_store,
    )
    import ray.data

    rng = np.random.default_rng(2)
    # a few square regions + points inside them
    rids, wkbs, xmins, ymins, xmaxs, ymaxs = [], [], [], [], [], []
    pts_lon, pts_lat, expect = [], [], []
    for j in range(12):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        w = rng.uniform(0.5, 3.0)
        ring = np.array(
            [(cx - w, cy - w), (cx + w, cy - w), (cx + w, cy + w), (cx - w, cy + w)]
        )
        rid = f"r{j}"
        rids.append(rid)
        wkbs.append(polygon_wkb(ring))
        xmins.append(cx - w)
        ymins.append(cy - w)
        xmaxs.append(cx + w)
        ymaxs.append(cy + w)
        for _ in range(20):
            pts_lon.append(rng.uniform(cx - w * 0.9, cx + w * 0.9))
            pts_lat.append(rng.uniform(cy - w * 0.9, cy + w * 0.9))
            expect.append(rid)
    regions = pa.table(
        {
            "region_id": pa.array(rids),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "xmin": pa.array(xmins),
            "ymin": pa.array(ymins),
            "xmax": pa.array(xmaxs),
            "ymax": pa.array(ymaxs),
        }
    )
    store = str(tmp_path / "rstore")
    ingest_regions_store(regions, store)
    pts = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"p{i}" for i in range(len(pts_lon))]),
                "lon": pa.array(pts_lon),
                "lat": pa.array(pts_lat),
            }
        )
    ).repartition(3)
    out = copart_pip_join(pts, store).to_pandas()
    # every point matched its enclosing region (regions may overlap ->
    # >= expected pairs; every expected pair present)
    got = set(zip(out["url"], out["region_id"]))
    for i, rid in enumerate(expect):
        assert (f"p{i}", rid) in got


def test_index_planner_routing(ray_session, tmp_path):
    """chooseBestIndex routing table (BaseDataStoreUtils.java:1004-1150
    role): constraints pick the matching layout; every route is exact
    after the downstream fine filter."""
    from geowave_ray.pipelines.planner import (
        Catalog, Constraints, choose_best_index,
    )

    cat = Catalog(
        spatial_store="/s", st_store="/st",
        attr_indexes={"url": "/u"}, table_dir="/t",
    )
    box = [(0.0, 0.0, 1.0, 1.0)]
    t = (0, 10)
    assert choose_best_index(Constraints(attr=("url", ["a"])), cat) == "attribute"
    assert choose_best_index(Constraints(boxes=box, time=t), cat) == "spatial_temporal"
    assert choose_best_index(Constraints(boxes=box), cat) == "spatial"
    assert choose_best_index(Constraints(time=t), cat) == "spatial_temporal"
    assert choose_best_index(Constraints(), cat) == "full_scan"
    # degraded catalogs fall through the ranking
    no_st = Catalog(spatial_store="/s", table_dir="/t")
    assert choose_best_index(Constraints(boxes=box, time=t), no_st) == "spatial"
    assert choose_best_index(Constraints(time=t), no_st) == "full_scan"
    no_attr = Catalog(table_dir="/t")
    assert choose_best_index(Constraints(attr=("url", ["a"])), no_attr) == "full_scan"


def test_index_planner_reads(ray_session):
    """plan_read end-to-end over the sf0.001 stores: the attribute
    route returns the looked-up rows with row-group pruning evidence;
    the spatial-temporal route prunes st buckets."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    sf = "/root/testdata/sf0.001"
    from geowave_ray.pipelines.planner import Catalog, Constraints, plan_read

    cat = Catalog(
        spatial_store=em._ingested(sf),
        st_store=em._ingested_st(sf),
        attr_indexes={"url": em._url_index(sf)},
        table_dir=f"{em._fx(sf)}/pages",
    )
    targets = [f"https://site{i % 16}.example/{i:012d}" for i in range(0, 30, 10)]
    ds, info = plan_read(Constraints(attr=("url", targets)), cat, columns=["url"])
    assert info["index"] == "attribute" and info["row_groups_total"] > 0
    got = sorted(r["url"] for r in ds.take_all())
    assert got == sorted(targets)
    ds, info = plan_read(
        Constraints(boxes=[(0.0, 0.0, 20.0, 20.0)],
                    time=(1704067200_000_000, 1720000000_000_000)),
        cat, columns=["lon", "lat", "warc_ts"],
    )
    assert info["index"] == "spatial_temporal"
    assert info["st_buckets_read"] < info["st_buckets_total"]


def test_crs_adapter_store_roundtrip(ray_session, tmp_path):
    """EPSG:3857-native store: ingest keeps native meters on disk, the
    pruned read in 4326 index space returns a superset of every query
    box, and the native fine filter is exact."""
    import ray.data

    from geowave_ray.crs import (
        CrsAdapter, ingest_xy_crs, native_box, read_crs_pruned,
    )
    from geowave_ray.geom import to_web_mercator

    rng = np.random.RandomState(3)
    lon = rng.uniform(-179, 179, 4000)
    lat = rng.uniform(-84, 84, 4000)
    x, y = to_web_mercator(lon, lat)
    t = pa.table({"pid": pa.array(np.arange(4000)), "x": pa.array(x), "y": pa.array(y)})
    store = str(tmp_path / "merc")
    ingest_xy_crs(ray.data.from_arrow(t).repartition(4), store, "EPSG:3857")
    import glob as g
    import os
    assert g.glob(os.path.join(store, "cell_bucket=*", "*.parquet"))
    box = (10.0, 10.0, 60.0, 40.0)
    ds = read_crs_pruned(store, "EPSG:3857", [box], columns=["pid", "x", "y"])
    got = ds.to_pandas()
    bx0, by0, bx1, by1 = native_box("EPSG:3857", *box)
    fine = got[(got.x >= bx0) & (got.x <= bx1) & (got.y >= by0) & (got.y <= by1)]
    truth = ((lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3]))
    assert set(fine.pid) == set(np.nonzero(truth)[0])
    # adapter inverse is the index projection
    a = CrsAdapter("EPSG:3857")
    rlon, rlat = a.to_index(x, y)
    assert np.allclose(rlon, lon, atol=1e-9) and np.allclose(rlat, lat, atol=1e-9)


def test_cogroup_store_path_matches_unaligned(ray_session):
    """The store-fed cogroup plan (points map-side, only region rows
    move) and the unaligned both-sides-exchange fallback produce the
    identical pair set."""
    import importlib.util

    import ray.data

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    sf = "/root/testdata/sf0.001"
    import glob
    import os

    from geowave_ray.pipelines.spatial_join import (
        cogroup_pip_join, cogroup_pip_join_from_store,
    )

    store = em._ingested(sf)
    files = sorted(
        glob.glob(os.path.join(store, "group=*", "cell_bucket=*", "*.parquet"))
    )
    regions = ray.data.read_parquet(f"{em._fx(sf)}/regions.parquet")
    a = cogroup_pip_join_from_store(files, regions).to_pandas()
    regions2 = ray.data.read_parquet(f"{em._fx(sf)}/regions.parquet")
    b = cogroup_pip_join(em._pages(sf), regions2).to_pandas()
    assert set(zip(a.url, a.region_id)) == set(zip(b.url, b.region_id))


def test_zonal_stats_bruteforce(ray_session):
    """Zonal stats vs a per-pixel brute force on a tiny raster and two
    square zones (one overlapping chunk pair, one empty zone)."""
    import ray.data

    from geowave_ray.geom import polygon_wkb
    from geowave_ray.pipelines.tiles import zonal_stats

    # two 4x4 chunks: [0,4]x[0,4] and overlapping [2,6]x[0,4]
    def chunk(cid, x0, y0, x1, y1, w, h, seed):
        vals = ((seed + np.arange(w * h)) % 7).astype(np.float64)
        return dict(chunk_id=cid, xmin=x0, ymin=y0, xmax=x1, ymax=y1,
                    width=w, height=h, pixels=vals)

    chunks = [chunk("a", 0, 0, 4, 4, 4, 4, 1), chunk("b", 2, 0, 6, 4, 4, 4, 5)]
    t = pa.table({
        "chunk_id": pa.array([c["chunk_id"] for c in chunks]),
        "xmin": pa.array([c["xmin"] for c in chunks], pa.float64()),
        "ymin": pa.array([c["ymin"] for c in chunks], pa.float64()),
        "xmax": pa.array([c["xmax"] for c in chunks], pa.float64()),
        "ymax": pa.array([c["ymax"] for c in chunks], pa.float64()),
        "width": pa.array([c["width"] for c in chunks], pa.int32()),
        "height": pa.array([c["height"] for c in chunks], pa.int32()),
        "pixels": pa.array([c["pixels"] for c in chunks], pa.list_(pa.float64())),
    })
    # zones: CCW squares (convex) — z1 covers [1,3]x[1,3], z2 far away
    def sq(x0, y0, x1, y1):
        return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)

    regions = pa.table({
        "region_id": pa.array(["z1", "z2"]),
        "geometry_wkb": pa.array(
            [polygon_wkb(sq(1, 1, 3, 3)), polygon_wkb(sq(50, 50, 60, 60))],
            pa.binary()),
        "xmin": pa.array([1.0, 50.0]), "ymin": pa.array([1.0, 50.0]),
        "xmax": pa.array([3.0, 60.0]), "ymax": pa.array([3.0, 60.0]),
    })

    got = zonal_stats(
        ray.data.from_arrow(t).repartition(2), regions
    ).to_pandas().set_index("region_id")

    # brute force
    exp_n, exp_s = 0, 0.0
    for c in chunks:
        w, h = c["width"], c["height"]
        for p in range(w * h):
            lon = c["xmin"] + (p % w + 0.5) * (c["xmax"] - c["xmin"]) / w
            lat = c["ymin"] + (p // w + 0.5) * (c["ymax"] - c["ymin"]) / h
            if 1 <= lon <= 3 and 1 <= lat <= 3:
                exp_n += 1
                exp_s += c["pixels"][p]
    assert "z2" not in got.index  # empty zone emits nothing
    assert got.loc["z1", "n_px"] == exp_n
    assert got.loc["z1", "px_sum"] == exp_s
    assert got.loc["z1", "px_mean"] == exp_s / exp_n


def test_hotspot_blobs_bruteforce(ray_session):
    """Cross-tile blob merging against a brute-force flood fill; small
    tile=4 so components straddle many tile boundaries."""
    import ray.data

    from geowave_ray.pipelines.kde import hotspot_blobs

    rng = np.random.default_rng(47)
    tier = 5  # 32x32 grid
    n = 1 << tier
    # scatter points: an L-shaped dense band + random noise cells
    pts = []
    for cx in range(3, 20):  # horizontal band at cy=10
        pts += [(cx, 10)] * 3
    for cy in range(10, 25):  # vertical band at cx=19 (connected at corner)
        pts += [(19, cy)] * 3
    for _ in range(40):  # noise: single-point cells (below min_count)
        pts.append((int(rng.integers(0, n)), int(rng.integers(0, n))))
    # cell center -> lon/lat
    lon = np.array([-180 + (cx + 0.5) * 360 / n for cx, _ in pts])
    lat = np.array([-90 + (cy + 0.5) * 180 / n for _, cy in pts])
    ds = ray.data.from_arrow(
        pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    ).repartition(5)

    got = hotspot_blobs(ds, tier=tier, min_count=3, tile=4).to_pandas()

    # brute force flood fill over hot cells
    from collections import Counter, deque

    cnt = Counter(pts)
    hot = {c for c, k in cnt.items() if k >= 3}
    seen, blobs = set(), []
    for c in sorted(hot):
        if c in seen:
            continue
        comp, dq = [], deque([c])
        seen.add(c)
        while dq:
            x, y = dq.popleft()
            comp.append((x, y))
            for nb in ((x+1, y), (x-1, y), (x, y+1), (x, y-1)):
                if nb in hot and nb not in seen:
                    seen.add(nb)
                    dq.append(nb)
        blobs.append(comp)
    exp = sorted(
        (min(cy * n + cx for cx, cy in comp), len(comp),
         sum(cnt[c] for c in comp),
         min(c[0] for c in comp), min(c[1] for c in comp),
         max(c[0] for c in comp), max(c[1] for c in comp))
        for comp in blobs
    )
    got_rows = sorted(
        tuple(int(v) for v in r)
        for r in got[["blob_id", "n_cells", "n_pages",
                      "min_cx", "min_cy", "max_cx", "max_cy"]].to_numpy()
    )
    assert got_rows == exp
    # the L-band is ONE blob spanning many 4x4 tiles
    big = max(exp, key=lambda b: b[1])
    assert big[1] == 17 + 15 - 1


def test_boundary_distance_matches_bruteforce(small):
    from geowave_ray.pipelines.distance_join import boundary_distance_join

    pages, regions, _ = small
    pts = pa.table(
        {
            "query_id": pa.array([f"p{i}" for i in range(40)]),
            "lon": pages["lon"].to_numpy()[:40],
            "lat": pages["lat"].to_numpy()[:40],
        }
    )
    got = (
        boundary_distance_join(ray.data.from_arrow(pts), regions)
        .to_pandas()
        .set_index("query_id")
    )
    # brute force: per point, true polygon distance over every region
    for i in range(len(pts)):
        px, py = pts["lon"][i].as_py(), pts["lat"][i].as_py()
        best = (np.inf, None)
        for j in range(regions.num_rows):
            ring = parse_wkb_polygon(regions["geometry_wkb"][j].as_py())
            rid = regions["region_id"][j].as_py()
            if pip_convex(np.array([px]), np.array([py]), ring)[0]:
                d = 0.0
            else:
                a, b = ring[:-1], ring[1:]
                dxe, dye = b[:, 0] - a[:, 0], b[:, 1] - a[:, 1]
                t = np.clip(
                    ((px - a[:, 0]) * dxe + (py - a[:, 1]) * dye)
                    / (dxe * dxe + dye * dye),
                    0,
                    1,
                )
                d = float(
                    np.sqrt(
                        (px - (a[:, 0] + t * dxe)) ** 2
                        + (py - (a[:, 1] + t * dye)) ** 2
                    ).min()
                )
            if d < best[0] or (d == best[0] and rid < best[1]):
                best = (d, rid)
        row = got.loc[f"p{i}"]
        assert row["nearest_region"] == best[1]
        assert abs(row["dist"] - best[0]) < 1e-9
