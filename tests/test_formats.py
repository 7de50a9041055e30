"""Vector format codecs (geowave_ray/formats.py) — the engine's
stand-in for the reference's GeoTools vector format plugins
(extensions/formats/geotools-vector/.../GeoToolsVectorDataStoreIngestPlugin.java:60-118):
WKB both byte orders, WKT, GeoJSON, and the fixed-width point column
fast paths."""

import json
import struct

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.formats import (
    decode_point_column,
    encode_point_column,
    geojson_to_geom,
    geom_to_geojson,
    read_geojson,
    wkb_decode,
    wkb_encode,
    wkb_stats_batch,
    wkt_decode,
    wkt_encode,
    wkt_point_column,
)

SQ = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0], [0.0, 0.0]])
HOLE = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]])
LINE = np.array([[0.0, 0.0], [1.5, 2.5], [-3.0, 4.0]])

GEOMS = [
    ("Point", np.array([12.5, -33.25])),
    ("LineString", LINE),
    ("Polygon", [SQ]),
    ("Polygon", [SQ, HOLE]),
    ("MultiPoint", np.array([[1.0, 2.0], [3.0, 4.0]])),
    ("MultiLineString", [LINE, LINE + 10.0]),
    ("MultiPolygon", [[SQ], [SQ + 20.0, HOLE + 20.0]]),
]


def _geom_eq(a, b):
    ta, ca = a
    tb, cb = b
    assert ta == tb
    if ta in ("Point", "LineString", "MultiPoint"):
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb))
    elif ta in ("Polygon", "MultiLineString"):
        assert len(ca) == len(cb)
        for x, y in zip(ca, cb):
            np.testing.assert_allclose(x, y)
    else:
        assert len(ca) == len(cb)
        for pa_, pb_ in zip(ca, cb):
            assert len(pa_) == len(pb_)
            for x, y in zip(pa_, pb_):
                np.testing.assert_allclose(x, y)


@pytest.mark.parametrize("geom", GEOMS, ids=[f"{t}{i}" for i, (t, _) in enumerate(GEOMS)])
def test_wkb_roundtrip(geom):
    wkb = wkb_encode(geom)
    _geom_eq(wkb_decode(wkb), geom)
    # re-encode is byte-identical (canonical little-endian form)
    assert wkb_encode(wkb_decode(wkb)) == wkb


def test_wkb_big_endian_point():
    be = struct.pack(">BIdd", 0, 1, 12.5, -33.25)
    t, c = wkb_decode(be)
    assert t == "Point" and c[0] == 12.5 and c[1] == -33.25


def test_wkb_big_endian_polygon():
    ring = SQ
    be = struct.pack(">BII", 0, 3, 1) + struct.pack(">I", len(ring)) + ring.astype(
        ">f8"
    ).tobytes()
    t, c = wkb_decode(be)
    assert t == "Polygon"
    np.testing.assert_allclose(c[0], ring)


@pytest.mark.parametrize("geom", GEOMS, ids=[f"{t}{i}" for i, (t, _) in enumerate(GEOMS)])
def test_wkt_roundtrip(geom):
    _geom_eq(wkt_decode(wkt_encode(geom)), geom)


@pytest.mark.parametrize("geom", GEOMS, ids=[f"{t}{i}" for i, (t, _) in enumerate(GEOMS)])
def test_geojson_roundtrip(geom):
    gj = geom_to_geojson(geom)
    json.dumps(gj)  # serializable
    _geom_eq(geojson_to_geom(gj), geom)


def test_point_column_fast_paths():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    col = encode_point_column(lon, lat)
    # byte-identical to the scalar encoder
    assert col[0].as_py() == wkb_encode(("Point", np.array([lon[0], lat[0]])))
    dx, dy = decode_point_column(col)
    np.testing.assert_array_equal(dx, lon)
    np.testing.assert_array_equal(dy, lat)
    # sliced column (nonzero offset) still decodes correctly
    dx2, dy2 = decode_point_column(col.slice(10, 50))
    np.testing.assert_array_equal(dx2, lon[10:60])


def test_wkt_point_column_matches_scalar():
    lon = np.array([-179.99999999, 0.0, 12.0, 3.14159265358979])
    lat = np.array([89.999999999, -0.0, -45.5, 1e-7])
    got = wkt_point_column(lon, lat)
    want = [wkt_encode(("Point", np.array([x, y]))) for x, y in zip(lon, lat)]
    assert list(got) == want


def test_wkb_stats_batch_envelope():
    batch = pa.table(
        {
            "gid": ["a", "b"],
            "geometry_wkb": pa.array(
                [wkb_encode(("Polygon", [SQ, HOLE])), wkb_encode(("LineString", LINE))],
                pa.binary(),
            ),
        }
    )
    out = wkb_stats_batch(batch)
    assert out.column("n_points").to_pylist() == [10, 3]
    assert out.column("gxmin").to_pylist() == [0.0, -3.0]
    assert out.column("gxmax").to_pylist() == [4.0, 1.5]
    assert out.column("gymax").to_pylist() == [3.0, 4.0]


def test_read_geojson_feature_collection(tmp_path, ray_session):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "sq", "rank": 1},
                "geometry": geom_to_geojson(("Polygon", [SQ])),
            },
            {
                "type": "Feature",
                "properties": {"name": "pt"},
                "geometry": geom_to_geojson(("Point", np.array([1.0, 2.0]))),
            },
        ],
    }
    p = tmp_path / "f.geojson"
    p.write_text(json.dumps(fc))
    ds = read_geojson(str(p))
    rows = ds.take_all()
    assert len(rows) == 2
    assert rows[0]["name"] == "sq" and rows[0]["rank"] == 1
    assert rows[1]["name"] == "pt" and rows[1]["rank"] is None
    t, c = wkb_decode(rows[1]["geometry_wkb"])
    assert t == "Point" and c[0] == 1.0


def test_read_geojson_ndjson(tmp_path, ray_session):
    lines = [
        json.dumps(
            {
                "type": "Feature",
                "properties": {"i": i},
                "geometry": geom_to_geojson(("Point", np.array([float(i), 0.0]))),
            }
        )
        for i in range(5)
    ]
    p = tmp_path / "f.ndjson"
    p.write_text("\n".join(lines))
    ds = read_geojson(str(p))
    assert ds.count() == 5


def test_write_geojson_roundtrip_dir(tmp_path, ray_session):
    import ray.data

    from geowave_ray.formats import (
        read_geojson_dir,
        wkb_encode,
        write_geojson,
    )

    rng = np.random.default_rng(3)
    pts = rng.uniform(-50, 50, size=(64, 2))
    tbl = pa.table(
        {
            "fid": pa.array([f"f{i:03d}" for i in range(64)]),
            "score": pa.array(rng.uniform(0, 1, 64), pa.float64()),
            "geometry_wkb": pa.array(
                [wkb_encode(("Point", p)) for p in pts], pa.binary()
            ),
        }
    )
    out = tmp_path / "gj"
    write_geojson(ray.data.from_arrow(tbl).repartition(4), str(out))
    files = [f for f in out.iterdir() if f.suffix == ".geojsonl"]
    assert len(files) >= 2  # partitioned layout, never one giant file
    back = read_geojson_dir(str(out)).to_pandas().sort_values("fid")
    assert list(back["fid"]) == [f"f{i:03d}" for i in range(64)]
    # float64 properties and WKB coordinates roundtrip bit-exactly
    assert np.array_equal(back["score"].to_numpy(), tbl["score"].to_numpy())
    from geowave_ray.formats import wkb_decode

    got = np.array([wkb_decode(b)[1] for b in back["geometry_wkb"]])
    assert np.array_equal(got, pts[np.argsort(tbl["fid"].to_pylist())])
