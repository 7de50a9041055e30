"""Pure-Python shapefile reader (sources/shapefile.py — the
geotools-vector ingest-plugin role). Golden vectors are hand-packed
structs straight from the ESRI spec, independent of the module's own
writer."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.sources import shapefile as shp_mod
from geowave_ray.formats import wkb_decode


def _hand_shp(records: list[bytes]) -> bytes:
    payload = b""
    for i, body in enumerate(records):
        payload += struct.pack(">2i", i + 1, len(body) // 2) + body
    header = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, (100 + len(payload)) // 2)
    header += struct.pack("<2i", 1000, 1)
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    return header + payload


def test_point_golden_bytes():
    body = struct.pack("<i2d", 1, 12.5, -3.75)
    recs = shp_mod.parse_shp(_hand_shp([body]))
    assert recs == [(1, ("Point", pytest.approx([12.5, -3.75])))] or (
        recs[0][0] == 1
        and recs[0][1][0] == "Point"
        and np.allclose(recs[0][1][1], [12.5, -3.75])
    )


def test_polyline_two_parts_golden_bytes():
    pts = np.array([[0, 0], [1, 1], [5, 5], [6, 5], [7, 4]], dtype="<f8")
    body = (
        struct.pack("<i4d2i", 3, 0, 0, 7, 5, 2, 5)
        + np.array([0, 2], "<i4").tobytes()
        + pts.tobytes()
    )
    (rn, (t, parts)), = shp_mod.parse_shp(_hand_shp([body]))
    assert t == "MultiLineString" and len(parts) == 2
    assert np.allclose(parts[0], pts[:2]) and np.allclose(parts[1], pts[2:])


def test_pointz_skips_z_and_m():
    # PointZ (11): x, y, z, m — reader keeps 2-D, skips the rest
    body = struct.pack("<i4d", 11, 3.0, 4.0, 99.0, 7.0)
    (rn, (t, c)), = shp_mod.parse_shp(_hand_shp([body]))
    assert t == "Point" and np.allclose(c, [3.0, 4.0])


def test_null_shape_and_bad_magic():
    body = struct.pack("<i", 0)
    (rn, g), = shp_mod.parse_shp(_hand_shp([body]))
    assert g is None
    with pytest.raises(ValueError):
        shp_mod.parse_shp(b"\x00" * 100)


def test_polygon_winding_assembly():
    """Two CW shells + one CCW hole inside the second -> MultiPolygon
    with the hole attached to its containing shell."""
    def ring(pts):
        return np.asarray(pts, dtype=np.float64)

    s1 = ring([[0, 0], [0, 2], [2, 2], [2, 0], [0, 0]])        # CW
    s2 = ring([[10, 10], [10, 14], [14, 14], [14, 10], [10, 10]])  # CW
    h2 = ring([[11, 11], [12, 11], [12, 12], [11, 12], [11, 11]])  # CCW
    pts = np.vstack([s1, s2, h2]).astype("<f8")
    body = (
        struct.pack("<i4d2i", 5, 0, 0, 14, 14, 3, 15)
        + np.array([0, 5, 10], "<i4").tobytes()
        + pts.tobytes()
    )
    (rn, (t, polys)), = shp_mod.parse_shp(_hand_shp([body]))
    assert t == "MultiPolygon" and len(polys) == 2
    assert len(polys[0]) == 1 and len(polys[1]) == 2
    assert np.allclose(polys[1][1], h2)


def test_dbf_golden_bytes():
    # hand-packed dBase III: one C(4) field, one N(6,0), one N(8,2)
    hdr = struct.pack("<B3BIHH", 3, 99, 1, 1, 2, 32 + 96 + 1, 1 + 4 + 6 + 8)
    hdr += b"\x00" * 20
    for name, ft, ln, dc in [(b"tag", b"C", 4, 0), (b"cnt", b"N", 6, 0),
                             (b"amt", b"N", 8, 2)]:
        d = bytearray(32)
        d[:11] = name.ljust(11, b"\x00")
        d[11] = ft[0]
        d[16] = ln
        d[17] = dc
        hdr += bytes(d)
    hdr += b"\x0d"
    recs = b" " + b"ab  " + b"    42" + b"   -1.50"
    recs += b"*" + b"del " + b"     1" + b"    9.99"  # deleted
    data = hdr + recs + b"\x1a"
    rows, active = shp_mod.parse_dbf(data)
    assert rows[0] == {"tag": "ab", "cnt": 42, "amt": -1.5}
    assert active == [True, False]


def test_read_shapefile_drops_deleted_and_roundtrips():
    from geowave_ray.fixtures import gen_shapefiles

    files, truth = gen_shapefiles(3)
    out = []
    for i in range(files.num_rows):
        t = shp_mod.read_shapefile(
            files.column("shp")[i].as_py(), files.column("dbf")[i].as_py()
        )
        assert t.num_rows == 6  # 7 records, 1 deleted
        out.append(t)
    # WKB round-trip: every non-null geometry decodes
    for t in out:
        for w in t.column("geometry_wkb"):
            if w.as_py() is not None:
                wkb_decode(w.as_py())


def test_writer_reader_full_roundtrip_all_types():
    geoms = [
        ("Point", np.array([1.0, 2.0])),
        ("LineString", np.array([[0.0, 0.0], [3.0, 4.0]])),
        ("MultiPoint", np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 1.0]])),
        ("Polygon", [np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0],
                               [0.0, 5.0], [0.0, 0.0]])]),
        None,
    ]
    parsed = shp_mod.parse_shp(shp_mod.write_shp(geoms))
    assert [g[0] if g else None for _, g in parsed] == [
        "Point", "LineString", "MultiPoint", "Polygon", None
    ]
    # polygon ring got rewound CW on write; same vertex set, closed
    _, (tt, rings) = parsed[3]
    assert np.allclose(sorted(map(tuple, rings[0][:-1])),
                       sorted(map(tuple, geoms[3][1][0][:-1])))
