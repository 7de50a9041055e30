"""TWKB codec (reference TWKBWriter/TWKBReader role; byte layout from
the published TWKB spec — github.com/TWKB/Specification)."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray import twkb
from geowave_ray.formats import wkb_decode, wkb_encode


def _flat(geom) -> np.ndarray:
    t, c = geom
    if t == "Point":
        return np.asarray(c, dtype=np.float64).reshape(1, 2)
    if t in ("LineString", "MultiPoint"):
        return np.asarray(c, dtype=np.float64).reshape(-1, 2)
    if t == "Polygon":
        return np.concatenate([np.asarray(r)[:-1] if _closed(r) else np.asarray(r) for r in c])
    if t == "MultiLineString":
        return np.concatenate([np.asarray(p) for p in c])
    return np.concatenate(
        [np.asarray(r)[:-1] if _closed(r) else np.asarray(r) for poly in c for r in poly]
    )


def _closed(r) -> bool:
    r = np.asarray(r)
    return len(r) > 1 and r[0][0] == r[-1][0] and r[0][1] == r[-1][1]


def test_spec_golden_vectors():
    """Byte-exact examples from the TWKB specification (also what
    PostGIS ST_AsTWKB emits)."""
    assert twkb.encode(("Point", np.array([1.0, 2.0])), 0).hex() == "01000204"
    assert (
        twkb.encode(("LineString", np.array([[1.0, 1.0], [5.0, 5.0]])), 0).hex()
        == "02000202020808"
    )


@pytest.mark.parametrize("precision", [-2, -1, 0, 3, 4, 6, 7])
@pytest.mark.parametrize("with_size", [False, True])
@pytest.mark.parametrize("with_bbox", [False, True])
def test_roundtrip_all_types(precision, with_size, with_bbox):
    rng = np.random.default_rng(17)

    def ring(n, lo, hi):
        r = rng.uniform(lo, hi, (n, 2))
        return np.vstack([r, r[:1]])

    geoms = [
        ("Point", rng.uniform(-180, 180, 2)),
        ("LineString", rng.uniform(-90, 90, (7, 2))),
        ("Polygon", [ring(5, -50, 50), ring(4, -10, 10)]),
        ("MultiPoint", rng.uniform(-180, 180, (4, 2))),
        ("MultiLineString", [rng.uniform(-9, 9, (3, 2)), rng.uniform(-9, 9, (5, 2))]),
        ("MultiPolygon", [[ring(4, -5, 5)], [ring(6, 20, 30), ring(3, 22, 24)]]),
    ]
    for g in geoms:
        buf = twkb.encode(g, precision, with_size=with_size, with_bbox=with_bbox)
        g2, info = twkb.decode(buf, return_meta=True)
        assert g2[0] == g[0]
        assert info["precision"] == precision
        q = twkb.quantize(_flat(g), precision)
        q2 = twkb.quantize(_flat(g2), precision)
        assert np.array_equal(q, q2), (g[0], precision)
        if with_bbox:
            bb = info["bbox"]
            assert twkb.quantize(bb[0], precision) == q[:, 0].min()
            assert twkb.quantize(bb[2], precision) == q[:, 0].max()
        if with_size:
            # size varint counts every byte after itself
            assert buf[2:].startswith(b"") and info["size"] is not None
            header_len = len(buf) - info["size"]
            assert buf[header_len:] == buf[len(buf) - info["size"]:]


def test_double_delta_chain_crosses_parts():
    """Deltas carry across rings and multi-parts (one running prev per
    dimension) — a second part close to the first costs few bytes."""
    near = ("MultiPoint", np.array([[100.0, 50.0], [100.0001, 50.0001]]))
    far = ("MultiPoint", np.array([[100.0, 50.0], [-100.0, -50.0]]))
    assert len(twkb.encode(near, 4)) < len(twkb.encode(far, 4))


def test_idlist_and_empty():
    g = ("MultiPoint", np.array([[1.0, 2.0], [3.0, 4.0]]))
    g2, info = twkb.decode(twkb.encode(g, 0, ids=[10, -3]), return_meta=True)
    assert info["ids"] == [10, -3]
    with pytest.raises(ValueError):
        twkb.encode(g, 0, ids=[1])
    e, info = twkb.decode(twkb.encode(("Polygon", []), 2), return_meta=True)
    assert info["empty"] and e == ("Polygon", [])


def test_precision_controls_size_and_loss():
    g = ("LineString", np.array([[1.234567, -7.654321], [1.234568, -7.654322]]))
    b2 = twkb.encode(g, 2)
    b6 = twkb.encode(g, 6)
    assert len(b2) < len(b6)
    g2 = twkb.decode(b6)
    assert np.allclose(np.asarray(g2[1]), np.asarray(g[1]), atol=1e-6)


def test_vectorized_point_column_matches_scalar():
    rng = np.random.default_rng(3)
    lon = np.concatenate([rng.uniform(-180, 180, 500), [0.0, -180.0, 179.999999]])
    lat = np.concatenate([rng.uniform(-90, 90, 500), [0.0, 90.0, -89.999999]])
    col = twkb.encode_point_column(lon, lat, 6)
    for i in list(range(0, len(lon), 37)) + [len(lon) - 3, len(lon) - 2, len(lon) - 1]:
        assert col[i].as_py() == twkb.encode(("Point", np.array([lon[i], lat[i]])), 6)
    # and decodes back to the quantized values
    g = twkb.decode(col[5].as_py())
    assert twkb.quantize(g[1][0], 6) == twkb.quantize(lon[5], 6)


def test_wkb_twkb_batch_roundtrip():
    rng = np.random.default_rng(5)
    rings = [np.vstack([r, r[:1]]) for r in [rng.uniform(-60, 60, (6, 2)) for _ in range(8)]]
    wkbs = [wkb_encode(("Polygon", [r])) for r in rings]
    batch = pa.table({"geometry_wkb": pa.array(wkbs, pa.binary())})
    enc = twkb.twkb_encode_batch(batch, precision=6)
    assert all(len(t.as_py()) < len(w.as_py()) for t, w in zip(enc["twkb"], enc["geometry_wkb"]))
    dec = twkb.twkb_decode_batch(enc.select(["twkb"]))
    for w, w2 in zip(wkbs, dec["geometry_wkb"]):
        a = np.asarray(wkb_decode(w)[1][0])
        b = np.asarray(wkb_decode(w2.as_py())[1][0])
        assert np.array_equal(twkb.quantize(a, 6), twkb.quantize(b, 6))


def test_point_roundtrip_exact_quantization():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 50_000)
    lat = rng.uniform(-90, 90, 50_000)
    enc = twkb.encode_point_column(lon, lat, precision=5)
    x, y = twkb.decode_point_column(enc, precision=5)
    assert np.array_equal(x, np.floor(lon * 1e5 + 0.5) / 1e5)
    assert np.array_equal(y, np.floor(lat * 1e5 + 0.5) / 1e5)
    # idempotent: re-encoding the quantized coords is byte-identical
    enc2 = twkb.encode_point_column(x, y, precision=5)
    assert enc2.equals(enc)


def test_point_header_and_edge_values():
    # max-magnitude coords still fit (<= 5 varint bytes at precision 5)
    lon = np.array([-180.0, 180.0, 0.0, -0.000005])
    lat = np.array([-90.0, 90.0, 0.0, 0.000004])
    enc = twkb.encode_point_column(lon, lat, precision=5)
    for b in enc.to_pylist():
        assert b[0] == (5 << 5) | 1 and b[1] == 0  # zigzag(5)=10 -> 0xA1
    x, y = twkb.decode_point_column(enc)
    assert np.array_equal(x, np.floor(lon * 1e5 + 0.5) / 1e5)
    assert np.array_equal(y, np.floor(lat * 1e5 + 0.5) / 1e5)


def test_decode_point_column_rejects_mixed_types():
    pt = twkb.encode_point_column(np.array([1.0]), np.array([2.0]), precision=0)
    bad = pa.array(
        [twkb.encode(("LineString", np.array([[0.0, 0.0], [1.0, 1.0]])), 0)],
        pa.binary(),
    )
    with pytest.raises(ValueError):
        twkb.decode_point_column(bad)
    with pytest.raises(ValueError):
        twkb.decode_point_column(pt, precision=7)


def test_point_column_scalar_equivalence_precision5():
    # the column fast path and the generic encoder agree byte-for-byte
    lon = np.array([-122.05531, 0.0, 179.999994])
    lat = np.array([37.36156, 0.0, -89.999994])
    col = twkb.encode_point_column(lon, lat, precision=5)
    for i in range(3):
        assert col[i].as_py() == twkb.encode(
            ("Point", np.array([lon[i], lat[i]])), 5
        )


# ---------------------------------------------------------------------------
# reference-dialect compat codec (TWKBWriter.java / TWKBReader.java)
# ---------------------------------------------------------------------------


def test_compat_point_golden():
    """Hand-derived from TWKBWriter.java: precision = max decimal
    scale (2.05 -> 2), header 0x41, metadata EXTENDED_DIMENSIONS with
    a zero extended byte for 2-D, absolute zigzag varints."""
    b = twkb.encode_compat(("Point", np.array([2.05, 1.5])))
    assert b.hex() == "4108009a03ac02"
    assert twkb.decode_compat(b) == ("Point", pytest.approx([2.05, 1.5]))


def test_compat_linestring_golden():
    g = ("LineString", np.array([[0.0, 0.0], [1.25, 1.0], [2.0, 2.0]]))
    b = twkb.encode_compat(g)
    assert b.hex() == "420800030000fa01c8019601c801"
    t, c = twkb.decode_compat(b)
    assert t == "LineString" and np.allclose(c, np.asarray(g[1]))


def test_compat_polygon_closed_rings_and_delta_reset():
    """Rings are written CLOSED (count includes the repeated closing
    point) and each ring's delta chain starts from (0, 0)."""
    shell = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    b = twkb.encode_compat(("Polygon", [shell, hole]))
    # precision 0; header 0x03, meta 0x08, ext 0x00, nrings 2
    assert b[:4].hex() == "03080002"
    body = b[4:]
    # shell: count 5 then deltas; first point (0,0)
    assert body[0] == 5
    # hole's first point must be absolute-from-zero (1,1) -> zigzag 2,2
    # shell block: 5 points x 2 varints, all single-byte at this scale
    hole_block = body[1 + 10:]
    assert hole_block[0] == 5 and hole_block[1] == 2 and hole_block[2] == 2
    t, rings = twkb.decode_compat(b)
    assert t == "Polygon" and len(rings) == 2
    assert np.allclose(rings[0], shell) and np.allclose(rings[1], hole)


def test_compat_roundtrip_multi_types():
    gs = [
        ("MultiPoint", np.array([[1.5, -2.25], [3.0, 4.0]])),
        ("MultiLineString", [np.array([[0.0, 0.0], [1.1, 1.1]]),
                             np.array([[5.0, 5.0], [6.0, 7.0]])]),
        ("MultiPolygon", [[np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0],
                                     [0.0, 0.0]])],
                          [np.array([[10.0, 10.0], [12.5, 10.0], [12.5, 12.0],
                                     [10.0, 10.0]])]]),
    ]
    for g in gs:
        t, c = twkb.decode_compat(twkb.encode_compat(g))
        assert t == g[0]
        a, b_ = np.concatenate([np.asarray(x).reshape(-1, 2) for x in
                                ([c] if t == "MultiPoint" else
                                 (c if t == "MultiLineString" else
                                  [r for p in c for r in p]))]), \
                np.concatenate([np.asarray(x).reshape(-1, 2) for x in
                                ([g[1]] if t == "MultiPoint" else
                                 (g[1] if t == "MultiLineString" else
                                  [r for p in g[1] for r in p]))])
        assert np.allclose(a, b_)


def test_compat_empty_and_precision_cap():
    assert twkb.encode_compat(("Polygon", [])).hex() == "0310"
    # 9 decimal places capped at max_precision=7
    g = ("Point", np.array([1.123456789, 0.0]))
    b = twkb.encode_compat(g)
    p = (b[0] >> 4)
    assert (p >> 1) ^ -(p & 1) == 7
    t, c = twkb.decode_compat(b)
    assert abs(c[0] - 1.1234568) < 1e-9


def test_spec_encode_validates_ids_and_precision():
    with pytest.raises(ValueError):
        twkb.encode(("Point", np.array([1.0, 2.0])), 0, ids=[1])
    with pytest.raises(ValueError):
        twkb.encode(("Point", np.array([1.0, 2.0])), 9)
    with pytest.raises(ValueError):
        twkb.encode(("Point", np.array([1.0, 2.0])), -9)
