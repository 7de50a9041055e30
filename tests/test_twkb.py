"""TWKB codec tests: public-spec golden vectors + roundtrip properties
(TWKBWriter/TWKBReader role, core/geotime/.../util/TWKBWriter.java)."""

import numpy as np
import pyarrow as pa
import pytest

from geowave_ray.twkb import (
    decode_geometry,
    decode_point_column,
    encode_linestring,
    encode_point_column,
    encode_polygon,
)


def test_spec_golden_vectors():
    # github.com/TWKB/Specification examples, precision 0
    pt = encode_point_column(np.array([1.0]), np.array([1.0]), precision=0)
    assert pt[0].as_py() == bytes.fromhex("01000202")
    ls = encode_linestring(np.array([[1, 1], [5, 5]], float), 0)
    assert ls == bytes.fromhex("02000202020808")
    pg = encode_polygon([np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]], float)], 0)
    assert pg == bytes.fromhex("030001040000000808000007")


def test_point_roundtrip_exact_quantization():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 50_000)
    lat = rng.uniform(-90, 90, 50_000)
    enc = encode_point_column(lon, lat, precision=5)
    x, y = decode_point_column(enc, precision=5)
    assert np.array_equal(x, np.floor(lon * 1e5 + 0.5) / 1e5)
    assert np.array_equal(y, np.floor(lat * 1e5 + 0.5) / 1e5)
    # idempotent: re-encoding the quantized coords is byte-identical
    enc2 = encode_point_column(x, y, precision=5)
    assert enc2.equals(enc)


def test_point_header_and_edge_values():
    # max-magnitude coords still fit (<= 5 varint bytes at precision 5)
    lon = np.array([-180.0, 180.0, 0.0, -0.000005])
    lat = np.array([-90.0, 90.0, 0.0, 0.000004])
    enc = encode_point_column(lon, lat, precision=5)
    for b in enc.to_pylist():
        assert b[0] == (5 << 5) | 1 and b[1] == 0  # zigzag(5)=10 -> 0xA1
    x, y = decode_point_column(enc)
    assert np.array_equal(x, np.floor(lon * 1e5 + 0.5) / 1e5)
    assert np.array_equal(y, np.floor(lat * 1e5 + 0.5) / 1e5)


def test_polygon_roundtrip_delta_chained_rings():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], float) + 0.125
    b = encode_polygon([outer, hole], precision=3)
    kind, rings = decode_geometry(b)
    assert kind == "polygon" and len(rings) == 2
    assert np.array_equal(rings[0], outer)
    assert np.allclose(rings[1], hole, atol=1e-3)
    # rings do not repeat the first point on the wire: 4 pts each
    assert b[2] == 2  # nrings


def test_linestring_roundtrip_negative_and_precision():
    c = np.array([[-122.05531, 37.36156], [-122.0, 37.4], [10.5, -45.25]], float)
    kind, back = decode_geometry(encode_linestring(c, precision=5))
    assert kind == "linestring"
    assert np.array_equal(back, np.floor(c * 1e5 + 0.5) / 1e5)


def test_decode_rejects_mixed_types():
    pt = encode_point_column(np.array([1.0]), np.array([2.0]), precision=0)
    bad = pa.array([encode_linestring(np.array([[0, 0], [1, 1]], float), 0)], pa.binary())
    with pytest.raises(ValueError):
        decode_point_column(bad)
    with pytest.raises(ValueError):
        decode_point_column(pt, precision=7)
