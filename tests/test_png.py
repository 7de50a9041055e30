"""PNG codec tests (sources/png.py) — golden vectors built byte-by-
byte in the test (struct + zlib, independent of the production
encoder), every spec filter type, palette expansion, CRC rejection,
and encode->decode roundtrips; plus the multimodal actor stage on
real PNG payloads."""

import struct
import zlib

import numpy as np
import pytest

from geowave_ray.sources.png import decode, encode


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _raw_png(w, h, color, scanlines, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    parts = [b"\x89PNG\r\n\x1a\n", _chunk(b"IHDR", ihdr)]
    if plte is not None:
        parts.append(_chunk(b"PLTE", plte))
    parts.append(_chunk(b"IDAT", zlib.compress(scanlines)))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def test_decode_each_filter_golden():
    """One 4x2 grey image per filter type, scanlines hand-derived from
    the spec's filter equations (RFC 2083 section 6)."""
    img = np.array([[10, 20, 30, 40], [15, 25, 35, 45]], np.uint8)
    # filter 0 (None): raw bytes
    s0 = bytes([0, 10, 20, 30, 40, 0, 15, 25, 35, 45])
    # filter 1 (Sub): x - left
    s1 = bytes([1, 10, 10, 10, 10, 1, 15, 10, 10, 10])
    # filter 2 (Up): row0 Up against zero prior, row1 against row0
    s2 = bytes([2, 10, 20, 30, 40, 2, 5, 5, 5, 5])
    # filter 3 (Average): x - floor((left+up)/2); row1 x1: 25-(15+20)//2=8
    s3 = bytes([3, 10, 15, 20, 25, 3, 10, 8, 8, 8])
    # filter 4 (Paeth): row0 predictor=left; row1 predictor=up (pb min)
    s4 = bytes([4, 10, 10, 10, 10, 4, 5, 5, 5, 5])
    for s in (s0, s1, s2, s3, s4):
        got, meta = decode(_raw_png(4, 2, 0, s))
        assert meta["width"] == 4 and meta["height"] == 2
        assert np.array_equal(got[:, :, 0], img), s[0]


def test_decode_rgb_and_modular_wrap():
    """Sub filter with byte wraparound: 250 + 10 = 4 (mod 256)."""
    s = bytes([1, 250, 0, 0, 10, 0, 0])  # 2x1 RGB: (250,0,0), (4,0,0)
    got, meta = decode(_raw_png(2, 1, 2, s))
    assert got[0, 0, 0] == 250 and got[0, 1, 0] == 4
    assert meta["channels"] == 3


def test_palette_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    s = bytes([0, 0, 1, 2, 1])  # 4x1 indices
    got, meta = decode(_raw_png(4, 1, 3, s, plte=plte))
    assert got.shape == (4 if False else 1, 4, 3)
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[0, 1].tolist() == [0, 255, 0]
    assert got[0, 3].tolist() == [0, 255, 0]


def test_crc_and_profile_rejection():
    s = bytes([0, 1, 2])
    buf = bytearray(_raw_png(2, 1, 0, s))
    buf[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode(bytes(buf))
    with pytest.raises(ValueError, match="signature"):
        decode(b"nope" + bytes(buf))
    # 16-bit depth rejected with a clear error
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes([0, 0, 0, 0, 0])))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bit depth"):
        decode(bad)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_all_filters_and_colortypes(ch, ft):
    rng = np.random.default_rng(ch * 10 + (5 if ft == "cycle" else ft))
    img = rng.integers(0, 256, (13, 17, ch), dtype=np.uint8)
    got, meta = decode(encode(img, filter_type=ft))
    assert np.array_equal(got, img)
    assert meta["channels"] == ch


def test_roundtrip_palette():
    palette = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.arange(40, dtype=np.uint8) % 16).reshape(5, 8)
    got, meta = decode(encode(idx, filter_type="cycle", palette=palette))
    assert meta["color_type"] == 3
    assert np.array_equal(got, palette[idx])


def test_multimodal_png_decode_stage(ray_session):
    """decode_features(decoder='png') over real PNG payloads: the
    feature is the normalized 16-bin intensity histogram of the
    DECODED samples (closed-form pixels make it analytic)."""
    import pyarrow as pa
    import ray.data

    from geowave_ray.multimodal import decode_features

    n = 6
    rows_url, rows_png, expect = [], [], []
    for i in range(n):
        h, w, c = 8, 12, 3
        px = ((7 * np.int64(i) + np.arange(h * w * c, dtype=np.int64)) % 251
              ).astype(np.uint8)
        rows_url.append(f"u{i}")
        rows_png.append(encode(px.reshape(h, w, c), filter_type="cycle"))
        hist = np.bincount(px >> 4, minlength=16).astype(np.float64)
        expect.append(hist / len(px))
    t = pa.table({"url": rows_url, "png": pa.array(rows_png, pa.binary())})
    out = decode_features(
        ray.data.from_arrow(t), col="png", decoder="png", concurrency=1,
        batch_size=4,
    ).to_pandas().set_index("url")
    for i in range(n):
        assert np.array_equal(np.asarray(out.loc[f"u{i}", "feature"]),
                              expect[i])
