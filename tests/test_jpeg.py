"""Baseline JPEG codec tests (sources/jpeg.py) — zigzag golden order,
an entropy stream hand-assembled byte-by-byte in the test
(independent of the production encoder), flat-block bit-exactness
through the full DCT pipeline, IDCT vs the naive Annex-A formula,
bounded-error lossy roundtrips, marker rejection, and the multimodal
sniffing stage with JPEG payloads."""

import struct

import numpy as np
import pytest

from geowave_ray.sources import jpeg

# published zigzag scan order (T.81 figure 5), natural indices
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_published_order():
    assert jpeg._ZZ.tolist() == _ZIGZAG
    assert sorted(jpeg._ZZ.tolist()) == list(range(64))


def test_idct_matches_naive_formula():
    """IDCT (matrix form) vs the direct Annex A.3.3 double sum."""
    rng = np.random.default_rng(5)
    s = rng.integers(-200, 200, (8, 8)).astype(np.float64)
    naive = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * s[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            naive[x, y] = acc / 4.0
    mat = jpeg._T.T @ s @ jpeg._T
    assert np.allclose(mat, naive, atol=1e-9)


def _flat_table_bytes(symbols):
    """BITS + HUFFVAL for a flat canonical table (test-local copy)."""
    n = len(symbols)
    length = max(2, n.bit_length())
    bits = [0] * 16
    bits[length - 1] = n
    return bytes(bits) + bytes(symbols), length


def test_decode_hand_assembled_dc_only():
    """One 8x8 grey block of value 130, markers and entropy bits
    assembled by the test itself: DC quantizer 8 -> coefficient
    (130-128) = 2, category 2, appended bits '10', then EOB. Flat
    4-bit DC codes make code(sym)==sym; the AC table's first symbol
    (EOB) gets the all-zeros code."""
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    dc_tbl, dc_len = _flat_table_bytes(dc_syms)   # 12 syms -> 4 bits
    ac_tbl, ac_len = _flat_table_bytes(ac_syms)   # 162 syms -> 8 bits
    assert dc_len == 4 and ac_len == 8
    q = bytes([8]) + bytes([16] * 63)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + q
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + len(dc_tbl)) + b"\x00" + dc_tbl
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + len(ac_tbl)) + b"\x10" + ac_tbl
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    # entropy: DC cat 2 = code 0010, bits '10'; EOB = 00000000; pad 1s
    # -> 0010 10 00000000 11 = 0x28 0x03
    out += bytes([0b00101000, 0b00000011])
    out += b"\xff\xd9"
    img, meta = jpeg.decode(bytes(out))
    assert meta == {"width": 8, "height": 8, "components": 1,
                    "sampling": "1x1"}
    assert img.shape == (8, 8)
    assert np.all(img == 130)


@pytest.mark.parametrize("v", [0, 1, 127, 128, 200, 255])
def test_flat_gray_bit_exact(v):
    img = np.full((16, 24), v, np.uint8)
    out, _ = jpeg.decode(jpeg.encode(img))
    assert np.array_equal(out, img)


def test_blockwise_flat_gray_bit_exact():
    """Per-block flat values exercise differential-DC coding with
    positive and negative diffs across many categories."""
    blocks = (np.arange(6 * 4, dtype=np.int64) * 37 % 256).astype(np.uint8)
    img = blocks.reshape(4, 6).repeat(8, axis=0).repeat(8, axis=1)
    out, _ = jpeg.decode(jpeg.encode(img))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("ss", ["4:4:4", "4:2:0"])
def test_color_neutral_chroma_bit_exact(ss):
    """R=G=B images keep chroma flat at 128 -> the colour transform
    round-trips exactly for any per-block luma values."""
    blocks = (np.arange(24, dtype=np.int64) * 37 % 256).astype(np.uint8)
    y = blocks.reshape(4, 6).repeat(16, axis=0).repeat(16, axis=1)
    rgb = np.stack([y, y, y], axis=2)
    out, meta = jpeg.decode(jpeg.encode(rgb, subsampling=ss))
    assert meta["components"] == 3
    assert np.array_equal(out, rgb)


def test_lossy_roundtrip_bounded():
    """Tight bounds that regress if dequantization ever reorders the
    DQT table wrongly (zigzag vs natural layout — a class of bug the
    flat-block oracles cannot see): measured post-fix error is
    max 8 / mean 1.32 on this fixture; the pre-fix bug gave max 32+."""
    xs = np.linspace(0, 4 * np.pi, 120)
    smooth = (127 + 100 * np.sin(xs)[None, :]
              * np.cos(xs * 0.7)[:, None][:80]).astype(np.uint8)
    out, _ = jpeg.decode(jpeg.encode(smooth))
    err = np.abs(out.astype(int) - smooth.astype(int))
    assert err.max() <= 12 and err.mean() < 2.0


def test_noise_roundtrip_bounded():
    """Full-band noise exercises every AC position; per-pixel error
    stays within the quantizer-step bound (measured max 26 / mean
    5.3 with the default tables)."""
    rng = np.random.default_rng(0)
    blk = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    out, _ = jpeg.decode(jpeg.encode(blk))
    err = np.abs(out.astype(int) - blk.astype(int))
    assert err.max() <= 35 and err.mean() < 8.0


@pytest.mark.parametrize("shape", [(7, 9), (17, 23), (1, 1), (8, 1),
                                   (9, 17, 3)])
def test_odd_dims_pad_and_crop(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    for ss in ("4:4:4", "4:2:0") if len(shape) == 3 else ("4:2:0",):
        out, _ = jpeg.decode(jpeg.encode(img, subsampling=ss))
        assert out.shape == shape


def test_custom_quant_tables_respected():
    """A coarser luma table must change the bytes but still decode
    (tables travel in DQT)."""
    q_coarse = np.full(64, 64, np.uint8)
    q_coarse[0] = 8
    img = (np.arange(64, dtype=np.int64) % 256).astype(np.uint8).reshape(8, 8)
    a = jpeg.encode(img)
    b = jpeg.encode(img, quant=(q_coarse, q_coarse))
    assert a != b
    out, _ = jpeg.decode(b)
    assert out.shape == (8, 8)


def test_rejections():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode(b"\x00\x00garbage")
    # progressive SOF2 is rejected with a clear error
    buf = bytearray(jpeg.encode(np.zeros((8, 8), np.uint8)))
    sof_at = bytes(buf).index(b"\xff\xc0")
    buf[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg.decode(bytes(buf))
    # nonzero restart interval rejected
    buf = bytearray(jpeg.encode(np.zeros((8, 8), np.uint8)))
    sos_at = bytes(buf).index(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 100)
    with pytest.raises(ValueError, match="restart"):
        jpeg.decode(bytes(buf[:sos_at]) + dri + bytes(buf[sos_at:]))


def test_multimodal_jpeg_sniff_and_decode(ray_session):
    import pyarrow as pa
    import ray.data

    from geowave_ray.multimodal import BinaryDecoder, decode_features

    grey = (np.arange(256, dtype=np.int64) % 256).astype(np.uint8)
    img = grey.reshape(16, 16)
    flat = np.full((16, 16), 40, np.uint8)
    payloads = [jpeg.encode(img), jpeg.encode(flat)]
    assert [BinaryDecoder.sniff(p) for p in payloads] == ["jpeg", "jpeg"]
    ds = ray.data.from_arrow(
        pa.table({"url": pa.array(["a", "b"]),
                  "html": pa.array(payloads, pa.binary())})
    )
    out = decode_features(ds, decoder="image", concurrency=1, batch_size=4)
    rows = {r["url"]: np.asarray(r["feature"]) for r in out.take_all()}
    # flat image of 40 -> every sample in bin 40>>4 == 2
    assert rows["b"][2] == 1.0
    assert abs(rows["a"].sum() - 1.0) < 1e-12
