"""GIF + BMP codec tests (sources/gif.py, sources/bmp.py) — golden
vectors built byte-by-byte in the test (independent of the production
encoders), LZW width-growth and overflow-clear streams, four-pass
interlace, extension skipping, BMP row padding / BGR / bottom-up
order, palette expansion, and encode->decode roundtrips; plus the
format-sniffing multimodal actor stage over a mixed payload column."""

import struct

import numpy as np
import pytest

from geowave_ray.sources import bmp, gif

# the canonical 1x1 white GIF89a (widely published golden bytes):
# GCT of 2 entries (white, black); LZW stream 0x44 0x01 decodes, LSB
# first at 3-bit width, to [clear(100b), 0(000b), EOI(101b)]
_GIF_1PX = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
    b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
)


def test_gif_golden_1px():
    img, meta = gif.decode(_GIF_1PX)
    assert img.shape == (1, 1, 3)
    assert img.tolist() == [[[255, 255, 255]]]
    assert meta["version"] == "89a"
    assert meta["width"] == 1 and meta["height"] == 1
    assert not meta["interlaced"]


def test_gif_golden_hand_packed_stream():
    """2x2 image, code stream hand-packed LSB-first by the test's own
    bit-writer (independent of the production encoder) at
    min-code-size 2: clear=4, EOI=5, literals [1, 0, 0, 1], with the
    spec width growth (decoder grows when next_code == 1<<width)
    placing the last two codes at 4 bits."""
    # decoder timeline: read 4=clear @3; read 1 @3 (no add); read 0 @3
    # -> add 6=(1,0); read 0 @3 -> add 7=(0,0), next=8 -> width 4;
    # read 1 @4 -> add 8=(0,1); read 5=EOI @4. output = 1,0,0,1
    codes = [(4, 3), (1, 3), (0, 3), (0, 3), (1, 4), (5, 4)]
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    buf = (
        b"GIF89a\x02\x00\x02\x00\x80\x00\x00"
        b"\x10\x20\x30\x40\x50\x60"  # palette: idx0=(16,32,48) idx1=(64,80,96)
        + b"," + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2, len(out)]) + bytes(out) + b"\x00;"
    )
    img, meta = gif.decode(buf)
    assert img.tolist() == [
        [[64, 80, 96], [16, 32, 48]],
        [[16, 32, 48], [64, 80, 96]],
    ]


def test_gif_extensions_and_transparency():
    pal = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    idx = np.array([[1, 0], [0, 1]], np.uint8)
    buf = gif.encode(idx, pal, transparent=0, comment=b"x" * 600)
    img, meta = gif.decode(buf)
    assert meta["transparent"] == 0
    assert np.array_equal(img, pal[idx])
    # unknown application extension is skipped by sub-block framing
    # (insert right after the global colour table, whose size comes
    # from the packed LSD byte)
    gct_end = 13 + 3 * (1 << ((buf[10] & 0x07) + 1))
    app = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    patched = buf[:gct_end] + app + buf[gct_end:]
    img2, _ = gif.decode(patched)
    assert np.array_equal(img2, pal[idx])


def test_gif_interlace_four_pass():
    """9 rows exercise all four passes: delivered order must be
    0,8 / 4 / 2,6 / 1,3,5,7 (GIF89a appendix E)."""
    h, w = 9, 3
    idx = (np.arange(h * w) % 256).astype(np.uint8).reshape(h, w)
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    buf = gif.encode(idx, pal, interlace=True)
    img, meta = gif.decode(buf)
    assert meta["interlaced"]
    assert np.array_equal(img, pal[idx])


def test_gif_lzw_overflow_clear():
    """An image large enough to fill the 12-bit table forces the
    encoder's mid-stream clear; the decoder must resync."""
    h = w = 300
    idx = (np.arange(h * w, dtype=np.int64) * 7919 % 256).astype(
        np.uint8
    ).reshape(h, w)
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    out, _ = gif.decode(gif.encode(idx, pal))
    assert np.array_equal(out, pal[idx])


def test_gif_local_color_table_and_frames():
    """decode_all returns raw frames; a local colour table overrides
    the global one (hand-spliced second image block)."""
    pal_g = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.array([[0, 1]], np.uint8)
    one = gif.encode(idx, pal_g)
    # splice a second image with a 2-entry LOCAL table before trailer
    body = one[:-1]
    lct = bytes([9, 8, 7, 6, 5, 4])
    img_desc = b"," + struct.pack("<HHHHB", 0, 0, 2, 1, 0x80)  # LCT, size 2
    # reuse the first image's LZW payload (same 1x2 index plane)
    first_img_at = one.index(b",")
    lzw_part = one[first_img_at + 10:-1]
    buf = body + img_desc + lct + lzw_part + b";"
    frames, meta = gif.decode_all(buf)
    assert len(frames) == 2
    assert frames[0][0].tolist() == [[[1, 2, 3], [4, 5, 6]]]
    assert frames[1][0].tolist() == [[[9, 8, 7], [6, 5, 4]]]


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="bad signature"):
        gif.decode(b"NOTAGIF" * 4)
    with pytest.raises(ValueError):
        gif.decode(_GIF_1PX[:20])  # truncated mid-descriptor
    # bad LZW minimum code size must raise, not corrupt or IndexError
    bad = bytearray(_GIF_1PX)
    # tail layout: mcs, blocklen(2), 0x44, 0x01, terminator 0, ';'
    mcs_at = len(_GIF_1PX) - 6
    assert bad[mcs_at] == 2
    for v in (1, 9, 12):
        bad[mcs_at] = v
        with pytest.raises(ValueError, match="code size"):
            gif.decode(bytes(bad))
    # truncation right after an extension introducer: ValueError, not
    # IndexError (pipelines catch ValueError for bad payloads)
    pal = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    buf = gif.encode(np.array([[1, 0]], np.uint8), pal)
    gct_end = 13 + 3 * (1 << ((buf[10] & 0x07) + 1))
    with pytest.raises(ValueError, match="truncated"):
        gif.decode(buf[:gct_end] + b"\x21")
    # truncated global colour table
    with pytest.raises(ValueError, match="colour table"):
        gif.decode(buf[:gct_end - 2])


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(interlace):
    rng = np.random.default_rng(7)
    for _ in range(8):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        npal = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
        idx = rng.integers(0, npal, (h, w)).astype(np.uint8)
        out, meta = gif.decode(gif.encode(idx, pal, interlace=interlace))
        assert np.array_equal(out, pal[idx])
        assert meta["interlaced"] == interlace


# ----------------------------------------------------------------- BMP


def test_bmp_golden_hand_built():
    """2x2 24-bit bottom-up BMP assembled byte-by-byte: stride pads
    6 -> 8 bytes, rows stored bottom-first, channels BGR."""
    top = [(10, 20, 30), (40, 50, 60)]
    bot = [(70, 80, 90), (100, 110, 120)]
    rows = b""
    for r, g, b in bot:
        rows += bytes([b, g, r])
    rows += b"\x00\x00"  # pad to 8
    row2 = b""
    for r, g, b in top:
        row2 += bytes([b, g, r])
    row2 += b"\x00\x00"
    pixeldata = rows + row2  # bottom-up: bottom row first
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 16, 0, 0, 54)
    img, meta = bmp.decode(hdr + info + pixeldata)
    assert meta["bpp"] == 24 and not meta["top_down"]
    assert img.tolist() == [list(map(list, top)), list(map(list, bot))]


def test_bmp_8bit_palette_and_clr_used():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    buf = bmp.encode(idx, palette=pal)
    # header declares clrUsed=3 -> decoder reads a 3-entry palette
    assert struct.unpack_from("<I", buf, 14 + 32)[0] == 3
    img, meta = bmp.decode(buf)
    assert meta["bpp"] == 8
    assert np.array_equal(img, pal[idx])


def test_bmp_top_down_and_rgba():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 4)).astype(np.uint8)
    out, meta = bmp.decode(bmp.encode(img, top_down=True))
    assert meta["top_down"] and meta["bpp"] == 32
    assert np.array_equal(out, img)


def test_bmp_rejects_unsupported():
    img = np.zeros((2, 2, 3), np.uint8)
    buf = bytearray(bmp.encode(img))
    buf[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        bmp.decode(bytes(buf))
    with pytest.raises(ValueError, match="magic"):
        bmp.decode(b"XX" + bytes(buf[2:]))


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])
def test_bmp_stride_padding(w):
    """Every width mod 4 for 8- and 24-bit rows."""
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    idx = (np.arange(3 * w) % 256).astype(np.uint8).reshape(3, w)
    assert np.array_equal(bmp.decode(bmp.encode(idx, palette=pal))[0], pal[idx])
    img = (np.arange(3 * w * 3) % 256).astype(np.uint8).reshape(3, w, 3)
    assert np.array_equal(bmp.decode(bmp.encode(img))[0], img)


# -------------------------------------------- multimodal sniffing stage


def test_multimodal_image_sniffing_stage(ray_session):
    """BinaryDecoder(decoder='image') dispatches a mixed PNG/GIF/BMP/
    WAV column by magic bytes inside the actor pool."""
    import pyarrow as pa
    import ray.data

    from geowave_ray.multimodal import BinaryDecoder, decode_features
    from geowave_ray.sources.png import encode as png_encode
    from geowave_ray.sources.wav import encode as wav_encode

    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    grey = (np.arange(64, dtype=np.int64) % 256).astype(np.uint8).reshape(8, 8)
    payloads = [
        png_encode(grey),
        gif.encode(grey, pal),
        bmp.encode(grey, palette=pal),
        wav_encode(np.zeros((100, 1), np.int16), rate=8000),
        b"not an image at all",
    ]
    assert [BinaryDecoder.sniff(p) for p in payloads] == [
        "png", "gif", "bmp", "wav", "unknown",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(len(payloads))]),
                "html": pa.array(payloads, pa.binary()),
            }
        )
    )
    out = decode_features(ds, decoder="image", concurrency=1, batch_size=8)
    rows = {r["url"]: np.asarray(r["feature"]) for r in out.take_all()}
    # png payload: grey 8x8 with values 0..63 -> bins 0..3 equal mass
    assert np.allclose(rows["u0"][:4], 0.25) and rows["u0"][4:].sum() == 0
    # gif/bmp of the same plane expand through the grey palette ->
    # identical histograms across all three image containers
    assert np.allclose(rows["u1"], rows["u2"])
    # wav silence: all samples in the middle bin
    assert rows["u3"][8] == 1.0
    # unknown payload: zero vector
    assert rows["u4"].sum() == 0.0
