"""Pure-Python GeoTIFF reader (sources/geotiff.py — the
geotools-raster ingest-plugin role). Golden vectors are hand-packed
TIFF structures straight from the TIFF 6.0 / OGC GeoTIFF 1.1 specs —
big-endian, tiled and planar layouts the module's own writer never
produces — so the reader is validated against the spec, not against
itself."""

import struct
import zlib

import numpy as np
import pytest

from geowave_ray.sources import geotiff as gt


def _be_ifd(entries: list[tuple[int, int, int, bytes]], data_blocks: bytes,
            first_data_off: int) -> bytes:
    """Hand-assemble a big-endian classic TIFF: header + one IFD (+ its
    out-of-line values packed by the caller into data_blocks at
    absolute offset first_data_off)."""
    hdr = struct.pack(">2sHI", b"MM", 42, 8)
    body = struct.pack(">H", len(entries))
    for tag, ftype, count, payload in entries:
        body += struct.pack(">HHI", tag, ftype, count) + payload
    body += struct.pack(">I", 0)
    blob = hdr + body
    assert len(blob) == first_data_off, (len(blob), first_data_off)
    return blob + data_blocks


def test_big_endian_strips_golden_bytes():
    # 3x2 single-band uint16, one strip, uncompressed, big-endian.
    px = np.array([[1, 2, 3], [400, 500, 60000]], dtype=">u2")
    # entries must be ascending by tag; 10 entries -> IFD ends at
    # 8 + 2 + 10*12 + 4 = 134
    data_off = 134
    strip = px.tobytes()
    geo = struct.pack(">12d", 0.5, 0.25, 0.0,            # pixel scale
                      0.0, 0.0, 0.0, 10.0, 20.0, 0.0,    # tiepoint
                      0.0, 0.0, 0.0)                     # padding block
    # out-of-line layout: [pixel scale 3d][tiepoint 6d][geokeys]
    ps_off = data_off + len(strip)
    tp_off = ps_off + 24
    gk_off = tp_off + 48
    gkd = struct.pack(">16H", 1, 1, 0, 3,
                      1024, 0, 1, 2,      # GTModelType = geographic
                      1025, 0, 1, 1,
                      2048, 0, 1, 4326)
    entries = [
        (256, 3, 1, struct.pack(">HH", 3, 0)),
        (257, 3, 1, struct.pack(">HH", 2, 0)),
        (258, 3, 1, struct.pack(">HH", 16, 0)),
        (259, 3, 1, struct.pack(">HH", 1, 0)),
        (273, 4, 1, struct.pack(">I", data_off)),
        (277, 3, 1, struct.pack(">HH", 1, 0)),
        (279, 4, 1, struct.pack(">I", len(strip))),
        (33550, 12, 3, struct.pack(">I", ps_off)),
        (33922, 12, 6, struct.pack(">I", tp_off)),
        (34735, 3, 16, struct.pack(">I", gk_off)),
    ]
    blob = _be_ifd(entries, strip + geo[:24] + struct.pack(
        ">6d", 0.0, 0.0, 0.0, 10.0, 20.0, 0.0) + gkd, data_off)
    (img,) = gt.parse_tiff(blob)
    assert img["width"] == 3 and img["height"] == 2 and img["bands"] == 1
    assert np.array_equal(img["pixels"][0], px.astype(np.float64))
    assert img["xmin"] == 10.0 and img["ymax"] == 20.0
    assert img["xmax"] == pytest.approx(10.0 + 3 * 0.5)
    assert img["ymin"] == pytest.approx(20.0 - 2 * 0.25)
    assert img["epsg"] == 4326


def test_tiled_layout_golden_bytes():
    # 3x3 uint8, 2x2 tiles (4 tiles, edge tiles padded), little-endian,
    # deflate-compressed tiles.
    full = np.arange(9, dtype=np.uint8).reshape(3, 3)
    tiles = []
    for ty in range(2):
        for tx in range(2):
            t = np.zeros((2, 2), np.uint8)
            ys, xs = ty * 2, tx * 2
            blk = full[ys:ys + 2, xs:xs + 2]
            t[:blk.shape[0], :blk.shape[1]] = blk
            tiles.append(zlib.compress(t.tobytes()))
    hdr = struct.pack("<2sHI", b"II", 42, 8)
    n = 9
    ifd_end = 8 + 2 + n * 12 + 4
    offs = []
    o = ifd_end + 32  # after the two out-of-line arrays (4*4 bytes each)
    for t in tiles:
        offs.append(o)
        o += len(t)
    entries = b""
    for tag, ftype, count, payload in [
        (256, 3, 1, struct.pack("<HH", 3, 0)),
        (257, 3, 1, struct.pack("<HH", 3, 0)),
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (259, 3, 1, struct.pack("<HH", 8, 0)),  # deflate
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (322, 3, 1, struct.pack("<HH", 2, 0)),
        (323, 3, 1, struct.pack("<HH", 2, 0)),
        (324, 4, 4, struct.pack("<I", ifd_end)),
        (325, 4, 4, struct.pack("<I", ifd_end + 16)),
    ]:
        entries += struct.pack("<HHI", tag, ftype, count) + payload
    blob = (
        hdr + struct.pack("<H", n) + entries + struct.pack("<I", 0)
        + struct.pack("<4I", *offs)
        + struct.pack("<4I", *[len(t) for t in tiles])
        + b"".join(tiles)
    )
    (img,) = gt.parse_tiff(blob)
    assert np.array_equal(img["pixels"][0], full.astype(np.float64))


def test_planar_configuration_two_golden_bytes():
    # 2 bands x 2x2 uint8, planar (one strip per band).
    b0 = np.array([[1, 2], [3, 4]], np.uint8)
    b1 = np.array([[9, 8], [7, 6]], np.uint8)
    hdr = struct.pack("<2sHI", b"II", 42, 8)
    n = 9
    ifd_end = 8 + 2 + n * 12 + 4
    # out-of-line: strip offsets (2x4), strip counts (2x4); the 2-SHORT
    # BitsPerSample array fits the 4 inline bytes (spec: values go
    # inline whenever they fit)
    so_off, sc_off = ifd_end, ifd_end + 8
    d0, d1 = ifd_end + 16, ifd_end + 20
    entries = b""
    for tag, ftype, count, payload in [
        (256, 3, 1, struct.pack("<HH", 2, 0)),
        (257, 3, 1, struct.pack("<HH", 2, 0)),
        (258, 3, 2, struct.pack("<HH", 8, 8)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 2, struct.pack("<I", so_off)),
        (277, 3, 1, struct.pack("<HH", 2, 0)),
        (278, 4, 1, struct.pack("<I", 2)),
        (279, 4, 2, struct.pack("<I", sc_off)),
        (284, 3, 1, struct.pack("<HH", 2, 0)),  # planar
    ]:
        entries += struct.pack("<HHI", tag, ftype, count) + payload
    blob = (
        hdr + struct.pack("<H", n) + entries + struct.pack("<I", 0)
        + struct.pack("<2I", d0, d1) + struct.pack("<2I", 4, 4)
        + b0.tobytes() + b1.tobytes()
    )
    (img,) = gt.parse_tiff(blob)
    assert img["bands"] == 2
    assert np.array_equal(img["pixels"][0], b0.astype(np.float64))
    assert np.array_equal(img["pixels"][1], b1.astype(np.float64))


def test_lzw_golden_vector():
    # TIFF 6.0 §13 worked example: the encoded stream for the 9-byte
    # message 7 7 7 8 8 7 7 6 6 must decode back exactly, and our
    # encoder must produce a stream our decoder inverts (plus the
    # early-change boundary crossed by a 600-symbol alphabet sweep).
    msg = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    assert gt._lzw_decode(gt._lzw_encode(msg)) == msg
    sweep = bytes(range(256)) * 40  # forces width 9 -> 10 -> 11
    assert gt._lzw_decode(gt._lzw_encode(sweep)) == sweep


def test_packbits_spec_example():
    # The canonical Apple PackBits example from the TIFF 6.0 spec.
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    dec = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert gt._unpackbits(enc) == dec


def test_writer_reader_roundtrip_matrix():
    rng = np.random.RandomState(3)
    for dt in (np.uint8, np.int16, np.uint32, np.float64):
        for comp in ("none", "deflate", "packbits", "lzw"):
            px = rng.randint(0, 200, (2, 11, 7)).astype(dt)
            pred = comp != "none" and dt != np.float64
            blob = gt.write_geotiff(
                px, (-5.0, 40.0, 2.0, 47.0), epsg=32633, nodata=-1.0,
                compression=comp, rows_per_strip=3, predictor=pred,
            )
            t = gt.read_geotiff(blob, "f")
            got = np.array(t.column("pixels")[0].as_py()).reshape(2, 11, 7)
            assert np.array_equal(got, px.astype(np.float64)), (dt, comp)
            assert t.column("epsg")[0].as_py() == 32633
            assert t.column("nodata")[0].as_py() == -1.0


def test_fixture_truth_matches_reader():
    from geowave_ray.fixtures import gen_geotiffs
    from geowave_ray.sources.geotiff import parse_geotiff_batch

    files, truth = gen_geotiffs(20)
    parsed = parse_geotiff_batch(files)
    assert parsed.num_rows == truth.num_rows
    for col in ("chunk_id", "width", "height", "bands", "epsg"):
        assert parsed.column(col).to_pylist() == truth.column(col).to_pylist()
    for col in ("xmin", "ymin", "xmax", "ymax"):
        assert parsed.column(col).to_pylist() == truth.column(col).to_pylist()
    nod = parsed.column("nodata").to_pylist()
    assert nod == truth.column("nodata").to_pylist()
    for i in range(truth.num_rows):
        v = np.asarray(parsed.column("pixels")[i].as_py(), np.float64)
        assert float(np.sum(v)) == truth.column("pixel_sum")[i].as_py()


def test_unsupported_compression_raises():
    blob = gt.write_geotiff(np.zeros((1, 2, 2), np.uint8), (0, 0, 1, 1))
    bad = bytearray(blob)
    # patch the compression tag value to JPEG (7): find tag 259
    n = struct.unpack_from("<H", bad, 8)[0]
    for i in range(n):
        tag = struct.unpack_from("<H", bad, 10 + 12 * i)[0]
        if tag == 259:
            struct.pack_into("<H", bad, 10 + 12 * i + 8, 7)
    with pytest.raises(ValueError):
        gt.parse_tiff(bytes(bad))
