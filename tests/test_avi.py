"""AVI/MJPEG container tests (sources/avi.py) — RIFF structure
walked byte-by-byte in the test, probe-without-decode, frame
independence, sampling stride, rejection paths, and the flat-map
frame-sampling actor stage."""

import struct

import numpy as np
import pytest

from geowave_ray.sources import avi, jpeg


def _frames(n=5, h=16, w=32):
    return [np.full((h, w), 10 * k + 5, np.uint8) for k in range(n)]


def test_riff_structure_golden():
    """Walk the produced container with the test's own RIFF reader:
    RIFF/AVI signature, hdrl with avih dims, movi with n word-aligned
    00dc chunks each a standalone JPEG, trailing idx1."""
    frames = _frames(3)
    buf = avi.encode(frames, fps=5)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    (riff_len,) = struct.unpack_from("<I", buf, 4)
    assert riff_len == len(buf) - 8
    pos = 12
    kinds = []
    jpegs = []
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == b"LIST":
            kind = buf[pos + 8:pos + 12]
            kinds.append(kind)
            if kind == b"movi":
                p2 = pos + 12
                end = pos + 8 + n
                while p2 + 8 <= end:
                    t2 = buf[p2:p2 + 4]
                    (n2,) = struct.unpack_from("<I", buf, p2 + 4)
                    assert t2 == b"00dc"
                    jpegs.append(buf[p2 + 8:p2 + 8 + n2])
                    p2 += 8 + n2 + (n2 % 2)
        else:
            kinds.append(tag)
        pos += 8 + n + (n % 2)
    assert kinds[0] == b"hdrl" and b"movi" in kinds and b"idx1" in kinds
    assert len(jpegs) == 3
    for k, j in enumerate(jpegs):
        img, _ = jpeg.decode(j)  # every chunk is a standalone JPEG
        assert np.all(img == 10 * k + 5)


def test_probe_reads_index_without_decoding():
    buf = avi.encode(_frames(4), fps=10)
    meta = avi.probe(buf)
    assert meta["width"] == 32 and meta["height"] == 16
    assert meta["handler"] == "MJPG"
    assert meta["us_per_frame"] == 100_000
    assert len(meta["frames"]) == 4
    # frames decode independently in any order
    f2 = avi.decode_frame(buf, meta, 2)
    f0 = avi.decode_frame(buf, meta, 0)
    assert np.all(f2 == 25) and np.all(f0 == 5)


@pytest.mark.parametrize("every_n,expect", [(1, 5), (2, 3), (3, 2)])
def test_decode_sampling_stride(every_n, expect):
    frames = _frames(5)
    out, _ = avi.decode(avi.encode(frames), every_n=every_n)
    assert len(out) == expect
    for i, img in enumerate(out):
        assert np.array_equal(img, frames[i * every_n])


def test_color_frames_roundtrip_shape():
    rng = np.random.default_rng(2)
    cf = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
          for _ in range(3)]
    out, _ = avi.decode(avi.encode(cf, subsampling="4:4:4"))
    assert [o.shape for o in out] == [(16, 16, 3)] * 3


def test_rejections():
    with pytest.raises(ValueError, match="RIFF"):
        avi.probe(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="dimensions"):
        avi.encode([np.zeros((8, 8), np.uint8), np.zeros((8, 16), np.uint8)])
    with pytest.raises(ValueError, match="at least one"):
        avi.encode([])


def test_avi_payload_in_image_feature_column(ray_session):
    """A video clip inside a mixed 'image' column decodes its FIRST
    frame's histogram instead of crashing the stage."""
    import pyarrow as pa
    import ray.data

    from geowave_ray.multimodal import decode_features

    clip = avi.encode([np.full((8, 8), 40, np.uint8),
                       np.full((8, 8), 200, np.uint8)])
    ds = ray.data.from_arrow(
        pa.table({"url": pa.array(["v"]),
                  "html": pa.array([clip], pa.binary())})
    )
    out = decode_features(ds, decoder="image", concurrency=1, batch_size=2)
    (row,) = out.take_all()
    feat = np.asarray(row["feature"])
    assert feat[40 >> 4] == 1.0  # first frame only


def test_frame_sampler_custom_id_col(ray_session):
    import pyarrow as pa
    import ray.data

    from geowave_ray.multimodal import sample_frames

    clip = avi.encode([np.full((8, 8), 16, np.uint8)] * 2)
    ds = ray.data.from_arrow(
        pa.table({"clip_id": pa.array([7], pa.int64()),
                  "payload": pa.array([clip], pa.binary())})
    )
    out = sample_frames(ds, every_n=1, id_col="clip_id", concurrency=1)
    rows = out.take_all()
    assert [r["clip_id"] for r in rows] == [7, 7]
    assert [r["frame_idx"] for r in rows] == [0, 1]


def test_cli_decode_and_sample_frames(tmp_path, ray_session):
    """The decode / sample-frames CLI verbs end-to-end over a mixed
    media table and a video table."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from geowave_ray.cli import main
    from geowave_ray.sources.png import encode as png_encode

    media = tmp_path / "media.parquet"
    pq.write_table(
        pa.table({
            "item": pa.array(["p", "g"]),
            "blob": pa.array(
                [png_encode(np.full((8, 8), 32, np.uint8)),
                 avi.encode([np.full((8, 8), 64, np.uint8)])],
                pa.binary()),
        }),
        str(media),
    )
    out1 = tmp_path / "feats"
    assert main(["decode", str(media), str(out1),
                 "--col", "blob", "--url-col", "item"]) == 0
    feats = pq.read_table(str(out1))
    assert feats.num_rows == 2 and "feature" in feats.column_names

    vids = tmp_path / "vids.parquet"
    pq.write_table(
        pa.table({
            "vid_id": pa.array([1], pa.int64()),
            "payload": pa.array(
                [avi.encode([np.full((8, 8), 16, np.uint8)] * 4)],
                pa.binary()),
        }),
        str(vids),
    )
    out2 = tmp_path / "frames"
    assert main(["sample-frames", str(vids), str(out2),
                 "--every-n", "2"]) == 0
    fr = pq.read_table(str(out2))
    assert sorted(fr.column("frame_idx").to_pylist()) == [0, 2]


def test_frame_sampler_stage(ray_session):
    import pyarrow as pa
    import ray.data

    from geowave_ray.multimodal import BinaryDecoder, sample_frames

    vids = []
    for i in range(4):
        frames = [np.full((8, 16), (7 * i + 3 * f) % 256, np.uint8)
                  for f in range(3 + i)]
        vids.append(avi.encode(frames))
    assert BinaryDecoder.sniff(vids[0]) == "avi"
    ds = ray.data.from_arrow(
        pa.table({"vid_id": pa.array(list(range(4)), pa.int64()),
                  "payload": pa.array(vids, pa.binary())})
    )
    out = sample_frames(ds, every_n=2, concurrency=1, batch_size=4)
    rows = sorted(
        ((r["vid_id"], r["frame_idx"], r["px_sum"]) for r in out.take_all())
    )
    expect = []
    for i in range(4):
        for f in range(0, 3 + i, 2):
            expect.append((i, f, 8 * 16 * ((7 * i + 3 * f) % 256)))
    assert rows == sorted(expect)
