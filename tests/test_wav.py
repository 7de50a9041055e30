"""WAV/RIFF PCM codec tests (sources/wav.py): golden bytes built
struct-by-struct in the test (independent of the production encoder),
every supported sample width, float format, chunk skipping and word
alignment, plus the multimodal actor stage on real WAV payloads."""

import struct

import numpy as np
import pytest

from geowave_ray.sources.wav import decode, encode


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WAVE"
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fmt(tag=1, ch=1, rate=8000, bits=16):
    block = ch * bits // 8
    return struct.pack("<HHIIHH", tag, ch, rate, rate * block, block, bits)


def test_decode_golden_16bit_stereo():
    # frames: (100, -100), (32767, -32768)
    data = struct.pack("<4h", 100, -100, 32767, -32768)
    buf = _riff([(b"fmt ", _fmt(ch=2, bits=16)), (b"data", data)])
    s, meta = decode(buf)
    assert meta == {"rate": 8000, "channels": 2, "bits": 16,
                    "format": "pcm", "n_frames": 2}
    assert s.tolist() == [[100, -100], [32767, -32768]]


def test_decode_golden_8bit_recentre_and_24bit_sign():
    s, meta = decode(_riff([(b"fmt ", _fmt(bits=8)),
                            (b"data", bytes([0, 128, 255]))]))
    assert s[:, 0].tolist() == [-128, 0, 127] and meta["bits"] == 8
    # 24-bit: 0x000001 = 1, 0xFFFFFF = -1, 0x800000 = -2^23
    data = bytes([1, 0, 0, 255, 255, 255, 0, 0, 128])
    s, meta = decode(_riff([(b"fmt ", _fmt(bits=24)), (b"data", data)]))
    assert s[:, 0].tolist() == [1, -1, -(1 << 23)] and meta["bits"] == 24


def test_unknown_chunks_skipped_and_word_alignment():
    # odd-length LIST chunk before fmt/data: RIFF pads to word boundary
    data = struct.pack("<2h", 7, -7)
    buf = _riff([(b"LIST", b"junk!"), (b"fmt ", _fmt()), (b"fact", b"\x01"),
                 (b"data", data)])
    s, meta = decode(buf)
    assert s[:, 0].tolist() == [7, -7] and meta["n_frames"] == 2


def test_float32_format():
    data = np.array([0.5, -0.25], "<f4").tobytes()
    buf = _riff([(b"fmt ", _fmt(tag=3, bits=32)), (b"data", data)])
    s, meta = decode(buf)
    assert meta["format"] == "float" and s.dtype == np.float32
    assert s[:, 0].tolist() == [0.5, -0.25]


def test_rejections():
    with pytest.raises(ValueError, match="RIFF"):
        decode(b"nope" * 4)
    buf = _riff([(b"fmt ", _fmt(tag=7)), (b"data", b"\x00\x00")])
    with pytest.raises(ValueError, match="format tag"):
        decode(buf)
    with pytest.raises(ValueError, match="missing"):
        decode(_riff([(b"fmt ", _fmt())]))


@pytest.mark.parametrize("width,ch", [(1, 1), (2, 2), (3, 1), (4, 2)])
def test_roundtrip(width, ch):
    rng = np.random.default_rng(width * 10 + ch)
    lo, hi = (0, 256) if width == 1 else (-(1 << (8 * width - 1)),
                                          1 << (8 * width - 1))
    s = rng.integers(lo, hi, (301, ch), dtype=np.int64)
    got, meta = decode(encode(s, rate=44_100, sample_width=width))
    want = s - 128 if width == 1 else s
    assert np.array_equal(got, want)
    assert meta["rate"] == 44_100 and meta["channels"] == ch


def test_multimodal_wav_decode_stage(ray_session):
    """decode_features(decoder='wav'): bits-aware value-range histogram
    of the decoded samples, checked against a brute-force bincount."""
    import pyarrow as pa
    import ray.data

    from geowave_ray.multimodal import decode_features

    urls, blobs, expect = [], [], []
    for i in range(5):
        n, ch, width = 200 + 40 * i, 1 + i % 2, [1, 2, 3][i % 3]
        idx = np.arange(n * ch, dtype=np.int64)
        if width == 1:
            stored = (13 * i + idx) % 256
            decoded = stored - 128
        else:
            stored = decoded = (13 * i + idx) % 20001 - 10000
        blobs.append(encode(stored.reshape(n, ch), sample_width=width))
        bits = 8 * width
        bins = np.clip(((decoded + (1 << (bits - 1))) * 16) >> bits, 0, 15)
        hist = np.bincount(bins, minlength=16).astype(np.float64)
        expect.append(hist / len(decoded))
        urls.append(f"u{i}")
    t = pa.table({"url": urls, "wav": pa.array(blobs, pa.binary())})
    out = decode_features(
        ray.data.from_arrow(t), col="wav", decoder="wav", concurrency=1,
        batch_size=3,
    ).to_pandas().set_index("url")
    for i in range(5):
        assert np.array_equal(np.asarray(out.loc[f"u{i}", "feature"]),
                              expect[i]), i
