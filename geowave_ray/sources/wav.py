"""Pure-Python WAV/RIFF PCM codec (stdlib struct + numpy) — the real
audio-decode kernel for the multimodal binary-column stages.

Implements the published RIFF/WAVE format (Microsoft/IBM WAVE spec,
also RFC 2361 registry): ``RIFF`` container framing, ``fmt `` chunk
(PCM format tag 1 and IEEE-float tag 3), word-aligned chunk skipping,
and the ``data`` payload as interleaved little-endian samples —
unsigned 8-bit, signed 16/24/32-bit PCM and 32-bit float, any channel
count. Plays the audio half of the multimodal-column story the same
way ``sources/png.py`` plays the image half: wire format from the
public spec, vectorized numpy decode, golden vectors in tests.
"""

from __future__ import annotations

import struct

import numpy as np


def encode(samples: np.ndarray, rate: int = 16_000,
           sample_width: int = 2) -> bytes:
    """(n,) mono or (n, ch) interleaved samples -> WAV bytes.

    ``sample_width``: 1 (unsigned 8-bit), 2 (int16), 3 (int24),
    4 (int32). Float input must already be scaled to the integer
    range; integer dtypes are written as-is."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if sample_width == 1:
        raw = np.asarray(samples, np.uint8).reshape(-1).tobytes()
    elif sample_width == 2:
        raw = np.asarray(samples, "<i2").reshape(-1).tobytes()
    elif sample_width == 3:
        s32 = np.asarray(samples, "<i4").reshape(-1)
        b4 = s32.view(np.uint32)
        out = np.empty((len(s32), 3), np.uint8)
        out[:, 0] = b4 & 0xFF
        out[:, 1] = (b4 >> 8) & 0xFF
        out[:, 2] = (b4 >> 16) & 0xFF
        raw = out.tobytes()
    elif sample_width == 4:
        raw = np.asarray(samples, "<i4").reshape(-1).tobytes()
    else:
        raise ValueError(f"unsupported sample_width {sample_width}")
    block = ch * sample_width
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block,
                      8 * sample_width)
    data_len = len(raw)
    riff_len = 4 + (8 + len(fmt)) + (8 + data_len + (data_len & 1))
    out = [b"RIFF", struct.pack("<I", riff_len), b"WAVE",
           b"fmt ", struct.pack("<I", len(fmt)), fmt,
           b"data", struct.pack("<I", data_len), raw]
    if data_len & 1:  # RIFF chunks are word-aligned
        out.append(b"\x00")
    return b"".join(out)


def decode(buf: bytes) -> tuple[np.ndarray, dict]:
    """WAV bytes -> (int32/float32 array (n, ch), meta dict).

    Integer PCM decodes to int32 at native magnitude (8-bit is
    re-centred from unsigned); float32 stays float32. Unknown chunks
    (LIST/fact/cue/...) are skipped per the RIFF rules."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        payload = buf[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # word alignment
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError("WAV: truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            data = payload
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    tag_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if tag_fmt not in (1, 3):
        raise ValueError(f"unsupported WAVE format tag {tag_fmt} "
                         "(PCM=1 and IEEE-float=3 only)")
    if tag_fmt == 3:
        if bits != 32:
            raise ValueError("float WAVE must be 32-bit")
        arr = np.frombuffer(data, "<f4").astype(np.float32)
    elif bits == 8:
        arr = (np.frombuffer(data, np.uint8).astype(np.int32) - 128)
    elif bits == 16:
        arr = np.frombuffer(data, "<i2").astype(np.int32)
    elif bits == 24:
        b = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.uint32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr = u.astype(np.int32)
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
    elif bits == 32:
        arr = np.frombuffer(data, "<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    n = len(arr) // ch
    meta = {"rate": rate, "channels": ch, "bits": bits,
            "format": "float" if tag_fmt == 3 else "pcm", "n_frames": n}
    return arr[:n * ch].reshape(n, ch), meta
