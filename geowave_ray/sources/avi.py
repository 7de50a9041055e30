"""Pure-Python AVI / Motion-JPEG container codec — the real VIDEO
path for the multimodal binary-column stages.

Implements the published Microsoft RIFF/AVI 1.0 container layout
(RIFF 'AVI ' -> LIST 'hdrl' ('avih' main header, LIST 'strl' with
'strh'/'strf' stream headers) -> LIST 'movi' ('00dc' compressed video
chunks, word-aligned) -> 'idx1' index) with the MJPG fourcc: every
video chunk is a standalone baseline JPEG decoded by
``sources/jpeg.py``. Motion-JPEG has no inter-frame prediction, so
frames are independent — exactly the shape the frame-sampling stage
(``multimodal.sample_frames``) wants: any subset of chunks decodes
without touching the others, and a 100 TB corpus of clips can sample
frames inside ``map_batches`` actors with no cross-frame state.

The reference reaches video through GeoTools/ImageIO-ext; this module
plays that role for web-crawl payloads beside the still-image codecs.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode(frames: list[np.ndarray], fps: int = 10,
           subsampling: str = "4:2:0") -> bytes:
    """uint8 frames (all same (H, W) grey or (H, W, 3) RGB) -> AVI
    bytes with one MJPG video stream."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
    blobs = [
        jpeg.encode(f) if f.ndim == 2 else jpeg.encode(f, subsampling)
        for f in frames
    ]
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,            # microseconds per frame
        max(len(b) for b in blobs) * fps,  # max bytes per second
        0,                            # padding granularity
        0x10,                         # AVIF_HASINDEX
        len(blobs), 0, 1,             # total frames, initial, streams
        max(len(b) for b in blobs),   # suggested buffer
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIIhhhh",
                      0, 0, 0, 0,     # flags, priority, language, initial
                      1, fps,          # scale, rate (fps = rate/scale)
                      0, len(blobs),   # start, length
                      max(len(b) for b in blobs), 10_000, 0,
                      0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = []
    offsets = []
    off = 4  # relative to the start of the 'movi' kind tag
    for b in blobs:
        offsets.append(off)
        c = _chunk(b"00dc", b)
        movi_chunks.append(c)
        off += len(c)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, o, len(b))
        for o, b in zip(offsets, blobs)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, pos: int, end: int):
    """Yield (tag, payload_start, payload_len) for chunks in a range.

    ``end`` is clamped to the real buffer (a declared LIST size larger
    than the file must not walk past it)."""
    end = min(end, len(buf))
    while pos + 8 <= end:
        tag = buf[pos:pos + 4]
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        yield tag, pos + 8, n
        pos += 8 + n + (n % 2)


def probe(buf: bytes) -> dict:
    """Container metadata without decoding any frame: dims, frame
    count and byte offsets of each video chunk (the sampling stage
    uses these to decode ONLY the sampled frames)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    meta = {"frames": [], "width": None, "height": None,
            "us_per_frame": None, "handler": None}
    for tag, p, n in _walk(buf, 12, len(buf)):
        if tag != b"LIST":
            continue
        kind = buf[p:p + 4]
        if kind == b"hdrl":
            for t2, p2, n2 in _walk(buf, p + 4, p + n):
                if t2 == b"avih":
                    if n2 < 40 or len(buf) < p2 + 40:
                        raise ValueError("AVI: truncated avih header")
                    us, _mbs, _pad, _flags, total = struct.unpack_from(
                        "<IIIII", buf, p2)
                    meta["us_per_frame"] = us
                    meta["width"], meta["height"] = struct.unpack_from(
                        "<II", buf, p2 + 32)
                elif t2 == b"LIST" and buf[p2:p2 + 4] == b"strl":
                    for t3, p3, n3 in _walk(buf, p2 + 4, p2 + n2):
                        if t3 == b"strh" and buf[p3:p3 + 4] == b"vids":
                            meta["handler"] = buf[p3 + 4:p3 + 8].decode(
                                "ascii", "replace")
        elif kind == b"movi":
            for t2, p2, n2 in _walk(buf, p + 4, p + n):
                if t2[2:4] in (b"dc", b"db"):
                    meta["frames"].append((p2, n2))
    if meta["width"] is None:
        raise ValueError("AVI: missing avih header")
    return meta


def decode_frame(buf: bytes, meta: dict, idx: int) -> np.ndarray:
    """Decode one frame by index using probe() offsets."""
    p, n = meta["frames"][idx]
    img, _ = jpeg.decode(buf[p:p + n])
    return img


def decode(buf: bytes, every_n: int = 1) -> tuple[list[np.ndarray], dict]:
    """AVI bytes -> (decoded frames [::every_n], meta). MJPG only."""
    meta = probe(buf)
    if meta["handler"] not in ("MJPG", None):
        raise ValueError(f"AVI: unsupported codec {meta['handler']!r} "
                         "(MJPG only)")
    frames = [
        decode_frame(buf, meta, i)
        for i in range(0, len(meta["frames"]), every_n)
    ]
    return frames, meta
