"""Pure-Python BMP codec (numpy) — the uncompressed Windows bitmap
format for the multimodal binary-column stages.

Implements the published BMP format (Windows BITMAPFILEHEADER +
BITMAPINFOHEADER, BI_RGB): 8-bit palette and 24/32-bit true-colour
pixels, bottom-up and top-down (negative height) row order, rows
padded to 4-byte boundaries, palette entries stored as BGRX quads.
Decode is fully vectorized (one ``np.frombuffer`` + strided reshape
and a channel flip — no per-pixel work), which is the right shape
for a codec that runs inside ``map_batches`` actors
(``multimodal.BinaryDecoder``). Plays the GeoTools/ImageIO decode
role of ``extensions/adapters/raster/.../RasterDataAdapter.java``
for web-crawl payloads alongside ``sources/png.py`` and
``sources/gif.py``.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = "<2sIHHI"   # magic, file size, res1, res2, pixel offset
_INFO_HDR = "<IiiHHIIiiII"  # size, w, h, planes, bpp, comp, imgsize, ppm x/y, clrused, clrimp


def encode(
    img: np.ndarray,
    palette: np.ndarray | None = None,
    top_down: bool = False,
) -> bytes:
    """uint8 image -> BMP bytes.

    ``(H, W, 3)`` RGB -> 24-bit BI_RGB (stored BGR); ``(H, W, 4)``
    RGBA -> 32-bit (stored BGRA); ``(H, W)`` + ``palette`` (N<=256, 3)
    -> 8-bit indexed. Bottom-up row order by default (the common
    positive-height layout); ``top_down=True`` writes a negative
    height."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode expects uint8 samples")
    if img.ndim == 2:
        if palette is None:
            raise ValueError("8-bit BMP needs a palette")
        palette = np.asarray(palette, dtype=np.uint8)
        if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
            raise ValueError("palette must be (N<=256, 3) uint8")
        if img.size and int(img.max()) >= len(palette):
            raise ValueError("index out of palette range")
        h, w = img.shape
        bpp = 8
        rows = img
        # palette quads: B, G, R, 0
        pal = np.zeros((len(palette), 4), dtype=np.uint8)
        pal[:, 0] = palette[:, 2]
        pal[:, 1] = palette[:, 1]
        pal[:, 2] = palette[:, 0]
        pal_bytes = pal.tobytes()
        n_colors = len(palette)
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        h, w, ch = img.shape
        bpp = 8 * ch
        rows = img[:, :, [2, 1, 0] if ch == 3 else [2, 1, 0, 3]].reshape(
            h, w * ch
        )
        pal_bytes = b""
        n_colors = 0
    else:
        raise ValueError("expected (H, W), (H, W, 3) or (H, W, 4)")
    stride = (w * (bpp // 8) + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : rows.shape[1]] = rows
    if not top_down:
        padded = padded[::-1]
    offset = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        _INFO_HDR, 40, w, (-h if top_down else h), 1, bpp, 0,
        h * stride, 2835, 2835, n_colors, 0,
    )
    hdr = struct.pack(_FILE_HDR, b"BM", offset + h * stride, 0, 0, offset)
    return hdr + info + pal_bytes + padded.tobytes()


def decode(buf: bytes) -> tuple[np.ndarray, dict]:
    """BMP bytes -> (uint8 array, meta dict).

    8-bit palette images expand to ``(H, W, 3)`` RGB; 24-bit decodes
    to ``(H, W, 3)`` RGB; 32-bit to ``(H, W, 4)`` RGBA. BI_RGB only
    (the uncompressed baseline every writer supports); RLE variants
    are rejected with a clear error."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    if len(buf) < 14 + 40:
        raise ValueError("BMP: truncated header")
    _magic, _fsize, _r1, _r2, offset = struct.unpack_from(_FILE_HDR, buf, 0)
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    (_sz, w, h_signed, planes, bpp, comp, _imgsize, _px, _py,
     clr_used, _clr_imp) = struct.unpack_from(_INFO_HDR, buf, 14)
    if planes != 1:
        raise ValueError("BMP: planes must be 1")
    if comp != 0:
        raise ValueError(f"BMP: unsupported compression {comp} (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP: unsupported bit depth {bpp}")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    palette = None
    if bpp == 8:
        n = clr_used or 256
        pal_off = 14 + hdr_size
        quads = np.frombuffer(buf[pal_off:pal_off + 4 * n], np.uint8)
        if len(quads) != 4 * n:
            raise ValueError("BMP: truncated palette")
        quads = quads.reshape(n, 4)
        palette = quads[:, [2, 1, 0]]  # BGRX -> RGB
    stride = (w * (bpp // 8) + 3) & ~3
    data = np.frombuffer(buf[offset:offset + h * stride], np.uint8)
    if len(data) != h * stride:
        raise ValueError("BMP: truncated pixel data")
    rows = data.reshape(h, stride)[:, : w * (bpp // 8)]
    if not top_down:
        rows = rows[::-1]
    meta = {"width": w, "height": h, "bpp": bpp, "top_down": top_down}
    if bpp == 8:
        if palette is None:
            raise ValueError("BMP: 8-bit image without palette")
        img = palette[rows]
    elif bpp == 24:
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    else:
        img = rows.reshape(h, w, 4)[:, :, [2, 1, 0, 3]]  # BGRA -> RGBA
    return np.ascontiguousarray(img), meta
