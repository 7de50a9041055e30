"""Pure-Python GIF codec (numpy) — web-image decode for the
multimodal binary-column stages.

Implements the published GIF89a specification (CompuServe, 1990):
header + logical screen descriptor, global/local colour tables,
graphic-control / comment / application extensions (parsed or
skipped by sub-block framing), image descriptors with optional
four-pass interlace, and the GIF variant of LZW — variable-width
codes packed LSB-first into 255-byte sub-blocks, clear/EOI codes,
table growth to 12 bits with an emitted clear on overflow. This is a
distinct wire format from ``sources/geotiff.py``'s TIFF LZW
(MSB-first with early-change); the two share no code by design.

The reference reaches image decode through GeoTools/ImageIO
(``extensions/adapters/raster/.../RasterDataAdapter.java`` ingest
path); this module plays that role for web-crawl payloads alongside
``sources/png.py``. The LZW symbol loop is inherently sequential per
stream (each code extends the dictionary the next code may use), so
per-image decode is a Python loop over codes; parallelism comes from
the actor pool batching many images per actor
(``multimodal.BinaryDecoder``), the same discipline as the TIFF
strip decoder.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_WIDTH = 12
# interlace passes: (first row, step) — GIF89a appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW: variable-width codes, LSB-first bit packing.

    Width starts at ``min_code_size + 1``; after an entry is added the
    width grows when the next free code no longer fits; at 4096
    entries a clear code is emitted and the table resets (the spec's
    overflow rule — decoders must honour it, so the fixture stream
    exercises it on larger images)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = indices.ravel()
    if len(seq) == 0:
        emit(eoi, width)
    else:
        w = int(seq[0])
        for k in seq[1:]:
            k = int(k)
            got = table.get((w, k))
            if got is not None:
                w = got
                continue
            emit(w, width)
            if next_code < (1 << _MAX_WIDTH):
                table[(w, k)] = next_code
                next_code += 1
                # width grows after DEFINING code 2^width (the decoder,
                # whose table lags one entry, grows at next == 2^width)
                if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
                    width += 1
            else:
                # table full: reset mid-stream (spec overflow rule)
                emit(clear, width)
                table.clear()
                next_code = eoi + 1
                width = min_code_size + 1
            w = k
        emit(w, width)
        emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_compress`; validates code stream shape."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF LZW: bad minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary as parent-pointer lists (append cost O(1); strings
    # materialized by walking parents). Plain Python ints: the
    # per-symbol walk is the hot loop, and list indexing runs ~10x
    # faster than numpy scalar reads here.
    size = 1 << _MAX_WIDTH
    parent = [-1] * size
    tail = [0] * size
    first = [0] * size
    for i in range(clear):
        tail[i] = i
        first[i] = i
    next_code = eoi + 1
    out = bytearray(n_expected)
    n_out = 0
    scratch = bytearray(size)

    def expand(code: int) -> int:
        """Walk parents; write the string into out[n_out:]; return len."""
        m = 0
        c = code
        while c >= 0:
            scratch[m] = tail[c]
            m += 1
            c = parent[c]
        out[n_out:n_out + m] = scratch[m - 1::-1]
        return m

    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    n_data = len(data)
    while True:
        while nbits < width:
            if pos >= n_data:
                raise ValueError("GIF LZW: truncated code stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW: first code not a literal")
            n = expand(code)
        else:
            if code < next_code:
                n = expand(code)
                k = first[code]
            elif code == next_code:
                # KwKwK case: string = prev-string + first(prev)
                k = first[prev]
                n = expand(prev)
                out[n_out + n] = k
                n += 1
            else:
                raise ValueError(f"GIF LZW: code {code} out of range")
            if next_code < (1 << _MAX_WIDTH):
                parent[next_code] = prev
                tail[next_code] = k
                first[next_code] = first[prev]
                next_code += 1
                if next_code == (1 << width) and width < _MAX_WIDTH:
                    width += 1
        n_out += n
        prev = code
        if n_out >= n_expected:
            # spec: remaining codes (if any) end with EOI; stop here
            break
    if n_out != n_expected:
        raise ValueError(
            f"GIF LZW: decoded {n_out} pixels, expected {n_expected}"
        )
    return np.frombuffer(bytes(out), dtype=np.uint8)


# ------------------------------------------------------------- blocks


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap payload into <=255-byte length-prefixed sub-blocks + 0."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(buf[pos:pos + n])
        if len(buf) < pos + n:
            raise ValueError("GIF: truncated sub-block")
        pos += n


def _deinterlace_rows(height: int) -> np.ndarray:
    """Row order in which an interlaced stream delivers image rows."""
    order = []
    for start, step in _INTERLACE:
        order.extend(range(start, height, step))
    return np.asarray(order, dtype=np.int64)


# ------------------------------------------------------------- encode


def encode(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int | None = None,
    comment: bytes | None = None,
) -> bytes:
    """(H, W) uint8 palette indices + (N<=256, 3) palette -> GIF89a.

    Writes a global colour table sized to the next power of two >= N
    (zero-padded), an optional graphic-control extension carrying the
    transparency index, an optional comment extension, and one image
    descriptor (interlaced when asked)."""
    indices = np.asarray(indices)
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("encode expects a (H, W) uint8 index plane")
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (N<=256, 3) uint8")
    if indices.size and int(indices.max()) >= len(palette):
        raise ValueError("index out of palette range")
    h, w = indices.shape
    # colour table size field: 2^(s+1) entries
    size_field = max(1, (max(len(palette), 2) - 1).bit_length() - 1)
    n_entries = 1 << (size_field + 1)
    gct = np.zeros((n_entries, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += gct.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent & 0xFF, 0])
    if comment is not None:
        out += b"\x21\xfe" + _sub_blocks(comment)
    packed = 0x40 if interlace else 0
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, packed)
    plane = indices[_deinterlace_rows(h)] if interlace else indices
    mcs = max(2, size_field + 1)
    out.append(mcs)
    out += _sub_blocks(_lzw_compress(plane, mcs))
    out.append(0x3B)
    return bytes(out)


# ------------------------------------------------------------- decode


def decode(buf: bytes) -> tuple[np.ndarray, dict]:
    """GIF bytes -> (uint8 RGB array (H, W, 3), meta dict).

    Decodes the FIRST image block (still images and frame 0 of
    animations); extensions are parsed (graphic control: transparency
    index into ``meta['transparent']``) or skipped by sub-block
    framing. Interlaced images are reordered to natural rows. Local
    colour tables override the global one for their frame."""
    frames, meta = decode_all(buf, max_frames=1)
    if not frames:
        raise ValueError("GIF: no image block before trailer")
    img, fmeta = frames[0]
    meta.update(fmeta)
    return img, meta


def decode_all(buf: bytes, max_frames: int | None = None):
    """All image blocks -> ([(rgb, frame_meta), ...], file_meta).

    Frames are returned raw (each with its own left/top/width/height
    in ``frame_meta``) without inter-frame compositing — the
    frame-sampling stage treats them independently."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(buf) < 13:
        raise ValueError("GIF: truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        if len(buf) < pos + 3 * n:
            raise ValueError("GIF: truncated global colour table")
        gct = np.frombuffer(buf[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    meta: dict = {"screen_width": sw, "screen_height": sh,
                  "version": buf[3:6].decode("ascii")}
    transparent: int | None = None
    frames = []
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("GIF: truncated extension block")
            label = buf[pos]
            pos += 1
            payload, pos = _read_sub_blocks(buf, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags, _delay_lo, _delay_hi, tidx = payload[:4]
                transparent = tidx if (flags & 0x01) else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if len(buf) < pos + 9:
            raise ValueError("GIF: truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", buf[pos:pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            if len(buf) < pos + 3 * n:
                raise ValueError("GIF: truncated local colour table")
            table = np.frombuffer(buf[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pos >= len(buf):
            raise ValueError("GIF: truncated image data")
        if table is None:
            raise ValueError("GIF: image without any colour table")
        mcs = buf[pos]
        pos += 1
        data, pos = _read_sub_blocks(buf, pos)
        idx = _lzw_decompress(data, mcs, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: delivered rows -> natural rows
            natural = np.empty_like(idx)
            natural[_deinterlace_rows(h)] = idx
            idx = natural
        if idx.size and int(idx.max()) >= len(table):
            raise ValueError("GIF: pixel index outside colour table")
        rgb = table[idx]
        fmeta = {"left": left, "top": top, "width": w, "height": h,
                 "interlaced": bool(ipacked & 0x40),
                 "transparent": transparent}
        transparent = None  # GCE applies to the next image only
        frames.append((rgb, fmeta))
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames, meta
