"""Pure-Python baseline JPEG codec (numpy) — the dominant web-image
format, for the multimodal binary-column stages.

Implements the published ITU-T T.81 / ISO 10918-1 baseline process:
marker segments (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), 8x8 forward/inverse
DCT (orthonormal matrix form of the Annex A equations), quantization
with tables carried in DQT, zigzag ordering, differential DC +
run-length AC coefficient coding, canonical Huffman entropy coding
with code tables carried in DHT (the decoder builds its tables from
the file, as the spec requires — it decodes ANY baseline Huffman
tables, not just the ones this encoder writes), 0xFF byte stuffing,
grayscale and YCbCr interleaved scans with 4:4:4 and 4:2:0 chroma
subsampling, and BT.601 colour conversion.

The encoder writes tables chosen for clarity over compression (flat
uniform-length Huffman codes — valid canonical tables any conforming
decoder accepts); with a DC quantizer of 8, flat 8x8 blocks survive
the DCT -> quantize -> dequantize -> IDCT pipeline BIT-EXACTLY
(S00 = 8*(v-128) for a flat block of value v), which is what the
closed-form fixture oracle leans on. The reference reaches JPEG
through GeoTools/ImageIO (``extensions/adapters/raster/...``); this
module plays that role beside ``sources/{png,gif,bmp}.py``. Entropy
decode is inherently sequential per stream; parallelism comes from
the actor pool batching many images per actor.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

# orthonormal DCT-II basis: T[u, x] = C_u/2 * cos((2x+1) u pi / 16);
# FDCT S = T X T', IDCT X = T' S T (T.81 Annex A.3.3 in matrix form)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# zigzag scan order (T.81 figure 5): zigzag position -> (row, col)
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        order.extend(diag if s % 2 else diag[::-1])
    rc = np.asarray(order)
    return rc[:, 0] * 8 + rc[:, 1]


_ZZ = _zigzag_order()          # natural index for each zigzag position
_ZZ_INV = np.argsort(_ZZ)      # zigzag position for each natural index

# default quantization tables: DC quantizer 8 (exact flat blocks),
# AC quantizers grow with zigzag position — written into DQT, so any
# table works; these are this encoder's defaults, not Annex K's.
_Q_LUMA = np.empty(64, np.uint8)
_Q_LUMA[0] = 8
_Q_LUMA[1:] = np.minimum(16 + np.arange(63) // 4, 255)
_Q_CHROMA = np.empty(64, np.uint8)
_Q_CHROMA[0] = 8
_Q_CHROMA[1:] = np.minimum(20 + np.arange(63) // 3, 255)


def _flat_huffman(symbols: list[int]) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL for a canonical table giving every symbol the same
    code length L = ceil(log2(N+1)) — Kraft sum N/2^L < 1, so the
    all-ones code stays unused as T.81 requires."""
    n = len(symbols)
    length = max(2, (n + 1 - 1).bit_length())
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): symbol ->
    (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    """MSB-first bit packing with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reading over an entropy-coded segment.

    The whole segment is unstuffed ONCE up front (0xFF00 -> 0xFF,
    stop at the next real marker) into a flat byte buffer padded with
    1-bits, so per-bit work is plain integer arithmetic — the shape a
    hot decode loop needs."""

    def __init__(self, buf: bytes, pos: int):
        out = bytearray()
        n = len(buf)
        while pos < n:
            b = buf[pos]
            if b == 0xFF:
                nxt = buf[pos + 1] if pos + 1 < n else 0xD9
                if nxt == 0x00:
                    out.append(0xFF)
                    pos += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    raise ValueError(
                        "JPEG: restart markers inside scan are not "
                        "supported")
                break
            out.append(b)
            pos += 1
        self.n_real_bits = 8 * len(out)
        out += b"\xff\xff\xff\xff"  # virtual 1-padding (B.1.1.5 fill bits)
        self.data = bytes(out)
        self.bitpos = 0

    def peek16(self) -> int:
        i = self.bitpos >> 3
        window = int.from_bytes(self.data[i:i + 3], "big")
        return (window >> (8 - (self.bitpos & 7))) & 0xFFFF

    def skip(self, n: int) -> None:
        self.bitpos += n
        if self.bitpos > self.n_real_bits + 7:
            raise ValueError("JPEG: truncated entropy-coded segment")

    def take(self, n: int) -> int:
        v = self.peek16() >> (16 - n)
        self.skip(n)
        return v


class _HuffLookup:
    """Table-driven canonical-Huffman decode: peek ``maxlen`` bits,
    one array lookup -> (symbol, code length)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.maxlen = max((i + 1 for i in range(16) if bits[i]), default=1)
        size = 1 << self.maxlen
        # plain Python lists: the per-symbol lookup is the hot loop,
        # and list indexing beats numpy scalar reads ~10x there
        self.syms = [0] * size
        self.lens = [0] * size
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if length > self.maxlen:
                    raise ValueError("JPEG: DHT code longer than declared")
                lo = code << (self.maxlen - length)
                hi = lo + (1 << (self.maxlen - length))
                for j in range(lo, hi):
                    self.syms[j] = vals[k]
                    self.lens[j] = length
                code += 1
                k += 1
            code <<= 1


def _decode_symbol(r: _BitReader, table: _HuffLookup) -> int:
    idx = r.peek16() >> (16 - table.maxlen)
    ln = table.lens[idx]
    if ln == 0:
        raise ValueError("JPEG: invalid Huffman code in scan")
    r.skip(ln)
    return table.syms[idx]


def _extend(v: int, t: int) -> int:
    """Magnitude-category decode (T.81 F.2.2.1 EXTEND)."""
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ------------------------------------------------------------- encode


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane -> (nblocks, 64) int32 zigzagged quantized
    coefficients; whole-plane vectorized (blocks stacked, one einsum)."""
    h, w = plane.shape
    x = plane.astype(np.float64).reshape(h // 8, 8, w // 8, 8)
    x = x.transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    s = np.einsum("ux,bxy,vy->buv", _T, x, _T)
    # q is zigzag-ordered (as stored in DQT); q[_ZZ_INV] lays it out in
    # natural (row-major) coefficient order for the division
    q_nat = q[_ZZ_INV].astype(np.float64)
    coef = np.round(s.reshape(-1, 64) / q_nat[np.newaxis, :]).astype(np.int32)
    # reorder natural -> zigzag
    return coef[:, _ZZ]


def _encode_blocks(
    wtr: _BitWriter,
    blocks: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code zigzagged blocks (differential DC, RLE AC)."""
    for blk in blocks:
        dc = int(blk[0])
        diff = dc - pred
        pred = dc
        t = _category(diff)
        code, ln = dc_codes[t]
        wtr.put(code, ln)
        if t:
            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                wtr.put(code, ln)
                run -= 16
            t = _category(v)
            code, ln = ac_codes[(run << 4) | t]
            wtr.put(code, ln)
            wtr.put(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]
            wtr.put(code, ln)
    return pred


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def encode(
    img: np.ndarray,
    subsampling: str = "4:2:0",
    quant: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """uint8 image -> baseline JPEG bytes.

    ``(H, W)`` grey -> single-component scan; ``(H, W, 3)`` RGB ->
    YCbCr with ``subsampling`` '4:4:4' or '4:2:0'. ``quant``
    optionally overrides the (luma, chroma) zigzag-ordered
    quantization tables (uint8[64], written into DQT)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode expects uint8 samples")
    qy = (_Q_LUMA if quant is None else np.asarray(quant[0], np.uint8))
    qc = (_Q_CHROMA if quant is None else np.asarray(quant[1], np.uint8))
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (H, W) grey or (H, W, 3) RGB")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = img.shape[:2]

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF v1.1, no thumbnail
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    # DQT (two tables; table 1 unused for grey but harmless)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65 * 2) \
        + bytes([0x00]) + qy.tobytes() + bytes([0x01]) + qc.tobytes()
    # SOF0
    if gray:
        comps = [(1, 0x11, 0)]
    elif subsampling == "4:4:4":
        comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w,
                                     len(comps))
    for cid, samp, tq in comps:
        out += bytes([cid, samp, tq])
    # DHT: DC and AC tables for class 0 (luma) and 1 (chroma)
    dc_bits, dc_vals = _flat_huffman(_DC_SYMBOLS)
    ac_bits, ac_vals = _flat_huffman(_AC_SYMBOLS)
    for tc, tbl in ((0x00, (dc_bits, dc_vals)), (0x10, (ac_bits, ac_vals)),
                    (0x01, (dc_bits, dc_vals)), (0x11, (ac_bits, ac_vals))):
        bits, vals = tbl
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out += bytes([tc]) + bytes(bits) + bytes(vals)
    dc_codes = _build_codes(dc_bits, dc_vals)
    ac_codes = _build_codes(ac_bits, ac_vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _samp, tq in comps:
        # DC/AC table selectors follow the quant-table class (0=luma)
        out += bytes([cid, (tq << 4) | tq])
    out += bytes([0, 63, 0])

    wtr = _BitWriter()
    if gray:
        plane = _pad_to(img, 8)
        blocks = _fdct_quant(plane, qy)
        _encode_blocks(wtr, blocks, 0, dc_codes, ac_codes)
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsampling == "4:4:4":
            planes = [_pad_to(p, 8) for p in (y, cb, cr)]
            coefs = [
                _fdct_quant(planes[0], qy),
                _fdct_quant(planes[1], qc),
                _fdct_quant(planes[2], qc),
            ]
            bw = planes[0].shape[1] // 8
            preds = [0, 0, 0]
            n_mcu = coefs[0].shape[0]
            for m in range(n_mcu):
                for ci in range(3):
                    preds[ci] = _encode_blocks(
                        wtr, coefs[ci][m:m + 1], preds[ci], dc_codes, ac_codes
                    )
        else:
            yp = _pad_to(y, 16)
            # box 2x2 chroma downsample on the padded-to-16 planes
            cbp = _pad_to(cb, 16).astype(np.float64)
            crp = _pad_to(cr, 16).astype(np.float64)
            ds = lambda p: np.clip(np.round(  # noqa: E731
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                 + p[1::2, 1::2]) / 4.0), 0, 255).astype(np.uint8)
            cbs, crs = ds(cbp), ds(crp)
            cy = _fdct_quant(yp, qy)
            ccb = _fdct_quant(cbs, qc)
            ccr = _fdct_quant(crs, qc)
            bh, bw = yp.shape[0] // 8, yp.shape[1] // 8
            mh, mw = bh // 2, bw // 2
            preds = [0, 0, 0]
            for my in range(mh):
                for mx in range(mw):
                    # 4 Y blocks in 2x2 raster order, then Cb, Cr
                    for dy in range(2):
                        for dx in range(2):
                            bi = (my * 2 + dy) * bw + (mx * 2 + dx)
                            preds[0] = _encode_blocks(
                                wtr, cy[bi:bi + 1], preds[0], dc_codes,
                                ac_codes)
                    ci = my * mw + mx
                    preds[1] = _encode_blocks(wtr, ccb[ci:ci + 1], preds[1],
                                              dc_codes, ac_codes)
                    preds[2] = _encode_blocks(wtr, ccr[ci:ci + 1], preds[2],
                                              dc_codes, ac_codes)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decode


def _idct_dequant(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nblocks, 64) zigzag int32 -> (nblocks, 8, 8) uint8 samples."""
    nat = np.zeros_like(blocks)
    nat[:, _ZZ] = blocks
    # q is zigzag-ordered (DQT storage); q[_ZZ_INV] is its natural
    # (row-major) layout, matching nat — the same reorder the encoder
    # applies before dividing
    q_nat = q[_ZZ_INV].astype(np.int64)
    s = (nat * q_nat[np.newaxis, :]).astype(np.float64).reshape(-1, 8, 8)
    x = np.einsum("xu,buv,yv->bxy", _T.T, s, _T.T)
    return np.clip(np.round(x + 128.0), 0, 255).astype(np.uint8)


def decode(buf: bytes) -> tuple[np.ndarray, dict]:
    """Baseline JPEG bytes -> (uint8 array, meta dict).

    Grey scans -> (H, W); colour -> (H, W, 3) RGB via BT.601.
    Supports 4:4:4 and 4:2:0 interleaved scans, arbitrary baseline
    DQT/DHT tables read from the file; progressive / arithmetic /
    restart-interval streams are rejected with a clear error."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, _HuffLookup] = {}
    sof = None
    scan_comps = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        if pos + 2 > len(buf):
            raise ValueError("JPEG: truncated marker")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(buf):
            raise ValueError("JPEG: truncated segment length")
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2:pos + seglen]
        end = pos + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    qtabs[tq] = np.frombuffer(
                        seg[p:p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    qtabs[tq] = np.frombuffer(
                        seg[p:p + 64], np.uint8).astype(np.int64)
                    p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tcth = seg[p]
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                htabs[tcth] = _HuffLookup(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise ValueError("JPEG: truncated SOF segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "hx": samp >> 4, "vx": samp & 0x0F,
                              "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: unsupported SOF marker 0xFF{marker:02X} "
                "(baseline sequential only)")
        elif marker == 0xDD:  # DRI
            if struct.unpack_from(">H", seg, 0)[0] != 0:
                raise ValueError("JPEG: restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"id": cid, "td": tdta >> 4,
                                   "ta": tdta & 0x0F})
            pos = end
            break
        pos = end
    if sof is None or scan_comps is None:
        raise ValueError("JPEG: missing SOF/SOS")

    comps = sof["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["hx"] for c in comps)
    vmax = max(c["vx"] for c in comps)
    h, w = sof["h"], sof["w"]
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcw = (w + mcu_w - 1) // mcu_w
    mch = (h + mcu_h - 1) // mcu_h
    rdr = _BitReader(buf, pos)
    # per-component coefficient buffers (zigzag blocks)
    bufs = {}
    for c in comps:
        nb = (mcw * c["hx"]) * (mch * c["vx"])
        bufs[c["id"]] = np.zeros((nb, 64), np.int32)
    preds = {c["id"]: 0 for c in comps}
    for my in range(mch):
        for mx in range(mcw):
            for sc in scan_comps:
                c = by_id[sc["id"]]
                dct = htabs.get(sc["td"])
                act = htabs.get(0x10 | sc["ta"])
                if dct is None or act is None:
                    raise ValueError("JPEG: scan references missing DHT")
                bw = mcw * c["hx"]
                for dy in range(c["vx"]):
                    for dx in range(c["hx"]):
                        # plain-int list block (numpy scalar writes
                        # would dominate the entropy loop)
                        blk = [0] * 64
                        t = _decode_symbol(rdr, dct)
                        diff = _extend(rdr.take(t), t) if t else 0
                        preds[c["id"]] += diff
                        blk[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(rdr, act)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            t = rs & 0x0F
                            if k > 63:
                                raise ValueError("JPEG: AC index overrun")
                            blk[k] = _extend(rdr.take(t), t)
                            k += 1
                        bi = (my * c["vx"] + dy) * bw + (mx * c["hx"] + dx)
                        bufs[c["id"]][bi] = blk
    # reconstruct planes
    planes = {}
    for c in comps:
        q = qtabs.get(c["tq"])
        if q is None:
            raise ValueError("JPEG: component references missing DQT")
        px = _idct_dequant(bufs[c["id"]], q)
        bw = mcw * c["hx"]
        bh = mch * c["vx"]
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw * 8
        )
        # upsample subsampled components to full MCU resolution
        ry, rx = vmax // c["vx"], hmax // c["hx"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes[c["id"]] = plane[:h, :w]
    meta = {"width": w, "height": h, "components": len(comps),
            "sampling": f"{comps[0]['hx']}x{comps[0]['vx']}"}
    if len(comps) == 1:
        return planes[comps[0]["id"]], meta
    if len(comps) != 3:
        raise ValueError("JPEG: only 1- or 3-component images supported")
    y = planes[comps[0]["id"]].astype(np.float64)
    cb = planes[comps[1]["id"]].astype(np.float64) - 128.0
    cr = planes[comps[2]["id"]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), meta
