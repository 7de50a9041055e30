"""TWKB (Tiny Well-Known Binary) codec — the reference's compact
geometry serialization (``core/geotime/src/main/java/org/locationtech/
geowave/core/geotime/util/TWKBWriter.java`` / ``TWKBReader.java``),
re-implemented from the PUBLIC TWKB specification
(github.com/TWKB/Specification):

- byte 0: ``(zigzag(precision) << 4) | geometry_type``
  (type 1=Point, 2=LineString, 3=Polygon)
- byte 1: metadata header (bbox/size/idlist/extended-dims/empty flags
  — this writer emits 0: no optional blocks, matching the reference's
  default writer path)
- body: coordinates scaled by ``10**precision``, rounded to int, then
  delta-chained per dimension and written as zigzag varints
  (LSB-first 7-bit groups, MSB = continuation). Polygon rings do NOT
  repeat the first point at the end (spec §polygon); LineStrings carry
  an npoints varint; Polygons an nrings varint then per-ring npoints.

Rounding is ``floor(v * 10**p + 0.5)`` (round-half-up) — chosen over
banker's rounding because it is exactly replicable in the DuckDB
oracle as ``FLOOR(v * 1e5 + 0.5)``.

The POINT path (the hot one — every page row in an export) is fully
vectorized: numpy builds all varint byte groups in one pass and the
result is assembled zero-copy into a pyarrow BinaryArray. LineString/
Polygon encode/decode are per-geometry (export-path only; region sets
are the small side everywhere in this engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MAXV = 10  # max varint bytes for a uint64


def _zigzag(n: np.ndarray) -> np.ndarray:
    n = n.astype(np.int64, copy=False)
    return ((n << 1) ^ (n >> 63)).view(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -(u & np.uint64(1)).view(np.int64)


def _varint_groups(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All 7-bit groups (n, 10) with continuation bits set, plus the
    per-value byte length. Vectorized over the whole array."""
    n = len(u)
    groups = np.empty((n, _MAXV), np.uint8)
    tmp = u.astype(np.uint64, copy=True)
    for k in range(_MAXV):
        groups[:, k] = (tmp & np.uint64(0x7F)).astype(np.uint8)
        tmp >>= np.uint64(7)
    nz = groups != 0
    hi = np.where(nz.any(axis=1), (_MAXV - 1) - np.argmax(nz[:, ::-1], axis=1), 0)
    lens = hi + 1
    cont = np.arange(_MAXV)[None, :] < hi[:, None]
    np.bitwise_or(groups, np.uint8(0x80), out=groups, where=cont)
    return groups, lens.astype(np.int64)


def _varint_parse(data: np.ndarray, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Parse one varint per cursor position; returns (uint64 values,
    advanced positions). Vectorized: loops over byte INDEX (≤10), not
    over geometries."""
    m = len(pos)
    val = np.zeros(m, np.uint64)
    cur = pos.astype(np.int64, copy=True)
    active = np.arange(m)
    shift = np.uint64(0)
    while len(active):
        b = data[cur[active]]
        val[active] |= (b & np.uint8(0x7F)).astype(np.uint64) << shift
        cur[active] += 1
        active = active[b >= 0x80]
        shift += np.uint64(7)
    return val, cur


def _scale_round(v: np.ndarray, precision: int) -> np.ndarray:
    return np.floor(np.asarray(v, np.float64) * (10.0 ** precision) + 0.5).astype(
        np.int64
    )


def _header(gtype: int, precision: int) -> tuple[int, int]:
    zp = (precision << 1) if precision >= 0 else ((-precision << 1) - 1)
    return (zp << 4) | gtype, 0x00


def encode_point_column(
    lon: np.ndarray, lat: np.ndarray, precision: int = 5
) -> pa.BinaryArray:
    """Vectorized TWKB POINT encode of parallel coordinate arrays."""
    n = len(lon)
    tp, meta = _header(1, precision)
    xg, xl = _varint_groups(_zigzag(_scale_round(lon, precision)))
    yg, yl = _varint_groups(_zigzag(_scale_round(lat, precision)))
    width = 2 + _MAXV * 2
    out = np.zeros((n, width), np.uint8)
    out[:, 0] = tp
    out[:, 1] = meta
    r, c = np.nonzero(np.arange(_MAXV)[None, :] < xl[:, None])
    out[r, 2 + c] = xg[r, c]
    r, c = np.nonzero(np.arange(_MAXV)[None, :] < yl[:, None])
    out[r, 2 + xl[r] + c] = yg[r, c]
    total = 2 + xl + yl
    flat = out[np.arange(width)[None, :] < total[:, None]]
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(total, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(flat)]
    )


def decode_point_column(
    arr: pa.BinaryArray, precision: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized TWKB POINT decode -> (lon, lat) float64 arrays. The
    precision is read from each header (``precision`` arg just
    validates when given)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    offsets = np.frombuffer(arr.buffers()[1], np.int32, len(arr) + 1, arr.offset * 4)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    head = data[offsets[:-1]]
    if not (head & 0x0F == 1).all():
        raise ValueError("not all TWKB POINTs")
    zp = (head >> 4).astype(np.int64)
    prec = _unzigzag(zp.astype(np.uint64)).astype(np.float64)
    if precision is not None and not (prec == precision).all():
        raise ValueError("precision mismatch")
    scale = 10.0 ** prec
    ux, pos = _varint_parse(data, offsets[:-1] + 2)
    uy, _ = _varint_parse(data, pos)
    return _unzigzag(ux) / scale, _unzigzag(uy) / scale


def _encode_coords(buf: bytearray, ints_x, ints_y, prev):
    px, py = prev
    for x, y in zip(ints_x, ints_y):
        for d in (int(x) - px, int(y) - py):
            u = (d << 1) ^ (d >> 63)
            while True:
                b = u & 0x7F
                u >>= 7
                if u:
                    buf.append(b | 0x80)
                else:
                    buf.append(b)
                    break
        px, py = int(x), int(y)
    return px, py


def _append_varint(buf: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            break


def encode_linestring(coords: np.ndarray, precision: int = 5) -> bytes:
    """TWKB LINESTRING from an (n,2) coordinate array."""
    tp, meta = _header(2, precision)
    buf = bytearray((tp, meta))
    ix = _scale_round(coords[:, 0], precision)
    iy = _scale_round(coords[:, 1], precision)
    _append_varint(buf, len(ix))
    _encode_coords(buf, ix, iy, (0, 0))
    return bytes(buf)


def encode_polygon(rings: list[np.ndarray], precision: int = 5) -> bytes:
    """TWKB POLYGON from a list of (n,2) rings (closed or open input;
    the closing point is stripped per spec — rings are implicit)."""
    tp, meta = _header(3, precision)
    buf = bytearray((tp, meta))
    _append_varint(buf, len(rings))
    prev = (0, 0)
    for ring in rings:
        r = np.asarray(ring, np.float64)
        if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
            r = r[:-1]
        ix = _scale_round(r[:, 0], precision)
        iy = _scale_round(r[:, 1], precision)
        _append_varint(buf, len(ix))
        prev = _encode_coords(buf, ix, iy, prev)
    return bytes(buf)


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    v, s = 0, 0
    while True:
        c = b[i]
        i += 1
        v |= (c & 0x7F) << s
        if c < 0x80:
            return v, i
        s += 7


def _unzig1(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def decode_geometry(b: bytes):
    """Decode any supported TWKB geometry -> ("point", (x, y)) |
    ("linestring", (n,2) array) | ("polygon", [rings...], closed)."""
    gtype = b[0] & 0x0F
    prec = _unzig1(b[0] >> 4)
    scale = 10.0 ** prec
    i = 2

    def coords(n, i, prev):
        out = np.empty((n, 2), np.float64)
        px, py = prev
        for k in range(n):
            u, i = _read_varint(b, i)
            px += _unzig1(u)
            u, i = _read_varint(b, i)
            py += _unzig1(u)
            out[k, 0] = px / scale
            out[k, 1] = py / scale
        return out, i, (px, py)

    if gtype == 1:
        c, i, _ = coords(1, i, (0, 0))
        return "point", (c[0, 0], c[0, 1])
    if gtype == 2:
        n, i = _read_varint(b, i)
        c, i, _ = coords(n, i, (0, 0))
        return "linestring", c
    if gtype == 3:
        nr, i = _read_varint(b, i)
        rings, prev = [], (0, 0)
        for _ in range(nr):
            n, i = _read_varint(b, i)
            c, i, prev = coords(n, i, prev)
            rings.append(np.vstack([c, c[:1]]))  # re-close
        return "polygon", rings
    raise ValueError(f"unsupported TWKB type {gtype}")
