"""TWKB (Tiny Well-Known Binary) codec.

:func:`encode` / :func:`decode` implement the published TWKB
specification (github.com/TWKB/Specification — what PostGIS
``ST_AsTWKB`` writes): optional bbox / size / idlist blocks, polygon
rings OPEN (closing point omitted), and ONE delta chain carried across
rings and multi-parts. These bytes are spec-compliant but NOT
byte-compatible with the reference's ``TWKBWriter``/``TWKBReader``
(``core/geotime/.../util/TWKBWriter.java``), which deviates from the
spec: it never writes bbox/size/idlist, writes polygon rings CLOSED
(the varint count includes the repeated closing point), resets the
delta chain per point array (``lastX = lastY = 0`` at the top of
``writePointArray``), auto-computes precision from the coordinates'
decimal scale, and — for plain 2-D geometries — sets the
extended-dimensions metadata bit and emits a zero extended-precision
byte (``TWKBWriter.java:60-66``: the NaN check takes the extended path
when Z/M are ABSENT). :func:`encode_compat` / :func:`decode_compat`
reproduce that reference wire format exactly for 2-D geometries.

Layout (per spec):
  type_and_precision byte : low nibble geometry type (1..6 here),
                            high nibble zigzag-encoded precision
  metadata byte           : bit0 bbox, bit1 size, bit2 idlist,
                            bit3 extended dims (unsupported here),
                            bit4 empty
  [size varint]           : bytes REMAINING after the size field
  [bbox]                  : per dim, zigzag varint (min, delta)
  body                    : counts as plain varints; coordinates as
                            zigzag varint DELTAS of the quantized
                            ints, the running previous value carrying
                            across rings and multi-parts

Quantization is half-up — ``floor(v * 10^precision + 0.5)`` — chosen
(spec leaves the rounding mode to the writer) because it is exactly
replicable in SQL, which the ``twkb_roundtrip`` oracle relies on.
Polygon rings are written OPEN (closing point omitted, as PostGIS
writes them) and re-closed on decode.

Geometry values use the repo-internal representation from
:mod:`geowave_ray.formats` (("Polygon", [rings]), …).
"""

from __future__ import annotations

import numpy as np

from .util import decode_boundary
import pyarrow as pa

from .formats import wkb_decode, wkb_encode

_TYPE_CODES = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
}
_TYPE_NAMES = {v: k for k, v in _TYPE_CODES.items()}


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        b = buf[off]
        off += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, off
        shift += 7


def quantize(v: np.ndarray | float, precision: int) -> np.ndarray:
    """Half-up quantization to 10^precision units (SQL-replicable:
    ``CAST(floor(v * 10^p + 0.5) AS BIGINT)``)."""
    scale = 10.0 ** precision
    return np.floor(np.asarray(v, dtype=np.float64) * scale + 0.5).astype(np.int64)


class _Writer:
    def __init__(self, precision: int):
        self.precision = precision
        self.prev = [0, 0]
        self.body = bytearray()
        self.qx: list[int] = []
        self.qy: list[int] = []

    def count(self, n: int) -> None:
        self.body += _varint(n)

    def coords(self, pts: np.ndarray) -> None:
        q = quantize(pts, self.precision)
        for x, y in q:
            self.body += _varint(_zigzag(int(x) - self.prev[0]))
            self.body += _varint(_zigzag(int(y) - self.prev[1]))
            self.prev = [int(x), int(y)]
            self.qx.append(int(x))
            self.qy.append(int(y))


def _open_ring(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and r[0][0] == r[-1][0] and r[0][1] == r[-1][1]:
        return r[:-1]
    return r


def encode(
    geom,
    precision: int = 5,
    with_size: bool = False,
    with_bbox: bool = False,
    ids: list[int] | None = None,
) -> bytes:
    """Encode an internal geometry value to spec-TWKB bytes. ``ids``
    (multi-geometries only) writes the optional per-part id list."""
    t, c = geom
    code = _TYPE_CODES[t]
    if not -8 <= precision <= 7:
        raise ValueError(f"TWKB precision {precision} outside [-8, 7] "
                         "(the header nibble cannot represent it)")
    if ids is not None and code < 4:
        raise ValueError(f"idlist is only valid for Multi* types, not {t}")
    header = bytes([(code & 0x0F) | ((_zigzag(precision) & 0x0F) << 4)])
    empty = c is None or (hasattr(c, "__len__") and len(c) == 0)
    meta = (
        (0x01 if with_bbox and not empty else 0)
        | (0x02 if with_size else 0)
        | (0x04 if ids is not None else 0)
        | (0x10 if empty else 0)
    )
    if empty:
        out = header + bytes([meta])
        if with_size:
            return header + bytes([meta]) + _varint(0)
        return out

    w = _Writer(precision)
    if t == "Point":
        w.coords(np.asarray(c, dtype=np.float64).reshape(1, 2))
    elif t in ("LineString", "MultiPoint"):
        arr = np.asarray(c, dtype=np.float64).reshape(-1, 2)
        w.count(len(arr))
        if t == "MultiPoint" and ids is not None:
            _write_ids(w, ids, len(arr))
        w.coords(arr)
    elif t == "Polygon":
        w.count(len(c))
        for ring in c:
            r = _open_ring(ring)
            w.count(len(r))
            w.coords(r)
    elif t == "MultiLineString":
        w.count(len(c))
        if ids is not None:
            _write_ids(w, ids, len(c))
        for line in c:
            arr = np.asarray(line, dtype=np.float64).reshape(-1, 2)
            w.count(len(arr))
            w.coords(arr)
    elif t == "MultiPolygon":
        w.count(len(c))
        if ids is not None:
            _write_ids(w, ids, len(c))
        for rings in c:
            w.count(len(rings))
            for ring in rings:
                r = _open_ring(ring)
                w.count(len(r))
                w.coords(r)
    else:  # pragma: no cover
        raise ValueError(t)

    pre = bytearray()
    if with_bbox:
        for arr in (w.qx, w.qy):
            lo, hi = min(arr), max(arr)
            pre += _varint(_zigzag(lo))
            pre += _varint(_zigzag(hi - lo))
    payload = bytes(pre) + bytes(w.body)
    if with_size:
        return header + bytes([meta]) + _varint(len(payload)) + payload
    return header + bytes([meta]) + payload


def _write_ids(w: _Writer, ids: list[int], n: int) -> None:
    if len(ids) != n:
        raise ValueError(f"idlist length {len(ids)} != part count {n}")
    for i in ids:
        w.body += _varint(_zigzag(int(i)))


class _Reader:
    def __init__(self, buf: bytes, off: int, precision: int):
        self.buf = buf
        self.off = off
        self.scale = 10.0 ** -precision
        self.prev = [0, 0]

    def count(self) -> int:
        u, self.off = _read_varint(self.buf, self.off)
        return u

    def coords(self, n: int) -> np.ndarray:
        out = np.empty((n, 2), dtype=np.float64)
        for i in range(n):
            for d in range(2):
                u, self.off = _read_varint(self.buf, self.off)
                self.prev[d] += _unzigzag(u)
                out[i, d] = self.prev[d] * self.scale
        return out


@decode_boundary("TWKB")
def decode(buf: bytes, return_meta: bool = False):
    """Decode TWKB bytes -> internal geometry value (rings re-closed).
    With ``return_meta``, also returns a dict with precision, flags,
    bbox (dequantized) and the id list."""
    tp = buf[0]
    t = _TYPE_NAMES.get(tp & 0x0F)
    if t is None:
        raise ValueError(f"unsupported TWKB type {tp & 0x0F}")
    precision = _unzigzag(tp >> 4)
    meta = buf[1]
    off = 2
    info: dict = {"precision": precision, "ids": None, "bbox": None,
                  "size": None, "empty": bool(meta & 0x10)}
    if meta & 0x08:
        raise ValueError("extended (Z/M) TWKB dimensions not supported")
    if meta & 0x02:
        info["size"], off = _read_varint(buf, off)
    if info["empty"]:
        empty = {
            "Point": ("Point", None),
            "LineString": ("LineString", np.zeros((0, 2))),
            "Polygon": ("Polygon", []),
            "MultiPoint": ("MultiPoint", np.zeros((0, 2))),
            "MultiLineString": ("MultiLineString", []),
            "MultiPolygon": ("MultiPolygon", []),
        }[t]
        return (empty, info) if return_meta else empty
    scale = 10.0 ** -precision
    if meta & 0x01:
        box = []
        for _ in range(2):
            u, off = _read_varint(buf, off)
            lo = _unzigzag(u)
            u, off = _read_varint(buf, off)
            box.append((lo * scale, (lo + _unzigzag(u)) * scale))
        info["bbox"] = (box[0][0], box[1][0], box[0][1], box[1][1])
    r = _Reader(buf, off, precision)

    def read_ids(n: int) -> None:
        if meta & 0x04:
            ids = []
            for _ in range(n):
                u, r.off = _read_varint(r.buf, r.off)
                ids.append(_unzigzag(u))
            info["ids"] = ids

    if t == "Point":
        g = ("Point", r.coords(1)[0])
    elif t == "LineString":
        g = ("LineString", r.coords(r.count()))
    elif t == "Polygon":
        rings = []
        for _ in range(r.count()):
            ring = r.coords(r.count())
            rings.append(np.vstack([ring, ring[:1]]))
        g = ("Polygon", rings)
    elif t == "MultiPoint":
        n = r.count()
        read_ids(n)
        g = ("MultiPoint", r.coords(n))
    elif t == "MultiLineString":
        n = r.count()
        read_ids(n)
        g = ("MultiLineString", [r.coords(r.count()) for _ in range(n)])
    else:  # MultiPolygon
        n = r.count()
        read_ids(n)
        polys = []
        for _ in range(n):
            rings = []
            for _ in range(r.count()):
                ring = r.coords(r.count())
                rings.append(np.vstack([ring, ring[:1]]))
            polys.append(rings)
        g = ("MultiPolygon", polys)
    return (g, info) if return_meta else g


# ---------------------------------------------------------------------------
# reference-compatible wire format (TWKBWriter.java / TWKBReader.java)
# ---------------------------------------------------------------------------


def _java_scale(v: float) -> int:
    """``new BigDecimal(Double.toString(v)).stripTrailingZeros().scale()``
    — the decimal scale of the shortest-roundtrip representation
    (value-determined after stripTrailingZeros, so Python's shortest
    repr gives the same answer as Java's Double.toString)."""
    from decimal import Decimal

    return -int(Decimal(repr(float(v))).normalize().as_tuple().exponent)


def _closed_ring(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) == 0 or (r[0][0] == r[-1][0] and r[0][1] == r[-1][1]):
        return r
    return np.vstack([r, r[:1]])


def _compat_all_coords(t: str, c) -> list[np.ndarray]:
    if t == "Point":
        return [np.asarray(c, dtype=np.float64).reshape(-1, 2)]
    if t in ("LineString", "MultiPoint"):
        return [np.asarray(c, dtype=np.float64).reshape(-1, 2)]
    if t == "Polygon":
        return [_closed_ring(r) for r in c]
    if t == "MultiLineString":
        return [np.asarray(l, dtype=np.float64).reshape(-1, 2) for l in c]
    # MultiPolygon
    return [_closed_ring(r) for rings in c for r in rings]


def encode_compat(geom, max_precision: int = 7) -> bytes:
    """Encode to the reference's actual TWKB dialect
    (``TWKBWriter.java``): precision auto-computed from the
    coordinates' decimal scale (capped at ``max_precision``,
    ``PrecisionWriter.calculate``), NO bbox/size/idlist, the
    extended-dimensions metadata bit SET with a zero
    extended-precision byte for 2-D input (``TWKBWriter.java:60-66``),
    polygon rings CLOSED with the count including the repeated closing
    point, and the delta chain reset per point array
    (``writePointArray`` starts at lastX=lastY=0)."""
    t, c = geom
    code = _TYPE_CODES[t]
    empty = c is None or (hasattr(c, "__len__") and len(c) == 0)
    if empty:
        return bytes([code & 0x0F, 0x10])
    arrays = _compat_all_coords(t, c)
    p = -8
    for arr in arrays:
        for v in arr.ravel():
            p = max(p, _java_scale(v))
    p = min(p, max_precision)
    out = bytearray([(code & 0x0F) | ((_zigzag(p) & 0x0F) << 4), 0x08, 0x00])
    mult = 10.0 ** p

    def q(v: float) -> int:  # Java Math.round = floor(x + 0.5)
        return int(np.floor(v * mult + 0.5))

    def w_array(pts: np.ndarray) -> None:
        out.extend(_varint(len(pts)))
        lx = ly = 0
        for x, y in pts:
            qx, qy = q(x), q(y)
            out.extend(_varint(_zigzag(qx - lx)))
            out.extend(_varint(_zigzag(qy - ly)))
            lx, ly = qx, qy

    if t == "Point":
        pt = np.asarray(c, dtype=np.float64).reshape(2)
        out.extend(_varint(_zigzag(q(pt[0]))))
        out.extend(_varint(_zigzag(q(pt[1]))))
    elif t in ("LineString", "MultiPoint"):
        w_array(arrays[0])
    elif t == "Polygon":
        out.extend(_varint(len(arrays)))
        for r in arrays:
            w_array(r)
    elif t == "MultiLineString":
        out.extend(_varint(len(arrays)))
        for l in arrays:
            w_array(l)
    else:  # MultiPolygon
        out.extend(_varint(len(c)))
        for rings in c:
            if len(rings) == 0:
                out.extend(_varint(0))
                continue
            out.extend(_varint(len(rings)))
            for r in rings:
                w_array(_closed_ring(r))
    return bytes(out)


@decode_boundary("TWKB")
def decode_compat(buf: bytes):
    """Decode the reference TWKB dialect (see :func:`encode_compat`).
    Rings arrive closed and stay closed in the internal value."""
    tp = buf[0]
    t = _TYPE_NAMES.get(tp & 0x0F)
    if t is None:
        raise ValueError(f"unsupported TWKB type {tp & 0x0F}")
    precision = _unzigzag(tp >> 4)
    meta = buf[1]
    off = 2
    if meta & 0x10:
        return {
            "Point": ("Point", None),
            "LineString": ("LineString", np.zeros((0, 2))),
            "Polygon": ("Polygon", []),
            "MultiPoint": ("MultiPoint", np.zeros((0, 2))),
            "MultiLineString": ("MultiLineString", []),
            "MultiPolygon": ("MultiPolygon", []),
        }[t]
    if meta & 0x08:
        ext = buf[off]
        off += 1
        if ext & 0x03:
            raise ValueError("Z/M TWKB dimensions not supported")
    scale = 10.0 ** -precision

    def r_varint() -> int:
        nonlocal off
        u, off = _read_varint(buf, off)
        return u

    def r_array() -> np.ndarray:
        n = r_varint()
        out = np.empty((n, 2), dtype=np.float64)
        lx = ly = 0
        for i in range(n):
            lx += _unzigzag(r_varint())
            ly += _unzigzag(r_varint())
            out[i, 0] = lx * scale
            out[i, 1] = ly * scale
        return out

    if t == "Point":
        return ("Point", np.array(
            [_unzigzag(r_varint()) * scale, _unzigzag(r_varint()) * scale]))
    if t in ("LineString", "MultiPoint"):
        return (t, r_array())
    if t == "Polygon":
        return ("Polygon", [r_array() for _ in range(r_varint())])
    if t == "MultiLineString":
        return ("MultiLineString", [r_array() for _ in range(r_varint())])
    polys = []
    for _ in range(r_varint()):
        polys.append([r_array() for _ in range(r_varint())])
    return ("MultiPolygon", polys)


# ---------------------------------------------------------------------------
# vectorized point-column fast path (the 100-TB side is points)
# ---------------------------------------------------------------------------

_MAXV = 10  # max varint bytes for a 64-bit value


def _zigzag_arr(n: np.ndarray) -> np.ndarray:
    n = n.astype(np.int64, copy=False)
    return ((n << 1) ^ (n >> 63)).view(np.uint64)


def _unzigzag_arr(u: np.ndarray) -> np.ndarray:
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


def encode_point_column(
    lon: np.ndarray, lat: np.ndarray, precision: int = 5
) -> pa.Array:
    """Vectorized TWKB POINT encoder: whole-column numpy (no Python
    per-row work) building one contiguous byte buffer + offsets, so a
    ``map_batches`` stage can compact a point store at full batch
    rate. Each value is the standalone 2-byte header + two zigzag
    varints (delta base 0 per value, matching ``encode`` row-wise)."""
    n = len(lon)
    tp = (1 & 0x0F) | ((_zigzag(precision) & 0x0F) << 4)
    xg, xl = _varint_groups(_zigzag_arr(quantize(lon, precision)))
    yg, yl = _varint_groups(_zigzag_arr(quantize(lat, precision)))
    width = 2 + _MAXV * 2
    out = np.zeros((n, width), np.uint8)
    out[:, 0] = tp
    out[:, 1] = 0
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
    prec = _unzigzag_arr(zp.astype(np.uint64)).astype(np.float64)
    if precision is not None and not (prec == precision).all():
        raise ValueError("precision mismatch")
    scale = 10.0 ** prec
    ux, pos = _varint_parse(data, offsets[:-1] + 2)
    uy, _ = _varint_parse(data, pos)
    return _unzigzag_arr(ux) / scale, _unzigzag_arr(uy) / scale


# ---------------------------------------------------------------------------
# map_batches entry points
# ---------------------------------------------------------------------------


def twkb_encode_batch(
    batch: pa.Table,
    col: str = "geometry_wkb",
    precision: int = 5,
    with_size: bool = True,
    with_bbox: bool = True,
    out_col: str = "twkb",
) -> pa.Table:
    """WKB column -> spec-TWKB column (bbox+size blocks on by default,
    as PostGIS-style consumers expect; NOT the reference's dialect —
    use :func:`encode_compat` for reference-readable bytes)."""
    vals = [
        encode(wkb_decode(b.as_py()), precision, with_size=with_size,
               with_bbox=with_bbox)
        for b in batch.column(col)
    ]
    return batch.append_column(out_col, pa.array(vals, pa.binary()))


def twkb_decode_batch(
    batch: pa.Table, col: str = "twkb", out_col: str = "geometry_wkb"
) -> pa.Table:
    vals = [encode_wkb(decode(b.as_py())) for b in batch.column(col)]
    return batch.append_column(out_col, pa.array(vals, pa.binary()))


def encode_wkb(geom) -> bytes:
    return wkb_encode(geom)
