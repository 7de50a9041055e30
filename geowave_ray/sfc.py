"""Space-filling-curve kernels (pure numpy, vectorized).

Capability parity with the reference's ``core/index`` module:

- Z-order (Morton) encode/decode — reference
  ``core/index/.../sfc/zorder/ZOrderSFC.java:54``,
  ``ZOrderUtils.java:97-127``.
- Hilbert encode/decode (Skilling's transpose algorithm, public
  domain spec: J. Skilling, "Programming the Hilbert curve", AIP 2004)
  — reference ``core/index/.../sfc/hilbert/HilbertSFC.java:127,174``.
- Geohash cell ids — reference
  ``core/geotime/.../binning/GeohashBinningHelper.java``.
- Tiered cell assignment with the fit-or-descend rule — reference
  ``core/index/.../sfc/tiered/TieredSFCIndexStrategy.java:345-407``
  (an extent lands on the finest tier where its bbox covers at most
  ``max_duplicates`` cells; points always land on the finest tier).
- Query-range decomposition for bbox constraints — reference
  ``TieredSFCIndexStrategy.getQueryRanges:109-158``.

We define our OWN bit-level spec (golden vectors in
``tests/test_sfc.py``); we match the reference's *semantics*
(tiering, duplicate bounds, range pruning), not its key bytes.

All functions operate on numpy arrays and are safe to call inside
``Dataset.map_batches(batch_format="pyarrow"/"numpy")``.
"""

from __future__ import annotations

import numpy as np

# World bounds for the lon/lat grid (EPSG:4326, like the reference's
# default spatial index — SpatialDimensionalityTypeProvider.java:45-54).
LON_MIN, LON_MAX = -180.0, 180.0
LAT_MIN, LAT_MAX = -90.0, 90.0

#: finest tier (bits per dimension). 2*16=32-bit morton fits uint64
#: comfortably and gives ~600 m cells at the equator; the reference's
#: default is 31 bits/dim but its *join* operates at far coarser tiers.
MAX_TIER = 16


# ---------------------------------------------------------------------------
# normalization: lon/lat -> integer grid coordinates at a tier
# ---------------------------------------------------------------------------

def grid_coords(lon: np.ndarray, lat: np.ndarray, tier: int) -> tuple[np.ndarray, np.ndarray]:
    """Map lon/lat (float64) to integer cell coords in [0, 2^tier).

    Uses the plain linear normalization ``floor((v - min) / extent * 2^tier)``
    with the upper edge clamped into the last cell (same convention as the
    reference's BasicDimensionDefinition normalization).
    """
    n = np.int64(1) << tier
    cx = np.floor((lon - LON_MIN) / (LON_MAX - LON_MIN) * float(n)).astype(np.int64)
    cy = np.floor((lat - LAT_MIN) / (LAT_MAX - LAT_MIN) * float(n)).astype(np.int64)
    np.clip(cx, 0, n - 1, out=cx)
    np.clip(cy, 0, n - 1, out=cy)
    return cx, cy


def cell_center(cx: np.ndarray, cy: np.ndarray, tier: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`grid_coords`: center lon/lat of each cell."""
    n = float(1 << tier)
    lon = LON_MIN + (cx.astype(np.float64) + 0.5) / n * (LON_MAX - LON_MIN)
    lat = LAT_MIN + (cy.astype(np.float64) + 0.5) / n * (LAT_MAX - LAT_MIN)
    return lon, lat


# ---------------------------------------------------------------------------
# Z-order (Morton)
# ---------------------------------------------------------------------------

# Magic-number bit spreading for 32-bit coords -> 64-bit morton.
_B = [
    np.uint64(0x5555555555555555),
    np.uint64(0x3333333333333333),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0000FFFF0000FFFF),
    np.uint64(0x00000000FFFFFFFF),
]


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of ``v`` so bit i lands at position 2i."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & _B[4]
    v = (v | (v << np.uint64(8))) & _B[3]
    v = (v | (v << np.uint64(4))) & _B[2]
    v = (v | (v << np.uint64(2))) & _B[1]
    v = (v | (v << np.uint64(1))) & _B[0]
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread_bits` (keeps even-position bits)."""
    v = v.astype(np.uint64) & _B[0]
    v = (v | (v >> np.uint64(1))) & _B[1]
    v = (v | (v >> np.uint64(2))) & _B[2]
    v = (v | (v >> np.uint64(4))) & _B[3]
    v = (v | (v >> np.uint64(8))) & _B[4]
    v = (v | (v >> np.uint64(16))) & _B[5]
    return v


def morton_encode(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Interleave (cx, cy) -> morton code; x occupies even bits."""
    return _spread_bits(cx) | (_spread_bits(cy) << np.uint64(1))


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = code.astype(np.uint64)
    return _compact_bits(code), _compact_bits(code >> np.uint64(1))


def zorder_cell(lon: np.ndarray, lat: np.ndarray, tier: int) -> np.ndarray:
    """lon/lat -> Z-order cell id at ``tier`` bits/dim (uint64)."""
    cx, cy = grid_coords(lon, lat, tier)
    return morton_encode(cx, cy)


# ---------------------------------------------------------------------------
# Hilbert (Skilling transpose, 2-D, vectorized)
# ---------------------------------------------------------------------------

def hilbert_encode(cx: np.ndarray, cy: np.ndarray, tier: int) -> np.ndarray:
    """(cx, cy) in [0, 2^tier)^2 -> Hilbert distance (uint64).

    Vectorized Skilling transform: Gray-code the axes in place then
    interleave (x = most significant). Matches golden vectors frozen in
    tests/test_sfc.py — OUR spec, stable across numpy versions.
    """
    x = cx.astype(np.uint64).copy()
    y = cy.astype(np.uint64).copy()
    m = np.uint64(1) << np.uint64(tier - 1)
    # Inverse undo loop (Skilling): from the top bit down.
    q = m
    while q > np.uint64(1):
        p = q - np.uint64(1)
        # axis x
        mask_x = (x & q) != 0
        x = np.where(mask_x, x ^ p, x)  # invert low bits of x
        # axis y
        mask_y = (y & q) != 0
        x = np.where(mask_y, x ^ p, x)
        # exchange low bits of x and y where y's bit not set
        t = (x ^ y) & p
        t = np.where(mask_y, np.uint64(0), t)
        x ^= t
        y ^= t
        q >>= np.uint64(1)
    # Gray encode
    y ^= x
    t = np.zeros_like(x)
    q = m
    while q > np.uint64(1):
        t = np.where((y & q) != 0, t ^ (q - np.uint64(1)), t)
        q >>= np.uint64(1)
    x ^= t
    y ^= t
    # interleave: x -> odd (high) bits, y -> even bits
    return (_spread_bits(x) << np.uint64(1)) | _spread_bits(y)


def hilbert_decode(h: np.ndarray, tier: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_encode`."""
    h = h.astype(np.uint64)
    x = _compact_bits(h >> np.uint64(1))
    y = _compact_bits(h)
    m = np.uint64(1) << np.uint64(tier)
    # Gray decode
    t = y >> np.uint64(1)
    y ^= x
    x ^= t
    # Undo excess work
    q = np.uint64(2)
    while q != m:
        p = q - np.uint64(1)
        mask_y = (y & q) != 0
        x = np.where(mask_y, x ^ p, x)
        tt = (x ^ y) & p
        tt = np.where(mask_y, np.uint64(0), tt)
        x ^= tt
        y ^= tt
        mask_x = (x & q) != 0
        x = np.where(mask_x, x ^ p, x)
        q <<= np.uint64(1)
    return x, y


def hilbert_cell(lon: np.ndarray, lat: np.ndarray, tier: int) -> np.ndarray:
    cx, cy = grid_coords(lon, lat, tier)
    return hilbert_encode(cx, cy, tier)


# ---------------------------------------------------------------------------
# Geohash (standard base32 geohash, vectorized to uint64 + string)
# ---------------------------------------------------------------------------

_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")


def geohash_int(lon: np.ndarray, lat: np.ndarray, precision_chars: int) -> np.ndarray:
    """Standard geohash as a uint64 of the leading 5*precision bits.

    Geohash interleaves starting with LONGITUDE as the first bit.
    """
    nbits = 5 * precision_chars
    bx = (nbits + 1) // 2  # lon bits
    by = nbits // 2        # lat bits
    cx = np.floor((lon - LON_MIN) / 360.0 * float(1 << bx)).astype(np.int64)
    cy = np.floor((lat - LAT_MIN) / 180.0 * float(1 << by)).astype(np.int64)
    np.clip(cx, 0, (1 << bx) - 1, out=cx)
    np.clip(cy, 0, (1 << by) - 1, out=cy)
    # interleave with lon first: lon gets bit positions nbits-1, nbits-3, ...
    if bx == by:  # even nbits: lon on odd positions (MSB nbits-1 is odd)
        code = (_spread_bits(cx) << np.uint64(1)) | _spread_bits(cy)
    else:  # odd nbits: lon on even positions (MSB nbits-1 is even)
        code = _spread_bits(cx) | (_spread_bits(cy) << np.uint64(1))
    return code


def geohash_codes_to_str(code: np.ndarray, precision_chars: int) -> np.ndarray:
    """Render uint64 geohash codes as base32 strings (vectorized:
    column-of-chars view, no per-row join)."""
    code = code.astype(np.uint64, copy=False)
    nbits = 5 * precision_chars
    out = np.empty((len(code), precision_chars), dtype="S1")
    for i in range(precision_chars):
        shift = np.uint64(nbits - 5 * (i + 1))
        idx = ((code >> shift) & np.uint64(31)).astype(np.int64)
        out[:, i] = _GEOHASH32[idx]
    return np.char.decode(out.view(f"S{precision_chars}").ravel(), "ascii").astype(
        object
    )


def geohash_str(lon: np.ndarray, lat: np.ndarray, precision_chars: int) -> np.ndarray:
    """Standard base32 geohash strings (numpy object array)."""
    return geohash_codes_to_str(
        geohash_int(lon, lat, precision_chars), precision_chars
    )


# ---------------------------------------------------------------------------
# Tiered assignment (fit-or-descend) for extents
# ---------------------------------------------------------------------------

def tier_for_bbox(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    max_tier: int = MAX_TIER,
    max_cells_per_dim: int = 2,
) -> np.ndarray:
    """Finest tier where each bbox spans <= ``max_cells_per_dim`` cells per
    dimension (so <= max_cells_per_dim**2 duplicates), vectorized.

    Mirrors the reference's duplicate bound of "<= 2 estimated duplicate
    ids per dimension" (TieredSFCIndexStrategy.java:58) without its
    per-row descent loop: the span in cells at tier t is
    ``extent / world * 2^t (+1 for straddle)``, so the finest admissible
    tier is derived in closed form from log2 of the extent.
    """
    w = np.maximum(xmax - xmin, 1e-12) / (LON_MAX - LON_MIN)
    h = np.maximum(ymax - ymin, 1e-12) / (LAT_MAX - LAT_MIN)
    frac = np.maximum(w, h)
    # want frac * 2^t + 1 <= max_cells_per_dim  =>  t <= log2((max-1)/frac)
    t = np.floor(np.log2(np.maximum(max_cells_per_dim - 1, 1) / frac)).astype(np.int64)
    return np.clip(t, 0, max_tier)


def cells_for_bbox_single(
    xmin: float, ymin: float, xmax: float, ymax: float, tier: int
) -> tuple[np.ndarray, np.ndarray]:
    """All (cx, cy) grid cells overlapping one bbox at ``tier``."""
    n = (1 << tier) - 1
    x0, y0 = grid_coords(np.array([xmin]), np.array([ymin]), tier)
    x1, y1 = grid_coords(np.array([xmax]), np.array([ymax]), tier)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return gx.ravel(), gy.ravel()


def xz_single_cell(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    max_tier: int = MAX_TIER,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """XZ-order-style single-cell encoding for extents (vectorized).

    The reference's XZOrderSFC (``core/index/.../sfc/xz/XZOrderSFC.java:72``)
    assigns every extent exactly ONE cell at an adaptive resolution:
    conceptually each cell is enlarged 2x so any extent no wider than a
    cell fits the (enlarged) cell anchored at its lower-left corner.
    We mirror that: tier = finest level whose cell size >= extent size,
    cell = grid cell of the extent's lower-left corner at that tier.
    Returns (tier, cx, cy) — no duplication, at the cost of coarser
    query ranges (queries must expand to the enlarged footprint).
    """
    w = np.maximum(xmax - xmin, 1e-12) / (LON_MAX - LON_MIN)
    h = np.maximum(ymax - ymin, 1e-12) / (LAT_MAX - LAT_MIN)
    frac = np.maximum(w, h)
    t = np.clip(np.floor(-np.log2(frac)).astype(np.int64), 0, max_tier)
    cx = np.empty(len(t), dtype=np.int64)
    cy = np.empty(len(t), dtype=np.int64)
    for tt in np.unique(t):
        m = t == tt
        gx, gy = grid_coords(xmin[m], ymin[m], int(tt))
        cx[m], cy[m] = gx, gy
    return t, cx, cy


def bbox_cell_ranges(
    xmin: float, ymin: float, xmax: float, ymax: float, tier: int,
    curve: str = "morton",
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Decompose a query bbox into sorted, merged [lo, hi] cell-id ranges
    at ``tier`` — the analogue of the reference's QueryRanges
    (TieredSFCIndexStrategy.getQueryRanges). Used to push predicates into
    ``read_parquet`` partition/row-group pruning.

    Returns at most ``max_ranges`` ranges (adjacent ranges merged first,
    then the smallest gaps coalesced, trading selectivity for range
    count like the reference's maxRangeDecomposition cap).

    HIERARCHICAL quad decomposition (never enumerates per-cell): any
    quad block at level L maps to one contiguous id range on both
    Morton and Hilbert curves, so the box is covered by descending
    only along its boundary; quads still partial when the block budget
    is hit are emitted whole (a SUPERSET — pruning stays correct, the
    fine filter is exact). Cost is O(max_ranges), independent of tier,
    where the old per-cell enumeration was O(cells-in-box) — hours for
    a continent-sized box at tier 16.
    """
    x0a, y0a = grid_coords(np.array([xmin]), np.array([ymin]), tier)
    x1a, y1a = grid_coords(np.array([xmax]), np.array([ymax]), tier)
    x0, y0, x1, y1 = int(x0a[0]), int(y0a[0]), int(x1a[0]), int(y1a[0])
    budget = max(4 * max_ranges, 16)
    blocks: list[tuple[int, int, int]] = []  # (qx, qy, level) whole quads
    stack = [(0, 0, 0)]
    while stack:
        qx, qy, lv = stack.pop()
        k = tier - lv
        cx0, cy0 = qx << k, qy << k
        cx1, cy1 = ((qx + 1) << k) - 1, ((qy + 1) << k) - 1
        if cx1 < x0 or cx0 > x1 or cy1 < y0 or cy0 > y1:
            continue
        full = cx0 >= x0 and cx1 <= x1 and cy0 >= y0 and cy1 <= y1
        if full or lv == tier or len(blocks) + len(stack) >= budget:
            blocks.append((qx, qy, lv))
            continue
        for dx in (0, 1):
            for dy in (0, 1):
                stack.append((qx * 2 + dx, qy * 2 + dy, lv + 1))
    rngs: list[tuple[int, int]] = []
    for qx, qy, lv in blocks:
        k = tier - lv
        qa = np.array([qx], dtype=np.int64)
        qb = np.array([qy], dtype=np.int64)
        if curve == "hilbert":
            base = int(hilbert_encode(qa, qb, lv)[0])
        else:
            base = int(morton_encode(qa, qb)[0])
        rngs.append((base << (2 * k), ((base + 1) << (2 * k)) - 1))
    rngs.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in rngs:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    # coalesce smallest gaps until under cap
    while len(merged) > max_ranges:
        gaps = [merged[i + 1][0] - merged[i][1] for i in range(len(merged) - 1)]
        i = int(np.argmin(gaps))
        merged[i] = (merged[i][0], merged[i + 1][1])
        del merged[i + 1]
    return merged


# ---------------------------------------------------------------------------
# hexagonal binning (the H3-binning ROLE — H3BinningHelper.java — on a
# planar axial hex grid; true H3's icosahedral projection needs the
# native lib, absent here. Ids are (q, r) axial coords, not H3 ids.)
# ---------------------------------------------------------------------------

_SQRT3 = 1.7320508075688772


def hex_cell(lon: np.ndarray, lat: np.ndarray, size_deg: float) -> tuple[np.ndarray, np.ndarray]:
    """Pointy-top axial hex binning with cube rounding -> (q, r)."""
    x = (_SQRT3 / 3.0 * lon - 1.0 / 3.0 * lat) / size_deg
    z = (2.0 / 3.0 * lat) / size_deg
    y = -x - z
    rx = np.round(x)
    ry = np.round(y)
    rz = np.round(z)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)
