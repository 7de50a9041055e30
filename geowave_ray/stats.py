"""Statistics: mergeable per-block partial aggregates + sketches.

Capability parity with the reference's statistics registry
(``core/store/.../statistics/`` — Count/NumericRange/NumericStats/
Histogram + HyperLogLog / CountMinSketch / BloomFilter field sketches,
and geotime BoundingBoxStatistic / TimeRangeStatistic), re-expressed
as the Ray-guide pattern: one serialized-able partial per batch,
merged in a tiny reduce; persisted into partition lineage manifests
where ingest runs (``state/manifest.py``).

All sketches are pure-numpy (no datasketches in this environment).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _hash64(values) -> np.ndarray:
    """Vectorized 64-bit hash for sketch routing (no per-row hashlib):
    string columns take the one-pass polynomial hash, numerics a
    splitmix avalanche."""
    from .hashing import hash_utf8, mix64

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        t = values.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return hash_utf8(values)
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return mix64(arr.astype(np.uint64))
    if arr.dtype.kind == "f":
        return mix64(arr.astype(np.float64).view(np.uint64))
    return hash_utf8(
        pa.array(
            [v if isinstance(v, str) else str(v) for v in arr], pa.large_string()
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog (dense, p-bit registers)
# ---------------------------------------------------------------------------


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1 (vectorized via bit length)
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] <<= np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        self.add_hashed(_hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            import math

            # libm log (not np.log): bit-identical to the SQL oracle's ln
            return m * math.log(m / zeros)  # linear counting small-range fix
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


# ---------------------------------------------------------------------------
# Count-Min sketch / Bloom filter
# ---------------------------------------------------------------------------


class CountMinSketch:
    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _idx(self, h: np.ndarray, row: int) -> np.ndarray:
        return ((h * np.uint64(2 * row + 1) + np.uint64(row * 0x9E3779B9)) % np.uint64(self.width)).astype(np.int64)

    def add(self, values) -> None:
        h = _hash64(values)
        for r in range(self.depth):
            np.add.at(self.table[r], self._idx(h, r), 1)

    def query(self, values) -> np.ndarray:
        h = _hash64(values)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.depth):
            est = np.minimum(est, self.table[r][self._idx(h, r)])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        out = CountMinSketch(self.width, self.depth)
        out.table = self.table + other.table
        return out


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 16, k: int = 5):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, h: np.ndarray, i: int) -> np.ndarray:
        return ((h >> np.uint64(i * 7)) ^ (h * np.uint64(i + 1))) % np.uint64(self.n_bits)

    def add(self, values) -> None:
        h = _hash64(values)
        for i in range(self.k):
            pos = self._positions(h, i).astype(np.int64)
            np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains(self, values) -> np.ndarray:
        h = _hash64(values)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            pos = self._positions(h, i).astype(np.int64)
            out &= (self.bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        out = BloomFilter(self.n_bits, self.k)
        out.bits = self.bits | other.bits
        return out


# ---------------------------------------------------------------------------
# numeric / bbox / time-range partials (mergeable dataclass-ish dicts)
# ---------------------------------------------------------------------------


def numeric_partial(arr: np.ndarray) -> dict:
    arr = arr[~np.isnan(arr)] if arr.dtype.kind == "f" else arr
    if len(arr) == 0:
        return {"n": 0, "min": None, "max": None, "sum": 0.0, "sumsq": 0.0}
    return {
        "n": int(len(arr)),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "sum": float(arr.sum()),
        "sumsq": float((arr.astype(np.float64) ** 2).sum()),
    }


def merge_numeric(a: dict, b: dict) -> dict:
    if a["n"] == 0:
        return dict(b)
    if b["n"] == 0:
        return dict(a)
    return {
        "n": a["n"] + b["n"],
        "min": min(a["min"], b["min"]),
        "max": max(a["max"], b["max"]),
        "sum": a["sum"] + b["sum"],
        "sumsq": a["sumsq"] + b["sumsq"],
    }


def dataset_numeric_stats(ds: ray.data.Dataset, column: str) -> dict:
    """Partial-per-batch numeric stats with a driver-side final merge
    (the Aggregation partial/final split of
    ``core/store/.../api/Aggregation.java:25-96``)."""

    def partial(batch: pa.Table) -> pa.Table:
        p = numeric_partial(batch.column(column).to_numpy())
        return pa.table({k: [p[k]] for k in ("n", "min", "max", "sum", "sumsq")})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    acc = {"n": 0, "min": None, "max": None, "sum": 0.0, "sumsq": 0.0}
    for _, row in parts.iterrows():
        acc = merge_numeric(acc, row.to_dict())
    if acc["n"]:
        acc["mean"] = acc["sum"] / acc["n"]
        acc["var"] = max(0.0, acc["sumsq"] / acc["n"] - acc["mean"] ** 2)
    return acc


def dataset_hll_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> float:
    """Approximate distinct count: one HLL partial per batch, merged."""

    def partial(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add(batch.column(column))  # Arrow column -> vectorized hash
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    acc = HyperLogLog(p)
    for b in parts["sketch"]:
        acc = acc.merge(HyperLogLog.from_bytes(bytes(b), p))
    return acc.estimate()


def exact_kth_value(
    ds: ray.data.Dataset,
    col: str,
    k: int,
    bins: int = 4096,
    collect_threshold: int = 100_000,
    max_rounds: int = 8,
) -> float:
    """EXACT k-th smallest value (0-indexed) of a numeric column —
    distributed selection by iterative histogram refinement.

    Each round: one streaming pass computes per-bin counts over the
    current [lo, hi] candidate interval (per-block partials, tiny
    reduce), the bin containing the k-th value narrows the interval,
    and k is rebased.  When the candidate count fits
    ``collect_threshold`` the survivors are collected and selected
    exactly.  O(rounds) passes, nothing large on the driver —
    the scale-correct alternative to ``sort().take(k)``.
    """
    if k < 0:
        raise ValueError("k must be >= 0")

    def minmax(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy()
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    mm = ds.map_batches(minmax, batch_format="pyarrow", batch_size=None).to_pandas()
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    hi_inclusive = True

    def collect_and_pick(lo_, hi_, incl_, k_):
        def survivors(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy()
            m = (v >= lo_) & ((v <= hi_) if incl_ else (v < hi_))
            return pa.table({"v": pa.array(v[m], pa.float64())})

        vals = np.sort(
            ds.map_batches(survivors, batch_format="pyarrow", batch_size=None)
            .to_pandas()["v"]
            .to_numpy()
        )
        return float(vals[k_])

    for _ in range(max_rounds):
        if lo == hi:
            return lo
        # comparison-based bin edges: bin j = [edges[j], edges[j+1]),
        # last bin right-inclusive iff the interval is — searchsorted
        # membership is consistent with plain comparisons, so the next
        # round's interval test selects EXACTLY this bin's values
        edges = np.linspace(lo, hi, bins + 1)

        def hist(batch: pa.Table, lo=lo, hi=hi, incl=hi_inclusive, edges=edges) -> pa.Table:
            v = batch.column(col).to_numpy()
            v = v[(v >= lo) & ((v <= hi) if incl else (v < hi))]
            idx = np.searchsorted(edges, v, side="right") - 1
            np.clip(idx, 0, bins - 1, out=idx)
            c = np.bincount(idx, minlength=bins)
            nz = np.nonzero(c)[0]
            return pa.table(
                {"bin": pa.array(nz, pa.int64()),
                 "n": pa.array(c[nz], pa.int64())}
            )

        parts = ds.map_batches(hist, batch_format="pyarrow", batch_size=None).to_pandas()
        counts = np.zeros(bins, dtype=np.int64)
        np.add.at(counts, parts["bin"].to_numpy(), parts["n"].to_numpy())
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, k + 1))
        if b >= bins:
            raise IndexError(f"k={k} out of range (n={int(cum[-1])})")
        k -= int(cum[b - 1]) if b else 0
        new_lo = float(edges[b])
        new_hi = float(edges[b + 1])
        new_incl = hi_inclusive and b == bins - 1
        if int(counts[b]) <= collect_threshold or (new_lo, new_hi) == (lo, hi):
            return collect_and_pick(new_lo, new_hi, new_incl, k)
        lo, hi, hi_inclusive = new_lo, new_hi, new_incl
    return collect_and_pick(lo, hi, hi_inclusive, k)


def dataset_cms(
    ds: ray.data.Dataset, column: str, width: int = 2048, depth: int = 4
) -> CountMinSketch:
    """Distributed CountMinSketch (CountMinSketchStatistic role):
    one sketch per block, counter tables summed on the driver
    (depth×width int64 — a few KB per partial)."""

    def partial(batch: pa.Table) -> pa.Table:
        c = CountMinSketch(width, depth)
        c.add(batch.column(column))
        return pa.table({"sketch": pa.array([c.table.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    acc = CountMinSketch(width, depth)
    for b in parts["sketch"]:
        acc.table += np.frombuffer(bytes(b), dtype=np.int64).reshape(depth, width)
    return acc


def dataset_bloom(
    ds: ray.data.Dataset, column: str, n_bits: int = 1 << 16, k: int = 5
) -> BloomFilter:
    """Distributed BloomFilter (BloomFilterStatistic role): per-block
    bitsets OR-merged on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits, k)
        f.add(batch.column(column))
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    acc = BloomFilter(n_bits, k)
    for b in parts["bits"]:
        acc.bits |= np.frombuffer(bytes(b), dtype=np.uint8)
    return acc


def dataset_bbox(ds: ray.data.Dataset, lon_col="lon", lat_col="lat") -> dict:
    """BoundingBoxStatistic analogue: envelope via min/max aggregates."""
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(
        Min(lon_col, alias_name="xmin"),
        Min(lat_col, alias_name="ymin"),
        Max(lon_col, alias_name="xmax"),
        Max(lat_col, alias_name="ymax"),
    )
    return dict(row)


def dataset_time_range(ds: ray.data.Dataset, ts_col: str = "warc_ts") -> dict:
    """TimeRangeStatistic / VectorTimeRangeAggregation analogue
    (``core/geotime/.../store/query/aggregate/VectorTimeRangeAggregation.java``,
    ``statistics/TimeRangeStatistic.java``): interval union over the
    result set as a per-block partial (int64 microsecond min/max)
    merged on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(ts) == 0:
            return pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())})
        return pa.table(
            {"lo": pa.array([int(ts.min())], pa.int64()),
             "hi": pa.array([int(ts.max())], pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    import pandas as pd

    return {
        "t_min": pd.Timestamp(int(parts["lo"].min()), unit="us"),
        "t_max": pd.Timestamp(int(parts["hi"].max()), unit="us"),
    }


class FixedBinHistogram:
    """Mergeable fixed-bin numeric histogram
    (FixedBinNumericHistogramStatistic analogue)."""

    def __init__(self, lo: float, hi: float, bins: int = 64):
        self.lo = lo
        self.hi = hi
        self.bins = bins
        self.counts = np.zeros(bins, dtype=np.int64)

    def add(self, arr: np.ndarray) -> None:
        idx = np.floor((arr - self.lo) / (self.hi - self.lo) * self.bins).astype(np.int64)
        np.clip(idx, 0, self.bins - 1, out=idx)
        np.add.at(self.counts, idx, 1)

    def merge(self, other: "FixedBinHistogram") -> "FixedBinHistogram":
        out = FixedBinHistogram(self.lo, self.hi, self.bins)
        out.counts = self.counts + other.counts
        return out

    def quantile(self, q: float) -> float:
        c = np.cumsum(self.counts)
        if c[-1] == 0:
            return self.lo
        target = q * c[-1]
        b = int(np.searchsorted(c, target))
        return self.lo + (b + 0.5) / self.bins * (self.hi - self.lo)


def dataset_histogram(
    ds: ray.data.Dataset, column: str, lo: float, hi: float, bins: int = 64
) -> FixedBinHistogram:
    """Partial-per-batch histogram with final merge (split planning /
    RowRangeHistogramStatistic role)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = FixedBinHistogram(lo, hi, bins)
        h.add(batch.column(column).to_numpy())
        return pa.table({"counts": pa.array([h.counts.tolist()], pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    acc = FixedBinHistogram(lo, hi, bins)
    for c in parts["counts"]:
        acc.counts += np.asarray(c, dtype=np.int64)
    return acc


def optimal_count(manifest_dir: str) -> int | None:
    """OptimalCountAggregation analogue: answer COUNT(*) from the
    ingest manifest statistics without scanning
    (``core/store/.../query/aggregate/OptimalCountAggregation.java``).
    Returns None when no manifest exists (caller falls back to a scan).
    """
    from .state import manifest as mf

    entries = mf.load_all(manifest_dir)
    if not entries:
        return None
    # Keyed by the immutable input-file identity (per-file row counts
    # recorded at write time), never by output_dir — two entries sharing
    # a dir with different group_rows (a partially-resumed run) must not
    # produce an arbitrary answer.
    if all("file_rows" in e for e in entries):
        return int(sum(e["file_rows"] for e in entries))
    seen_groups = {}
    for e in entries:
        seen_groups[e.get("output_dir")] = e.get("group_rows", 0)
    return int(sum(seen_groups.values()))


def grouped_exact_quantile(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    q: float = 0.5,
    bins: int = 2048,
    collect_threshold: int = 50_000,
    max_rounds: int = 8,
) -> pa.Table:
    """EXACT per-group q-quantile (``quantile_disc`` semantics: the
    ceil(q*n)-th smallest, 1-based) WITHOUT a global sort — the
    grouped form of :func:`exact_kth_value`.

    Each refinement round is ONE streaming pass shared by every
    still-active group: a batch emits (group, bin, count) partials for
    each group's current candidate interval, the driver narrows every
    group's interval independently, and groups whose candidate count
    fits ``collect_threshold`` finish with one shared survivor-collect
    pass. Designed for CATEGORICAL keys (dozens-to-thousands of
    groups: per-round driver state is O(groups), per-batch work loops
    over groups with vectorized masks); for million-key quotas use the
    bucketed exchanges of ``text.quota_sample_per_key`` instead.
    """
    import math

    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")

    def gstats(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy()
        ok = ~np.isnan(v)
        g, v = g[ok], v[ok]
        if len(v) == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        codes, uniq = pd.factorize(g)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        lo = np.full(len(uniq), np.inf)
        hi = np.full(len(uniq), -np.inf)
        np.minimum.at(lo, codes, v)
        np.maximum.at(hi, codes, v)
        return pa.table({"g": pa.array([str(u) for u in uniq], pa.string()),
                         "n": pa.array(n, pa.int64()),
                         "lo": pa.array(lo, pa.float64()),
                         "hi": pa.array(hi, pa.float64())})

    gm = ds.map_batches(gstats, batch_format="pyarrow", batch_size=None).to_pandas()
    agg = gm.groupby("g").agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    # state per group: [k (0-based), lo, hi, incl, done, result]
    state = {
        g: {"k": int(math.ceil(q * r.n)) - 1, "lo": float(r.lo),
            "hi": float(r.hi), "incl": True, "done": False, "res": None,
            "n_cand": int(r.n)}
        for g, r in agg.iterrows()
    }

    def active_spec():
        return {
            g: (s["lo"], s["hi"], s["incl"])
            for g, s in state.items() if not s["done"] and s["res"] is None
        }

    for _ in range(max_rounds):
        spec = {
            g: v for g, v in active_spec().items()
            if state[g]["n_cand"] > collect_threshold
        }
        # groups at lo == hi are decided without a pass
        for g, s in state.items():
            if s["res"] is None and not s["done"] and s["lo"] == s["hi"]:
                s["res"], s["done"] = s["lo"], True
                spec.pop(g, None)
        if not spec:
            break
        edges_by_g = {
            g: np.linspace(lo, hi, bins + 1) for g, (lo, hi, _) in spec.items()
        }
        sref = ray.put((spec, edges_by_g))

        def ghist(batch: pa.Table, sref=sref) -> pa.Table:
            sp, eb = ray.get(sref)
            gcol = batch.column(group_col).to_numpy(zero_copy_only=False)
            v = batch.column(col).to_numpy()
            gs, bs, ns = [], [], []
            for g, (lo, hi, incl) in sp.items():
                m = (gcol == g) & (v >= lo) & ((v <= hi) if incl else (v < hi))
                if not m.any():
                    continue
                idx = np.searchsorted(eb[g], v[m], side="right") - 1
                np.clip(idx, 0, bins - 1, out=idx)
                c = np.bincount(idx, minlength=bins)
                nz = np.nonzero(c)[0]
                gs.extend([g] * len(nz))
                bs.extend(nz.tolist())
                ns.extend(c[nz].tolist())
            return pa.table({"g": pa.array(gs, pa.string()),
                             "bin": pa.array(bs, pa.int64()),
                             "n": pa.array(ns, pa.int64())})

        parts = ds.map_batches(ghist, batch_format="pyarrow", batch_size=None).to_pandas()
        for g in spec:
            s = state[g]
            counts = np.zeros(bins, dtype=np.int64)
            pg = parts[parts["g"] == g]
            np.add.at(counts, pg["bin"].to_numpy(), pg["n"].to_numpy())
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, s["k"] + 1))
            if b >= bins:
                raise IndexError(f"group {g}: k out of range")
            s["k"] -= int(cum[b - 1]) if b else 0
            edges = edges_by_g[g]
            new_lo, new_hi = float(edges[b]), float(edges[b + 1])
            new_incl = s["incl"] and b == bins - 1
            if (new_lo, new_hi) == (s["lo"], s["hi"]):
                s["n_cand"] = 0  # force collect
            else:
                s["n_cand"] = int(counts[b])
            s["lo"], s["hi"], s["incl"] = new_lo, new_hi, new_incl

    # one shared survivor-collect pass for everything unresolved
    spec = active_spec()
    if spec:
        sref = ray.put(spec)

        def survivors(batch: pa.Table, sref=sref) -> pa.Table:
            sp = ray.get(sref)
            gcol = batch.column(group_col).to_numpy(zero_copy_only=False)
            v = batch.column(col).to_numpy()
            gs, vs = [], []
            for g, (lo, hi, incl) in sp.items():
                m = (gcol == g) & (v >= lo) & ((v <= hi) if incl else (v < hi))
                vv = v[m]
                gs.extend([g] * len(vv))
                vs.extend(vv.tolist())
            return pa.table({"g": pa.array(gs, pa.string()),
                             "v": pa.array(vs, pa.float64())})

        sv = ds.map_batches(survivors, batch_format="pyarrow", batch_size=None).to_pandas()
        for g in spec:
            vals = np.sort(sv[sv["g"] == g]["v"].to_numpy())
            state[g]["res"] = float(vals[state[g]["k"]])
            state[g]["done"] = True

    gs = sorted(state)
    return pa.table(
        {
            group_col: pa.array(gs, pa.string()),
            "q_value": pa.array([state[g]["res"] for g in gs], pa.float64()),
        }
    )


def dataset_hll_distinct_binned(
    ds: ray.data.Dataset, column: str, bin_col: str, p: int = 12
) -> pa.Table:
    """Binned HLL distinct-count statistic — the reference's
    field-value binning applied to a sketch statistic
    (``core/store/.../statistics/binning/FieldValueBinningStrategy
    .java`` + ``CountStatistic``-style per-bin stats; GeoWave keeps one
    statistic value PER BIN and merges partials per bin). One HLL
    partial per (batch, bin present) — a bounded few-KB payload per
    block — merged per bin on the driver. Returns (bin, estimate)
    sorted by bin."""

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as _np

        if batch.num_rows == 0:
            # keep the bin column's real type so all-empty blocks
            # don't emit a null-typed schema that mismatches others
            return pa.table(
                {
                    "bin": pa.array([], batch.schema.field(bin_col).type),
                    "sketch": pa.array([], pa.binary()),
                }
            )
        bins = batch.column(bin_col).to_numpy(zero_copy_only=False)
        hashed = _hash64(batch.column(column))  # whole column, one pass
        out_bin, out_sk = [], []
        order = _np.argsort(bins, kind="stable")
        sb = bins[order]
        hs = hashed[order]
        cuts = _np.flatnonzero(_np.r_[True, sb[1:] != sb[:-1]])
        for s, e in zip(cuts, _np.r_[cuts[1:], len(sb)]):
            h = HyperLogLog(p)
            h.add_hashed(hs[s:e])
            out_bin.append(sb[s])
            out_sk.append(h.to_bytes())
        return pa.table(
            {
                "bin": pa.array(out_bin),
                "sketch": pa.array(out_sk, pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    acc: dict = {}
    for b, sk in zip(parts["bin"], parts["sketch"]):
        h = HyperLogLog.from_bytes(bytes(sk), p)
        acc[b] = acc[b].merge(h) if b in acc else h
    keys = sorted(acc)
    return pa.table(
        {
            "bin": pa.array(keys),
            "distinct_est": pa.array([acc[k].estimate() for k in keys], pa.float64()),
        }
    )
