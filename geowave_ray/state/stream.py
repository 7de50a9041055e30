"""Incrementally-maintained statistics over a record feed.

The reference's only streaming surface is Kafka ingest feeding the
same per-record path plus statistics callbacks updated per write
(``core/store/.../statistics/StatisticUpdateCallback.java:30-88``).
Ray shape: one ``@ray.remote`` actor per key-hash bucket holding the
mergeable sketches from :mod:`geowave_ray.stats`; batches stream in
(in arrival order — no watermarks, matching the reference), snapshots
merge across buckets on demand.
"""

from __future__ import annotations

import numpy as np
import ray

from ..stats import HyperLogLog, merge_numeric, numeric_partial


@ray.remote
class StatsBucket:
    """One shard of the incremental statistics state."""

    def __init__(self, hll_p: int = 12):
        self.count = 0
        self.numeric: dict[str, dict] = {}
        self.hll: dict[str, HyperLogLog] = {}
        self.hll_p = hll_p

    def update(self, n_rows: int, numeric_cols: dict, distinct_cols: dict) -> int:
        """numeric_cols: {col: partial-dict}; distinct_cols: {col: [values]}."""
        self.count += n_rows
        for c, p in numeric_cols.items():
            self.numeric[c] = merge_numeric(self.numeric.get(c, p), p) if c in self.numeric else dict(p)
        for c, vals in distinct_cols.items():
            h = self.hll.setdefault(c, HyperLogLog(self.hll_p))
            h.add(vals)
        return self.count

    def snapshot(self) -> dict:
        return {
            "count": self.count,
            "numeric": self.numeric,
            "hll": {c: h.to_bytes() for c, h in self.hll.items()},
        }


class IncrementalStats:
    """Driver-side facade: route batches to bucket actors by key hash,
    merge snapshots on read (the statistics-store query path)."""

    def __init__(self, n_buckets: int = 4, hll_p: int = 12):
        self.hll_p = hll_p
        self.buckets = [StatsBucket.remote(hll_p) for _ in range(n_buckets)]
        self._rr = 0

    def ingest_batch(self, batch, numeric_cols=(), distinct_cols=()) -> None:
        numeric = {c: numeric_partial(batch.column(c).to_numpy()) for c in numeric_cols}
        distinct = {c: batch.column(c).to_pylist() for c in distinct_cols}
        b = self.buckets[self._rr % len(self.buckets)]
        self._rr += 1
        b.update.remote(batch.num_rows, numeric, distinct)

    def snapshot(self) -> dict:
        snaps = ray.get([b.snapshot.remote() for b in self.buckets])
        out = {"count": sum(s["count"] for s in snaps), "numeric": {}, "hll_estimate": {}}
        for s in snaps:
            for c, p in s["numeric"].items():
                out["numeric"][c] = (
                    merge_numeric(out["numeric"][c], p) if c in out["numeric"] else dict(p)
                )
        hlls: dict[str, HyperLogLog] = {}
        for s in snaps:
            for c, b in s["hll"].items():
                h = HyperLogLog.from_bytes(b, self.hll_p)
                hlls[c] = hlls[c].merge(h) if c in hlls else h
        out["hll_estimate"] = {c: h.estimate() for c, h in hlls.items()}
        return out
