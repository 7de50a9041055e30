"""Deterministic geotag derivation: (url, lang) -> (lon, lat).

This is the engine's "parser" stage for Common-Crawl-style pages —
the role the reference's format plugins play
(``extensions/formats/gpx/GPXConsumer.java`` etc.): turn a raw record
into a point feature. Per the fixture spec (FIXTURES.md §1):

    h   = sha256((url + "|" + lang).encode())
    lon = (int.from_bytes(h[0:8],  'big') / 2**64) * 360 - 180
    lat = (int.from_bytes(h[8:16], 'big') / 2**64) * 180 - 90

with a hot-cell skew remap for rows where ``i % 10 < 3`` (dense url
clusters). The derivation is a pure function of the row so N-CPU and
4N-CPU runs agree bit-for-bit, and ``text`` is never touched
(byte-identical invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

CLUSTER_CENTERS = [(-77.0, 38.9), (2.35, 48.85), (139.7, 35.7), (151.2, -33.9)]


def _hash_bytes(url: str, lang: str) -> bytes:
    return hashlib.sha256((url + "|" + lang).encode()).digest()


def derive_lonlat(urls, langs, row_index=None) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-per-batch geotag derivation.

    ``row_index`` (the global row number ``i``) drives the hot-cluster
    remap; when None, no remap is applied.
    """
    n = len(urls)
    # hash loop is the only per-row python; the float math is vectorized
    # over the packed digests. uint64->float64 then /2**64 is bit-equal
    # to python's int/2**64 (scaling by a power of two is exact).
    blob = bytearray(24 * n)
    sha256 = hashlib.sha256
    for k in range(n):
        blob[24 * k : 24 * k + 24] = sha256(
            (urls[k] + "|" + langs[k]).encode()
        ).digest()[:24]
    arr = np.frombuffer(bytes(blob), dtype=">u8").reshape(n, 3).astype(np.float64)
    lon = (arr[:, 0] / 2**64) * 360 - 180
    lat = (arr[:, 1] / 2**64) * 180 - 90
    frac = arr[:, 2] / 2**64
    if row_index is not None:
        i = np.asarray(row_index, dtype=np.int64)
        hot = (i % 10) < 3
        centers = np.array(CLUSTER_CENTERS, dtype=np.float64)
        c = centers[i % 4]
        lon = np.where(hot, c[:, 0] + (frac * 0.02 - 0.01), lon)
        lat = np.where(hot, c[:, 1] + (frac * 0.02 - 0.01), lat)
    return lon, lat


class GeotagStage:
    """``map_batches`` callable: append lon/lat columns to a pages batch.

    Stateless and cheap — used as a plain function stage. Requires a
    ``row_id`` int64 column (the stable global row number, written by
    the fixture generator / ingest manifest) for the hot-cluster remap.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        # always re-derive: drop any stored (oracle-only) lon/lat columns
        for col in ("lon", "lat"):
            if col in batch.column_names:
                batch = batch.drop_columns([col])
        urls = batch.column("url").to_pylist()
        langs = batch.column("lang").to_pylist()
        idx = batch.column("row_id").to_numpy() if "row_id" in batch.column_names else None
        lon, lat = derive_lonlat(urls, langs, idx)
        batch = batch.append_column("lon", pa.array(lon, pa.float64()))
        batch = batch.append_column("lat", pa.array(lat, pa.float64()))
        return batch


def geotag_batch(batch: pa.Table) -> pa.Table:
    return GeotagStage()(batch)
