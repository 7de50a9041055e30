"""Page-table source readers — the ingest-format-plugin surface
(reference: ``core/ingest/spi/IngestFormatPluginProviderSpi`` and the
per-format parsers under ``extensions/formats/``; each format is one
``map_batches`` normalizer into the canonical pages schema).

Canonical schema (BASELINE.json input_hint):
    url: string, warc_ts: timestamp[us], html: binary,
    text: string, lang: string  (+ row_id: int64 when present)

Readers: parquet (native), CSV, JSON-lines — each normalizes column
names/types and passes ``text`` through byte-identically. A registry
dict maps format name -> reader, the SPI-registry analogue.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CANONICAL_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    for name in batch.column_names:
        key = name.strip().lower()
        cols[key] = batch.column(name)
    out = {}
    if "row_id" in cols:
        out["row_id"] = pc.cast(cols["row_id"], pa.int64())
    for name in CANONICAL_COLUMNS:
        if name not in cols:
            raise ValueError(f"pages source missing column {name!r}")
        arr = cols[name]
        if name == "warc_ts":
            if pa.types.is_timestamp(arr.type):
                arr = pc.cast(arr, pa.timestamp("us"))
            else:
                arr = pc.strptime(
                    pc.cast(arr, pa.string()), format="%Y-%m-%d %H:%M:%S", unit="us"
                )
        elif name == "html":
            if not pa.types.is_binary(arr.type):
                arr = pc.cast(arr, pa.binary())
        else:
            arr = pc.cast(arr, pa.string())
        out[name] = arr
    return pa.table(out)


def read_pages_parquet(path, **kwargs) -> ray.data.Dataset:
    return ray.data.read_parquet(path, **kwargs).map_batches(
        _normalize, batch_format="pyarrow", batch_size=None
    )


def read_pages_csv(path, **kwargs) -> ray.data.Dataset:
    """CSV pages (html column base64 is NOT supported — CSV sources
    carry text-only payloads; html arrives as utf-8 bytes)."""
    return ray.data.read_csv(path, **kwargs).map_batches(
        _normalize, batch_format="pyarrow", batch_size=None
    )


def read_pages_json(path, **kwargs) -> ray.data.Dataset:
    """JSON-lines pages."""
    return ray.data.read_json(path, **kwargs).map_batches(
        _normalize, batch_format="pyarrow", batch_size=None
    )


#: SPI-registry analogue: format name -> reader callable
READERS = {
    "parquet": read_pages_parquet,
    "csv": read_pages_csv,
    "json": read_pages_json,
}


def read_pages(path, fmt: str = "parquet", **kwargs) -> ray.data.Dataset:
    try:
        reader = READERS[fmt]
    except KeyError:
        raise ValueError(f"unknown pages format {fmt!r}; have {sorted(READERS)}")
    return reader(path, **kwargs)
