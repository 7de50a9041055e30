"""GPX-role XML track parser — the per-file format-plugin surface
(reference: ``extensions/formats/gpx/GPXConsumer.java`` walks
trk/trkseg/trkpt and emits one point feature per trkpt with
lat/lon/ele/time plus the enclosing track name).

Files are the parse unit (exactly as the reference's whole-file
ingest plugins): a batch row carries one GPX document as a string;
``parse_gpx_batch`` expands it to point records using the stdlib
ElementTree — no geo/XML libs needed.  At scale this runs inside
``map_batches`` over a ``read_binary_files``/parquet file table, so
parallelism is per-file and the output streams in blocks.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa


def parse_gpx_batch(batch: pa.Table, xml_col: str = "xml") -> pa.Table:
    """Expand GPX documents to (track_id, seq, lon, lat, ele, ts) rows.

    ``seq`` numbers trkpts within a track in document order.  Times are
    ISO-8601 ``Z``-suffixed; parsed to timestamp[us].
    """
    tids: list[str] = []
    seqs: list[int] = []
    lons: list[float] = []
    lats: list[float] = []
    eles: list[float] = []
    tss: list[np.datetime64] = []
    for doc in batch.column(xml_col).to_pylist():
        root = ET.fromstring(doc)
        for trk in root.iter("trk"):
            name_el = trk.find("name")
            tid = name_el.text if name_el is not None else ""
            seq = 0
            for pt in trk.iter("trkpt"):
                lats.append(float(pt.attrib["lat"]))
                lons.append(float(pt.attrib["lon"]))
                ele = pt.find("ele")
                eles.append(float(ele.text) if ele is not None else np.nan)
                t = pt.find("time")
                tss.append(
                    np.datetime64(t.text.rstrip("Z"), "us")
                    if t is not None
                    else np.datetime64("NaT", "us")
                )
                tids.append(tid)
                seqs.append(seq)
                seq += 1
    return pa.table(
        {
            "track_id": pa.array(tids, pa.string()),
            "seq": pa.array(np.asarray(seqs, dtype=np.int64), pa.int64()),
            "lon": pa.array(np.asarray(lons, dtype=np.float64), pa.float64()),
            "lat": pa.array(np.asarray(lats, dtype=np.float64), pa.float64()),
            "ele": pa.array(np.asarray(eles, dtype=np.float64), pa.float64()),
            "ts": pa.array(np.asarray(tss, dtype="datetime64[us]"), pa.timestamp("us")),
        }
    )


def read_gpx_table(files: "ray.data.Dataset") -> "ray.data.Dataset":  # noqa: F821
    """Dataset of GPX documents -> Dataset of track points."""
    return files.map_batches(parse_gpx_batch, batch_format="pyarrow", batch_size=None)
