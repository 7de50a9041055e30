"""STANAG 4676 (NATO track-message XML) format plugin — the last of
the reference's format extensions
(``extensions/formats/stanag4676/.../parser/NATO4676Decoder.java:266-420``:
a TrackMessage carries ``tracks`` elements, each with ``trackNumber``
/ ``trackUUID`` / ``status`` and ``items`` of xsi:type TrackPoint
holding ``trackItemUUID`` / ``trackItemTime`` / ``trackPointPosition``
(latitude, longitude, elevation) / ``trackPointSpeed`` /
``trackPointCourse`` / ``trackPointType``).

Same Ray shape as :mod:`geowave_ray.sources.gpx`: files are the parse
unit; one batch row = one XML document string; ``parse_stanag_batch``
expands documents to point rows inside ``map_batches`` so parallelism
is per-file and output streams in blocks. Pure stdlib ElementTree.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _child_text(el, name: str):
    for c in el:
        if _local(c.tag) == name:
            return c.text
    return None


def parse_stanag_batch(batch: pa.Table, xml_col: str = "xml") -> pa.Table:
    """Expand TrackMessage documents to one row per TrackPoint:
    (track_number, track_uuid, point_uuid, ts, lon, lat, elevation,
    speed, course, point_type). Non-TrackPoint items (identity /
    classification / lineage) are skipped, like the reference's
    point-feature adapter path."""
    tn, tu, pu, ts, lon, lat, ele, spd, crs, pt = ([] for _ in range(10))
    for doc in batch.column(xml_col).to_pylist():
        root = ET.fromstring(doc)
        for track in root.iter():
            if _local(track.tag) != "tracks":
                continue
            number = _child_text(track, "trackNumber") or ""
            uuid = _child_text(track, "trackUUID") or ""
            for item in track:
                if _local(item.tag) != "items":
                    continue
                xsitype = item.attrib.get(
                    "{http://www.w3.org/2001/XMLSchema-instance}type"
                )
                if xsitype is not None and xsitype != "TrackPoint":
                    continue
                pos = None
                for c in item:
                    if _local(c.tag) == "trackPointPosition":
                        pos = c
                if pos is None:
                    continue
                tn.append(number)
                tu.append(uuid)
                pu.append(_child_text(item, "trackItemUUID") or "")
                t = _child_text(item, "trackItemTime")
                ts.append(
                    np.datetime64(t.rstrip("Z"), "us")
                    if t
                    else np.datetime64("NaT", "us")
                )
                lat.append(float(_child_text(pos, "latitude")))
                lon.append(float(_child_text(pos, "longitude")))
                e = _child_text(pos, "elevation")
                ele.append(float(e) if e is not None else np.nan)
                s = _child_text(item, "trackPointSpeed")
                spd.append(float(s) if s is not None else np.nan)
                c = _child_text(item, "trackPointCourse")
                crs.append(float(c) if c is not None else np.nan)
                pt.append(_child_text(item, "trackPointType") or "")
    return pa.table(
        {
            "track_number": pa.array(tn, pa.string()),
            "track_uuid": pa.array(tu, pa.string()),
            "point_uuid": pa.array(pu, pa.string()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "elevation": pa.array(ele, pa.float64()),
            "speed": pa.array(spd, pa.float64()),
            "course": pa.array(crs, pa.float64()),
            "point_type": pa.array(pt, pa.string()),
        }
    )
