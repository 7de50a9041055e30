"""Delimited-text format plugins: T-Drive, GeoLife, GDELT.

The reference ships per-file line parsers for these public trajectory
/ event corpora (``extensions/formats/tdrive/TdriveIngestPlugin.java``,
``extensions/formats/geolife/GeoLifeIngestPlugin.java``,
``extensions/formats/gdelt/GDELTIngestPlugin.java``) — each walks a
whole staged file line by line with ``String.split`` and emits one
SimpleFeature per valid line.  Here a batch row carries one whole file
(exactly the reference's whole-file ingest unit) and the expansion to
typed rows is a single chain of Arrow kernels over ALL lines of ALL
files in the batch: one ``split_pattern`` to lines, one to fields,
mask by field count, ``list_element`` per projected column — no
Python per-line loop, so a 10k-file batch parses at memory bandwidth.

Semantics per format (file:line cites are the parity contract):

* **T-Drive** (``TdriveUtils.java:29-78``, ``TdriveIngestPlugin.java:
  85-110``): CSV ``taxiid,timestamp,lon,lat``; exactly 4 fields;
  timestamp ``yyyy-MM-dd HH:mm:ss`` with parse failure -> epoch 0
  (the reference's explicit fallback); ``pointinstance`` counts valid
  lines per file in order.
* **GeoLife** (``GeoLifeIngestPlugin.java:137-210``): ``.plt`` lines
  ``lat,lon,0,altFeet,days,date,time``; only lines with exactly 7
  fields parse (the 6-line header self-skips); altitude ``-777`` ->
  null; lat/lon wrapped into CRS range
  (``GeometryUtils.adjustCoordinateDimensionToRange:850-865``);
  ``trackid`` = file name; plus one per-file track summary feature
  (start/end timestamp, duration ms, number of points —
  ``GeoLifeUtils.java:38-60``).
* **GDELT** (``GDELTUtils.java:41-90,151-166``,
  ``GDELTIngestPlugin.java:184-260``): tab-separated, 57 or 58
  columns; rows with ``actionGeoType == 0`` or empty/unparseable
  lat/lon are dropped; timestamp ``yyyyMMdd``; empty optional strings
  -> null; supplemental fields (actor country codes, mention counts,
  avg tone) included.

Divergence (documented): where the reference ABORTS the remainder of
a file on the first malformed numeric (its per-file try/catch), these
parsers skip just the malformed line — strictly more robust, and
identical on well-formed corpora.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EPOCH0 = np.datetime64(0, "us")


def _flat_lines(batch: pa.Table, content_col: str, file_col: str):
    """All lines of all files in the batch: (file_ids repeated per
    line, flat line StringArray)."""
    content = batch.column(content_col).combine_chunks()
    if isinstance(content, pa.ChunkedArray):  # zero-chunk tables
        content = pa.concat_arrays(content.chunks or [pa.array([], pa.string())])
    split = pc.split_pattern(content, pattern="\n")
    offs = np.asarray(split.offsets)
    counts = np.diff(offs - offs[0])
    fidx = np.repeat(np.arange(len(split), dtype=np.int64), counts)
    lines = split.flatten()
    file_ids = batch.column(file_col).combine_chunks()
    return file_ids, fidx, lines


def _fields(lines: pa.Array, delim: str):
    """Split every line into fields; returns (list array, nfields)."""
    f = pc.split_pattern(lines, pattern=delim)
    return f, pc.list_value_length(f).to_numpy().astype(np.int64)


def _seq_within(fi: np.ndarray) -> np.ndarray:
    """0-based position within each run of equal (sorted) file ids —
    the reference's per-file ``pointinstance`` counter."""
    n = fi.size
    if n == 0:
        return np.empty(0, np.int64)
    starts = np.flatnonzero(np.r_[True, fi[1:] != fi[:-1]])
    counts = np.diff(np.r_[starts, n])
    return np.arange(n, dtype=np.int64) - np.repeat(starts, counts)


def _col(fields: pa.ListArray, i: int) -> pa.Array:
    return pc.list_element(fields, i)


def _f64(arr: pa.Array) -> pa.Array:
    """String -> float64, unparseable -> null (reference skips the
    line; callers mask on validity)."""
    try:
        return pc.cast(arr, pa.float64())
    except pa.ArrowInvalid:
        # per-element fallback only when the batch contains garbage
        vals = []
        for s in arr.to_pylist():
            try:
                vals.append(float(s))
            except (TypeError, ValueError):
                vals.append(None)
        return pa.array(vals, pa.float64())


def _i64(arr: pa.Array) -> pa.Array:
    """String -> int64, exact (no float64 round-trip); unparseable ->
    null."""
    try:
        return pc.cast(arr, pa.int64())
    except pa.ArrowInvalid:
        vals = []
        for s in arr.to_pylist():
            try:
                vals.append(int(s))
            except (TypeError, ValueError):
                vals.append(None)
        return pa.array(vals, pa.int64())


def wrap_to_range(val: np.ndarray, lower: float, upper: float) -> np.ndarray:
    """Loop a coordinate back into [lower, upper] — vectorized
    ``GeometryUtils.adjustCoordinateDimensionToRange`` (:850-865):
    mult = floor(|val - sign*lower| / bound); val - mult*bound*sign."""
    bound = upper - lower
    sign = np.where(val < 0.0, -1.0, 1.0)
    mult = np.floor(np.abs((val + sign * (-lower)) / bound))
    return val - mult * bound * sign


# ---------------------------------------------------------------- T-Drive


def tdrive_validate(content: str) -> bool:
    """First line has exactly 4 comma fields (``TdriveUtils.validate``
    :66-78)."""
    first = content.split("\n", 1)[0]
    return len(first.split(",")) == 4


def parse_tdrive_batch(
    batch: pa.Table, content_col: str = "content", file_col: str = "file_id"
) -> pa.Table:
    """Whole T-Drive files -> (taxiid, pointinstance, ts, lon, lat)."""
    _, fidx, lines = _flat_lines(batch, content_col, file_col)
    fields, nf = _fields(lines, ",")

    keep = nf == 4  # TdriveUtils.validate / 4-token schema
    fields = fields.filter(pa.array(keep))
    fi = fidx[keep]

    taxiid = _f64(_col(fields, 0))
    lon = _f64(_col(fields, 2))
    lat = _f64(_col(fields, 3))
    ts = pc.strptime(
        _col(fields, 1), format="%Y-%m-%d %H:%M:%S", unit="us", error_is_null=True
    )
    # reference sets timestamp 0 on parse failure and KEEPS the row
    # (TdriveIngestPlugin.java:100-105)
    ts = pc.fill_null(ts, pa.scalar(EPOCH0.item(), pa.timestamp("us")))

    # numeric garbage in id/coords -> drop the line (see module note)
    ok = np.asarray(
        pc.and_(pc.and_(taxiid.is_valid(), lon.is_valid()), lat.is_valid())
    )
    if not ok.all():
        m = pa.array(ok)
        taxiid, lon, lat, ts = (
            taxiid.filter(m),
            lon.filter(m),
            lat.filter(m),
            ts.filter(m),
        )
        fi = fi[ok]

    return pa.table(
        {
            "taxiid": taxiid,  # Double in the reference schema
            "pointinstance": pa.array(_seq_within(fi), pa.int64()),
            "ts": ts,
            "lon": lon,
            "lat": lat,
        }
    )


# ---------------------------------------------------------------- GeoLife


def parse_geolife_batch(
    batch: pa.Table, content_col: str = "content", file_col: str = "file_id"
) -> pa.Table:
    """Whole ``.plt`` files -> point rows (trackid, pointinstance, ts,
    lat, lon, elevation)."""
    file_ids, fidx, lines = _flat_lines(batch, content_col, file_col)
    fields, nf = _fields(lines, ",")

    keep = nf == 7  # header lines never have 7 fields (plugin:160-162)
    fields = fields.filter(pa.array(keep))
    fi = fidx[keep]

    lat = _f64(_col(fields, 0))
    lon = _f64(_col(fields, 1))
    ele = _f64(_col(fields, 3))
    date_s = _col(fields, 5)
    time_s = _col(fields, 6)
    ts = pc.strptime(
        pc.binary_join_element_wise(date_s, time_s, " "),
        format="%Y-%m-%d %H:%M:%S",
        unit="us",
        error_is_null=True,
    )

    ok = np.asarray(
        pc.and_(pc.and_(lat.is_valid(), lon.is_valid()), ts.is_valid())
    )
    if not ok.all():
        m = pa.array(ok)
        lat, lon, ele, ts = lat.filter(m), lon.filter(m), ele.filter(m), ts.filter(m)
        fi = fi[ok]

    lat_np = wrap_to_range(lat.to_numpy(zero_copy_only=False), -90.0, 90.0)
    lon_np = wrap_to_range(lon.to_numpy(zero_copy_only=False), -180.0, 180.0)
    # altitude -777 means missing (GeoLifeIngestPlugin.java:186-189)
    ele_np = ele.to_numpy(zero_copy_only=False)
    ele_arr = pa.array(ele_np, pa.float64(), mask=(ele_np == -777.0) | np.isnan(ele_np))

    trackid = pc.take(file_ids, pa.array(fi, pa.int64()))
    return pa.table(
        {
            "trackid": trackid,
            "pointinstance": pa.array(_seq_within(fi), pa.int64()),
            "ts": ts,
            "lat": pa.array(lat_np, pa.float64()),
            "lon": pa.array(lon_np, pa.float64()),
            "elevation": ele_arr,
        }
    )


def geolife_track_summary(points: pa.Table) -> pa.Table:
    """Per-file track feature (GeoLifeUtils.java:38-60): start/end
    timestamp, duration ms, number of points.  Input must be the
    point table of whole files (one batch = whole files), which the
    whole-file parse unit guarantees."""
    if points.num_rows == 0:
        return pa.table(
            {
                "trackid": pa.array([], pa.string()),
                "start_ts": pa.array([], pa.timestamp("us")),
                "end_ts": pa.array([], pa.timestamp("us")),
                "duration_ms": pa.array([], pa.int64()),
                "n_points": pa.array([], pa.int64()),
            }
        )
    tid = points.column("trackid").combine_chunks()
    ts = points.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
    # rows arrive grouped by file in order (parse preserves line order)
    codes = np.asarray(pc.index_in(tid, pc.unique(tid)))
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    ends = np.r_[starts[1:], codes.size] - 1
    dur = (ts[ends] - ts[starts]).astype("timedelta64[ms]").astype(np.int64)
    return pa.table(
        {
            "trackid": pc.take(tid, pa.array(starts, pa.int64())),
            "start_ts": pa.array(ts[starts], pa.timestamp("us")),
            "end_ts": pa.array(ts[ends], pa.timestamp("us")),
            "duration_ms": pa.array(dur, pa.int64()),
            "n_points": pa.array(ends - starts + 1, pa.int64()),
        }
    )


# ----------------------------------------------------------------- GDELT

# column ids: GDELTUtils.java:41-90
_G_EVENT_ID, _G_TS = 0, 1
_G_A1NAME, _G_A2NAME = 6, 16
_G_NMENT, _G_NSRC, _G_NART, _G_TONE = 31, 32, 33, 34
_G_A1CC, _G_A2CC = 37, 44
_G_GEOTYPE, _G_CC = 49, 51
_G_LAT, _G_LON = 53, 54
_G_URL = 57
GDELT_MIN_COLUMNS, GDELT_MAX_COLUMNS = 57, 58


def _null_if_empty(arr: pa.Array) -> pa.Array:
    return pc.if_else(
        pc.not_equal(arr, pa.scalar("", arr.type)), arr, pa.scalar(None, arr.type)
    )


def parse_gdelt_batch(
    batch: pa.Table,
    content_col: str = "content",
    file_col: str = "file_id",
    include_supplemental: bool = True,
) -> pa.Table:
    """Whole GDELT daily-export files -> typed event rows."""
    _, _, lines = _flat_lines(batch, content_col, file_col)
    fields, nf = _fields(lines, "\t")

    keep = (nf >= GDELT_MIN_COLUMNS) & (nf <= GDELT_MAX_COLUMNS)
    fields = fields.filter(pa.array(keep))
    nf = nf[keep]

    geotype = _f64(_col(fields, _G_GEOTYPE))
    lat = _f64(_col(fields, _G_LAT))
    lon = _f64(_col(fields, _G_LON))
    # actionGeoType == 0 -> no geo (plugin:197-201); empty/garbage
    # lat or lon -> skip (GDELTUtils.parseLatLon:151-166)
    ok = np.asarray(
        pc.and_(
            pc.and_(geotype.is_valid(), pc.not_equal(geotype, 0.0)),
            pc.and_(lat.is_valid(), lon.is_valid()),
        )
    )
    m = pa.array(ok)
    fields = fields.filter(m)
    nf = nf[ok]
    lat, lon = lat.filter(m), lon.filter(m)

    eventid = _i64(_col(fields, _G_EVENT_ID))
    ts = pc.strptime(_col(fields, _G_TS), format="%Y%m%d", unit="us", error_is_null=True)

    # sourceUrl exists only in the 58-column (post-2013) layout
    # (plugin:253-259)
    n = len(fields)
    url_np = np.full(n, None, dtype=object)
    idx58 = np.flatnonzero(nf > _G_URL)
    if idx58.size:
        sub = pc.list_element(fields.take(pa.array(idx58, pa.int64())), _G_URL)
        url_np[idx58] = sub.to_pylist()
    urls = _null_if_empty(pa.array(url_np, pa.string()))

    cols = {
        "eventid": eventid,
        "ts": ts,
        "lat": lat,
        "lon": lon,
        "actor1Name": _null_if_empty(_col(fields, _G_A1NAME)),
        "actor2Name": _null_if_empty(_col(fields, _G_A2NAME)),
        "countryCode": _null_if_empty(_col(fields, _G_CC)),
        "sourceUrl": urls,
    }
    if include_supplemental:  # GDELTUtils.java:127-147
        cols["actor1CountryCode"] = _null_if_empty(_col(fields, _G_A1CC))
        cols["actor2CountryCode"] = _null_if_empty(_col(fields, _G_A2CC))
        cols["numMentions"] = _i64(_col(fields, _G_NMENT))
        cols["numSources"] = _i64(_col(fields, _G_NSRC))
        cols["numArticles"] = _i64(_col(fields, _G_NART))
        cols["avgTone"] = _f64(_col(fields, _G_TONE))
    return pa.table(cols)


# ------------------------------------------------------- Dataset wrappers


def read_tdrive_table(files):
    """Dataset of whole T-Drive files -> Dataset of taxi points."""
    return files.map_batches(parse_tdrive_batch, batch_format="pyarrow", batch_size=None)


def read_geolife_table(files):
    """Dataset of whole ``.plt`` files -> Dataset of track points."""
    return files.map_batches(
        parse_geolife_batch, batch_format="pyarrow", batch_size=None
    )


def read_geolife_tracks(files):
    """Dataset of whole ``.plt`` files -> one track-summary row per
    file.  Batch = whole files, so the summary is batch-local."""

    def f(batch: pa.Table) -> pa.Table:
        return geolife_track_summary(parse_geolife_batch(batch))

    return files.map_batches(f, batch_format="pyarrow", batch_size=None)


def read_gdelt_table(files, include_supplemental: bool = True):
    """Dataset of whole GDELT export files -> Dataset of events."""

    def f(batch: pa.Table) -> pa.Table:
        return parse_gdelt_batch(batch, include_supplemental=include_supplemental)

    return files.map_batches(f, batch_format="pyarrow", batch_size=None)
