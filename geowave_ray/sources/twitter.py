"""Twitter JSON-lines format plugin.

The reference parses gzipped tweet dumps line by line with a JSON
reader (``extensions/formats/twitter/TwitterIngestPlugin.java:155-260``,
``TwitterUtils.java:29-99``), emitting one point feature per tweet and
skipping lines where the coordinates or the ``created_at`` date fail
to parse (each ``continue`` in the reference loop).  Here a batch row
carries one whole dump file; ALL lines of ALL files in the batch are
parsed in one ``pyarrow.json.read_json`` call against an explicit
schema (vectorized, no per-line Python), and the reference's
skip rules become Arrow validity masks:

* ``coordinates.coordinates[0/1]`` unreadable -> line dropped
  (plugin:176-194)
* ``created_at`` missing or unparseable against
  ``EEE MMM dd HH:mm:ss Z yyyy`` -> dropped (plugin:199-210;
  ``TwitterUtils.parseDate``)
* required ``id_str`` / ``user.id_str`` / ``user.name`` / ``text`` /
  ``retweet_count`` missing -> dropped (the catch-all ``continue``,
  plugin:249-252)
* nullable ``in_reply_to_user_id_str`` / ``in_reply_to_status_id_str``
  / ``lang`` -> empty string (plugin:145-146,221-233)

Divergence (documented): a line that is not valid JSON at all makes
the reference log-and-skip that line; ``pyarrow.json`` aborts the
whole buffer instead, so on parse failure the batch falls back to
per-file, then per-line parsing — identical output, slow path only
for corrupt files.
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj

TWITTER_DATE_FORMAT = "%a %b %d %H:%M:%S %z %Y"

_TWEET_SCHEMA = pa.schema(
    [
        ("id_str", pa.string()),
        ("created_at", pa.string()),
        (
            "coordinates",
            pa.struct(
                [("type", pa.string()), ("coordinates", pa.list_(pa.float64()))]
            ),
        ),
        ("user", pa.struct([("id_str", pa.string()), ("name", pa.string())])),
        ("text", pa.string()),
        ("in_reply_to_user_id_str", pa.string()),
        ("in_reply_to_status_id_str", pa.string()),
        ("retweet_count", pa.int64()),
        ("lang", pa.string()),
    ]
)

_PARSE = pj.ParseOptions(
    explicit_schema=_TWEET_SCHEMA, unexpected_field_behavior="ignore"
)


def twitter_validate(file_name: str) -> bool:
    """File-name validation (``TwitterUtils.validate:93-97``):
    ``YYYYMMDD-HHMMSS.txt.gz``."""
    import re

    return re.fullmatch(r"\d{8}-\d{6}\.txt\.gz", file_name.lower()) is not None


def _read_lines(buf: bytes) -> pa.Table:
    """One vectorized JSON parse; on malformed input fall back to
    per-line parsing (keeping valid lines, like the reference's
    per-line try/catch)."""
    try:
        return pj.read_json(io.BytesIO(buf), parse_options=_PARSE)
    except pa.ArrowInvalid:
        good = []
        import json

        for line in buf.split(b"\n"):
            if not line.strip():
                continue
            try:
                json.loads(line)
                good.append(line)
            except ValueError:
                continue
        if not good:
            return _TWEET_SCHEMA.empty_table()
        return pj.read_json(io.BytesIO(b"\n".join(good)), parse_options=_PARSE)


def parse_twitter_batch(
    batch: pa.Table, content_col: str = "content", file_col: str = "file_id"
) -> pa.Table:
    """Whole tweet-dump files -> point features
    (tweet_id, user_id, user_name, text, in_reply_to_user_id,
    in_reply_to_status_id, retweet_count, lang, dtg, lon, lat)."""
    content = batch.column(content_col)
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    bufs = []
    for v in content:
        s = v.as_py()
        if s:
            bufs.append(s.encode() if isinstance(s, str) else s)
    t = _read_lines(b"\n".join(bufs)) if bufs else _TWEET_SCHEMA.empty_table()

    coords = pc.struct_field(t.column("coordinates"), "coordinates")
    lon = pc.list_element(coords, 0) if len(t) else pa.array([], pa.float64())
    lat = pc.list_element(coords, 1) if len(t) else pa.array([], pa.float64())
    dtg = pc.strptime(
        pc.fill_null(t.column("created_at"), ""),
        format=TWITTER_DATE_FORMAT,
        unit="us",
        error_is_null=True,
    )
    # tz-aware -> naive UTC (the parse is always-UTC offset text)
    dtg = pc.cast(dtg, pa.timestamp("us"))

    user_id = pc.struct_field(t.column("user"), "id_str")
    user_name = pc.struct_field(t.column("user"), "name")
    required = [
        t.column("id_str"),
        user_id,
        user_name,
        t.column("text"),
        t.column("retweet_count"),
    ]
    ok = pc.and_(lon.is_valid(), pc.and_(lat.is_valid(), dtg.is_valid()))
    for col in required:
        ok = pc.and_(ok, col.is_valid())
    m = np.asarray(ok)

    def f(arr):
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        return a.filter(pa.array(m))

    return pa.table(
        {
            "tweet_id": f(t.column("id_str")),
            "user_id": f(user_id),
            "user_name": f(user_name),
            "text": f(t.column("text")),
            "in_reply_to_user_id": pc.fill_null(
                f(t.column("in_reply_to_user_id_str")), ""
            ),
            "in_reply_to_status_id": pc.fill_null(
                f(t.column("in_reply_to_status_id_str")), ""
            ),
            "retweet_count": f(t.column("retweet_count")),
            "lang": pc.fill_null(f(t.column("lang")), ""),
            "dtg": f(dtg),
            "lon": f(lon),
            "lat": f(lat),
        }
    )


def read_twitter_table(files):
    """Dataset of whole tweet-dump files -> Dataset of tweet points."""
    return files.map_batches(
        parse_twitter_batch, batch_format="pyarrow", batch_size=None
    )
