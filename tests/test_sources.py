import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from geowave_ray import fixtures
from geowave_ray.sources.pages import read_pages


@pytest.fixture(scope="module")
def small_pages(ray_session):
    return fixtures.gen_pages_slice(0, 300, 300)


def test_read_pages_parquet(tmp_path, small_pages):
    p = str(tmp_path / "p.parquet")
    pq.write_table(small_pages, p)
    ds = read_pages(p, fmt="parquet")
    df = ds.to_pandas()
    assert len(df) == 300
    # text byte-identical through normalization
    src = dict(zip(small_pages["url"].to_pylist(), small_pages["text"].to_pylist()))
    for u, t in zip(df["url"], df["text"]):
        assert t == src[u]


def test_read_pages_json(tmp_path, small_pages):
    p = str(tmp_path / "p.jsonl")
    with open(p, "w") as f:
        for i in range(small_pages.num_rows):
            row = {
                "url": small_pages["url"][i].as_py(),
                "warc_ts": str(small_pages["warc_ts"][i].as_py()),
                "html": small_pages["html"][i].as_py().decode(),
                "text": small_pages["text"][i].as_py(),
                "lang": small_pages["lang"][i].as_py(),
            }
            f.write(json.dumps(row) + "\n")
    ds = read_pages(p, fmt="json")
    df = ds.to_pandas()
    assert len(df) == 300
    assert set(df["url"]) == set(small_pages["url"].to_pylist())
    # timestamps parsed to us timestamps
    assert str(df["warc_ts"].dtype).startswith("datetime64")


def test_read_pages_unknown_format():
    with pytest.raises(ValueError):
        read_pages("/nowhere", fmt="avro")


def test_attribute_index_prunes_and_matches(tmp_path, ray_session):
    from geowave_ray.sources.attribute_index import (
        build_attribute_index,
        query_attribute_range,
        row_groups_scanned,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.01/lineitem.parquet")
    idx = build_attribute_index(ds, "l_extendedprice", str(tmp_path / "byprice"),
                                rows_per_group=5000)
    lo, hi = 10_000.0, 20_000.0
    got = query_attribute_range(idx, "l_extendedprice", lo, hi).to_pandas()
    full = ds.to_pandas()
    expect = full[(full.l_extendedprice >= lo) & (full.l_extendedprice <= hi)]
    assert len(got) == len(expect)
    assert got["l_extendedprice"].between(lo, hi).all()
    # the sorted layout prunes: a narrow range touches < half the groups
    m, t = row_groups_scanned(idx, "l_extendedprice", lo, hi)
    assert t >= 4 and m < t


def test_gpx_parse_roundtrip(ray_session):
    """Parsed trkpts match the generator truth table exactly (float
    round-trip through the printed text is the identity)."""
    import pandas as pd
    import ray.data

    from geowave_ray.fixtures import gen_gpx_files
    from geowave_ray.sources.gpx import read_gpx_table

    files, points = gen_gpx_files(8)
    got = (
        read_gpx_table(ray.data.from_arrow(files))
        .to_pandas()
        .sort_values(["track_id", "seq"])
        .reset_index(drop=True)
    )
    exp = points.to_pandas().sort_values(["track_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_tdrive_parse_roundtrip(ray_session):
    """Valid lines round-trip exactly; wrong-field-count lines skipped;
    bad timestamps kept at epoch 0 (TdriveIngestPlugin.java:100-105)."""
    import pandas as pd
    import ray.data

    from geowave_ray.fixtures import gen_tdrive_files
    from geowave_ray.sources.delimited import read_tdrive_table

    files, points = gen_tdrive_files(6)
    got = (
        read_tdrive_table(ray.data.from_arrow(files))
        .to_pandas()
        .sort_values(["taxiid", "pointinstance"])
        .reset_index(drop=True)
    )
    exp = points.to_pandas().sort_values(["taxiid", "pointinstance"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # one epoch-0 row per file (the bad-timestamp line is KEPT)
    assert (got["ts"] == pd.Timestamp(0)).sum() == 6


def test_tdrive_validate():
    from geowave_ray.sources.delimited import tdrive_validate

    assert tdrive_validate("1,2008-02-02 13:30:00,116.1,39.9\nmore")
    assert not tdrive_validate("<gpx></gpx>")


def test_geolife_parse_roundtrip(ray_session):
    """Header self-skips via the 7-field rule; -777 altitude -> null;
    per-file track summaries match."""
    import pandas as pd
    import ray.data

    from geowave_ray.fixtures import gen_geolife_files
    from geowave_ray.sources.delimited import read_geolife_table, read_geolife_tracks

    files, points, tracks = gen_geolife_files(5)
    got = (
        read_geolife_table(ray.data.from_arrow(files))
        .to_pandas()
        .sort_values(["trackid", "pointinstance"])
        .reset_index(drop=True)
    )
    exp = points.to_pandas().sort_values(["trackid", "pointinstance"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert got["elevation"].isna().any()

    got_t = (
        read_geolife_tracks(ray.data.from_arrow(files))
        .to_pandas()
        .sort_values("trackid")
        .reset_index(drop=True)
    )
    exp_t = tracks.to_pandas().sort_values("trackid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_t, exp_t)


def test_geolife_wrap_to_range():
    import numpy as np

    from geowave_ray.sources.delimited import wrap_to_range

    # expectations traced through GeometryUtils.java:850-865 by hand —
    # the reference's loop-around maps the exact bounds to their
    # opposite edge (180 -> -180, -180 -> 180)
    lon = np.array([181.0, -181.0, 0.0, 540.0, -180.0, 180.0, 17.5])
    out = wrap_to_range(lon, -180.0, 180.0)
    assert np.allclose(out, [-179.0, 179.0, 0.0, -180.0, 180.0, -180.0, 17.5])


def test_gdelt_parse_roundtrip(ray_session):
    """57/58-column layouts, geo-type-0 / empty-lat drops, empty
    optional strings -> null all match the truth table."""
    import pandas as pd
    import ray.data

    from geowave_ray.fixtures import gen_gdelt_files
    from geowave_ray.sources.delimited import read_gdelt_table

    files, events = gen_gdelt_files(3)
    got = (
        read_gdelt_table(ray.data.from_arrow(files))
        .to_pandas()
        .sort_values("eventid")
        .reset_index(drop=True)
    )
    exp = events.to_pandas().sort_values("eventid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # supplemental off drops exactly the six extra columns
    got_min = read_gdelt_table(
        ray.data.from_arrow(files), include_supplemental=False
    ).schema()
    assert "numMentions" not in got_min.names and "eventid" in got_min.names


def test_twitter_parse_roundtrip(ray_session):
    """Valid tweets round-trip exactly; coordinate/date/required-field
    failures drop exactly the reference's lines; malformed JSON lines
    take the per-line fallback without losing neighbors."""
    import pandas as pd
    import ray.data

    from geowave_ray.fixtures import gen_twitter_files
    from geowave_ray.sources.twitter import read_twitter_table, twitter_validate

    files, tweets = gen_twitter_files(5)
    got = (
        read_twitter_table(ray.data.from_arrow(files))
        .to_pandas()
        .sort_values("tweet_id")
        .reset_index(drop=True)
    )
    exp = tweets.to_pandas().sort_values("tweet_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # fixture really exercised the skip rules and nullable defaults
    assert len(exp) < 5 * 40
    assert (exp["in_reply_to_user_id"] == "").any()
    assert (exp["lang"] == "").any()
    assert twitter_validate("20130401-130000.txt.gz")
    assert not twitter_validate("tweets.json")


def test_stanag_parser_skips_non_point_items_and_namespaces():
    import numpy as np
    import pyarrow as pa

    from geowave_ray.sources.stanag4676 import parse_stanag_batch

    XSI = "http://www.w3.org/2001/XMLSchema-instance"
    # namespaced document, one identity item, one point missing
    # optional fields (elevation/speed/course/type absent)
    doc = (
        f'<ns:TrackMessage xmlns:ns="urn:nato:stanag4676" xmlns:xsi="{XSI}">'
        "<ns:tracks><ns:trackNumber>TN1</ns:trackNumber>"
        "<ns:trackUUID>u-1</ns:trackUUID>"
        '<ns:items xsi:type="TrackIdentityInformation">'
        "<ns:identity>HOSTILE</ns:identity></ns:items>"
        '<ns:items xsi:type="TrackPoint">'
        "<ns:trackItemUUID>p-1</ns:trackItemUUID>"
        "<ns:trackItemTime>2024-06-01T00:00:05Z</ns:trackItemTime>"
        "<ns:trackPointPosition><ns:latitude>12.5</ns:latitude>"
        "<ns:longitude>-33.25</ns:longitude></ns:trackPointPosition>"
        "</ns:items>"
        "<ns:items>"  # untyped item WITH a position -> parsed (decoder fallback)
        "<ns:trackItemUUID>p-2</ns:trackItemUUID>"
        "<ns:trackItemTime>2024-06-01T00:00:35Z</ns:trackItemTime>"
        "<ns:trackPointPosition><ns:latitude>12.6</ns:latitude>"
        "<ns:longitude>-33.20</ns:longitude>"
        "<ns:elevation>100.5</ns:elevation></ns:trackPointPosition>"
        "<ns:trackPointSpeed>7.5</ns:trackPointSpeed>"
        "<ns:trackPointCourse>270.0</ns:trackPointCourse>"
        "<ns:trackPointType>MEASURED</ns:trackPointType>"
        "</ns:items>"
        "</ns:tracks></ns:TrackMessage>"
    )
    out = parse_stanag_batch(pa.table({"xml": pa.array([doc])}))
    assert len(out) == 2
    assert out.column("point_uuid").to_pylist() == ["p-1", "p-2"]
    assert out.column("track_number").to_pylist() == ["TN1", "TN1"]
    assert out.column("lon").to_pylist() == [-33.25, -33.20]
    assert np.isnan(out.column("elevation").to_pylist()[0])
    assert out.column("elevation").to_pylist()[1] == 100.5
    assert out.column("speed").to_pylist()[1] == 7.5
    assert out.column("point_type").to_pylist() == ["", "MEASURED"]
    assert str(out.column("ts").to_pylist()[0]) == "2024-06-01 00:00:05"
