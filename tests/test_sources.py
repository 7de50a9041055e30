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
