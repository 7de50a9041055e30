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
