"""Golden expected-results regression tests — the reference's
pre-filtered expected-shapefile pattern
(``AbstractGeoWaveBasicVectorIT.java:94-205``: assert exact count +
hash of the result set): the sf0.001 spatial-join output is frozen as
a count + sha256 over the sorted pair set. Any change to the geotag
derivation, cell encoding, PIP kernel, or join plan that alters even
one pair fails here.
"""

import hashlib

import pytest

GOLDEN_SF0001_PAIRS = 17647
GOLDEN_SF0001_SHA256 = "19c6a21935def33d2c321c5336138469e3527b66f47ec1126016544fc5e62411"


def test_pip_join_golden_sf0001(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    df = em.q_pip_join("/root/testdata/sf0.001").to_pandas()
    pairs = sorted(zip(df["url"], df["region_id"]))
    assert len(pairs) == GOLDEN_SF0001_PAIRS
    h = hashlib.sha256("\n".join(f"{u}|{r}" for u, r in pairs).encode()).hexdigest()
    assert h == GOLDEN_SF0001_SHA256


def test_text_byte_identical_through_join(ray_session):
    """BASELINE.json input_hint invariant: text flows through the
    engine untouched — verified through a full join round-trip."""
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em
    from geowave_ray.fixtures import ensure_fixtures
    from geowave_ray.pipelines.spatial_join import broadcast_pip_join

    sf = "/root/testdata/sf0.001"
    pairs = broadcast_pip_join(
        em._pages(sf, columns=["row_id", "url", "lang", "text"]),
        em._regions_table(sf),
        keep_cols=("url", "text"),
    ).to_pandas()
    src = pq.read_table(f"{ensure_fixtures(sf)}/pages", columns=["url", "text"])
    expected = dict(zip(src["url"].to_pylist(), src["text"].to_pylist()))
    for u, t in zip(pairs["url"], pairs["text"]):
        assert t == expected[u]
