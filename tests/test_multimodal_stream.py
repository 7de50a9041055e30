import numpy as np
import pyarrow as pa
import pytest

import ray.data

from geowave_ray import fixtures


@pytest.fixture(scope="module")
def pages(ray_session):
    return fixtures.gen_pages_slice(0, 500, 500)


def test_binary_meta(pages, ray_session):
    from geowave_ray.multimodal import binary_meta_batch

    ds = ray.data.from_arrow(pages)
    out = ds.map_batches(binary_meta_batch, batch_format="pyarrow").to_pandas()
    htmls = pages["html"].to_pylist()
    expect = {u: len(h) for u, h in zip(pages["url"].to_pylist(), htmls)}
    got = dict(zip(out["url"], out["n_bytes"]))
    assert got == expect


def test_decoder_fake_plumbing(pages, ray_session):
    from geowave_ray.multimodal import decode_features

    ds = ray.data.from_arrow(pages)
    out = decode_features(ds, concurrency=2).to_pandas()
    assert len(out) == pages.num_rows
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (pages.num_rows, 16)
    # histogram features are normalized
    assert np.allclose(feats.sum(axis=1), 1.0)
    # deterministic
    out2 = decode_features(ray.data.from_arrow(pages), concurrency=2).to_pandas()
    m1 = dict(zip(out["url"], map(tuple, out["feature"])))
    m2 = dict(zip(out2["url"], map(tuple, out2["feature"])))
    assert m1 == m2


def test_decoder_real_is_marked_stub():
    from geowave_ray.multimodal import BinaryDecoder

    with pytest.raises(NotImplementedError):
        BinaryDecoder(decoder="real")


def test_sample_chunks(pages, ray_session):
    from geowave_ray.multimodal import sample_chunks

    ds = ray.data.from_arrow(pages)
    out = sample_chunks(ds, chunk_bytes=32, every_n=2).to_pandas()
    htmls = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))
    for _, row in out.head(50).iterrows():
        p = htmls[row["url"]]
        ci = row["chunk_idx"]
        assert bytes(row["chunk"]) == p[ci * 32 : (ci + 1) * 32]
        assert ci % 2 == 0


def test_incremental_stats_actor(ray_session):
    from geowave_ray.state.stream import IncrementalStats

    st = IncrementalStats(n_buckets=3)
    rng = np.random.default_rng(0)
    all_vals = []
    all_users = []
    for i in range(10):
        vals = rng.normal(50, 10, 200)
        users = [f"u{v}" for v in rng.integers(0, 500, 200)]
        all_vals.extend(vals)
        all_users.extend(users)
        batch = pa.table({"value": pa.array(vals), "user": pa.array(users)})
        st.ingest_batch(batch, numeric_cols=("value",), distinct_cols=("user",))
    snap = st.snapshot()
    assert snap["count"] == 2000
    assert abs(snap["numeric"]["value"]["min"] - min(all_vals)) < 1e-12
    assert abs(snap["numeric"]["value"]["sum"] - sum(all_vals)) < 1e-6
    true_distinct = len(set(all_users))
    assert abs(snap["hll_estimate"]["user"] - true_distinct) / true_distinct < 0.1
