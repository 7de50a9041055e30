"""Property-based roundtrip invariants for the two round-4 wire codecs
(hypothesis): Avro object containers (sources/avro_io.py) and GeoTIFF
(sources/geotiff.py). The golden-vector tests pin the byte layout to
the published specs; these pin the ALGEBRA — encode∘decode == identity
over randomized values, shapes, codecs and layout knobs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_ray.sources import avro_io as av
from geowave_ray.sources.geotiff import read_geotiff, write_geotiff

# -- Avro ---------------------------------------------------------------------

_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(_longs)
@settings(max_examples=300, deadline=None)
def test_varint_roundtrip_full_int64(v):
    out = bytearray()
    av._write_long(out, v)
    got, pos = av._read_long(bytes(out), 0)
    assert got == v and pos == len(out)


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "fid": _longs,
                "name": st.one_of(st.none(), st.text(max_size=40)),
                "w": st.floats(allow_nan=False, width=64),
                "tags": st.lists(st.text(max_size=10), max_size=5),
                "blob": st.binary(max_size=64),
                "flag": st.booleans(),
            }
        ),
        max_size=40,
    ),
    st.sampled_from(["null", "deflate"]),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=60, deadline=None)
def test_container_roundtrip_random(records, codec, rows_per_block):
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "fid", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "w", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "blob", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
        ],
    }
    data = av.write_container(
        records, schema, codec=codec, rows_per_block=rows_per_block
    )
    back, back_schema = av.read_container(data)
    assert back_schema == schema
    assert back == records


@given(st.lists(st.tuples(st.text(max_size=30), st.binary(max_size=200)),
                max_size=12))
@settings(max_examples=40, deadline=None)
def test_whole_file_staging_roundtrip_random(files):
    staged = av.stage_whole_files(files)
    t = av.read_staged_files(staged)
    assert t.column("path").to_pylist() == [p for p, _ in files]
    assert t.column("payload").to_pylist() == [b for _, b in files]


# -- GeoTIFF ------------------------------------------------------------------

_DTYPES = [np.uint8, np.uint16, np.int16, np.int32, np.float64]


@given(
    st.integers(min_value=0, max_value=4),  # dtype index
    st.sampled_from(["none", "deflate", "packbits", "lzw"]),
    st.integers(min_value=1, max_value=3),   # bands
    st.integers(min_value=1, max_value=21),  # width
    st.integers(min_value=1, max_value=17),  # height
    st.one_of(st.none(), st.integers(min_value=1, max_value=9)),  # strip h
    st.booleans(),  # predictor (ignored for float)
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
)
@settings(max_examples=60, deadline=None)
def test_geotiff_roundtrip_random(di, comp, bands, w, h, rps, pred, seed):
    dt = _DTYPES[di]
    rng = np.random.default_rng(seed)
    if np.issubdtype(dt, np.floating):
        px = rng.standard_normal((bands, h, w)).astype(dt)
        pred = False
    else:
        info = np.iinfo(dt)
        px = rng.integers(
            info.min, info.max, size=(bands, h, w), endpoint=True
        ).astype(dt)
    if comp == "none":
        pred = False
    bbox = (-10.0, 20.0, -10.0 + w * 0.25, 20.0 + h * 0.25)
    data = write_geotiff(
        px, bbox, epsg=4326, compression=comp, rows_per_strip=rps,
        predictor=pred,
    )
    t = read_geotiff(data, "f")
    assert t.num_rows == 1
    assert t.column("width")[0].as_py() == w
    assert t.column("height")[0].as_py() == h
    assert t.column("bands")[0].as_py() == bands
    got = np.asarray(t.column("pixels")[0].as_py(), np.float64)
    want = px.astype(np.float64).reshape(-1)
    assert np.array_equal(got, want)
