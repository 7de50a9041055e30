"""Pure-Python Avro object-container codec (sources/avro_io.py — the
core/ingest whole-file staging role, AbstractStageWholeFileToAvro +
GeoWaveAvroFormatPlugin). Golden vectors are the byte examples printed
in the published Avro specification, hand-packed independently of the
module's own writer."""

import zlib

import pyarrow as pa
import pytest

from geowave_ray.sources import avro_io as av


# -- spec golden vectors ----------------------------------------------------


def test_zigzag_varint_spec_examples():
    # Avro spec "Binary Encoding" table: value -> hex bytes
    cases = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
    }
    for val, enc in cases.items():
        out = bytearray()
        av._write_long(out, val)
        assert bytes(out) == enc, val
        got, pos = av._read_long(enc, 0)
        assert got == val and pos == len(enc)


def test_string_spec_example():
    # spec: "foo" -> 06 66 6f 6f
    out = bytearray()
    av._encode_value(out, "string", "foo")
    assert bytes(out) == b"\x06foo"
    got, pos = av._decode_value(b"\x06foo", 0, "string")
    assert got == "foo" and pos == 4


def test_record_spec_example():
    # spec "Binary Encoding" record example:
    # {"a": 27, "b": "foo"} with fields a:long, b:string -> 36 06 66 6f 6f
    schema = {
        "type": "record",
        "name": "test",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    out = bytearray()
    av._encode_value(out, schema, {"a": 27, "b": "foo"})
    assert bytes(out) == b"\x36\x06foo"
    rec, pos = av._decode_value(b"\x36\x06foo", 0, schema)
    assert rec == {"a": 27, "b": "foo"} and pos == 5


def test_array_spec_example():
    # spec: array<long> [3, 27] -> 04 06 36 00
    schema = {"type": "array", "items": "long"}
    out = bytearray()
    av._encode_value(out, schema, [3, 27])
    assert bytes(out) == b"\x04\x06\x36\x00"
    got, _ = av._decode_value(b"\x04\x06\x36\x00", 0, schema)
    assert got == [3, 27]


def test_array_negative_count_block_form():
    # spec: a block may use a NEGATIVE count followed by the byte size
    schema = {"type": "array", "items": "long"}
    # [3, 27] as one block: count=-2 (03), size=2 bytes (04), 06 36, end 00
    buf = b"\x03\x04\x06\x36\x00"
    got, pos = av._decode_value(buf, 0, schema)
    assert got == [3, 27] and pos == len(buf)


def test_union_spec_example():
    # spec: union ["null","string"]: null -> 00 ; "a" -> 02 02 61
    schema = ["null", "string"]
    out = bytearray()
    av._encode_value(out, schema, None)
    assert bytes(out) == b"\x00"
    out = bytearray()
    av._encode_value(out, schema, "a")
    assert bytes(out) == b"\x02\x02a"
    assert av._decode_value(b"\x00", 0, schema)[0] is None
    assert av._decode_value(b"\x02\x02a", 0, schema)[0] == "a"


def test_map_enum_fixed_roundtrip():
    m_schema = {"type": "map", "values": "long"}
    out = bytearray()
    av._encode_value(out, m_schema, {"x": 1, "y": -2})
    got, _ = av._decode_value(bytes(out), 0, m_schema)
    assert got == {"x": 1, "y": -2}
    e_schema = {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}
    out = bytearray()
    av._encode_value(out, e_schema, "C")
    assert bytes(out) == b"\x04"
    assert av._decode_value(b"\x04", 0, e_schema)[0] == "C"
    f_schema = {"type": "fixed", "name": "F", "size": 3}
    out = bytearray()
    av._encode_value(out, f_schema, b"abc")
    assert bytes(out) == b"abc"


# -- container files --------------------------------------------------------

SCHEMA = {
    "type": "record",
    "name": "Feature",
    "fields": [
        {"name": "fid", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "w", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}

RECS = [
    {"fid": 1, "name": "a", "w": 0.5, "tags": ["x", "y"]},
    {"fid": -7, "name": None, "w": -1.25, "tags": []},
    {"fid": 2**40, "name": "é中", "w": 3.0, "tags": ["z"]},
]


def test_container_header_layout():
    data = av.write_container(RECS, SCHEMA, codec="null")
    assert data[:4] == b"Obj\x01"
    recs, schema = av.read_container(data)
    assert recs == RECS and schema == SCHEMA


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_codecs(codec):
    data = av.write_container(RECS * 50, SCHEMA, codec=codec, rows_per_block=16)
    recs, _ = av.read_container(data)
    assert recs == RECS * 50


def test_deflate_is_raw_rfc1951():
    # spec: deflate codec is RAW deflate (no zlib header/checksum)
    data = av.write_container(RECS, SCHEMA, codec="deflate")
    # find the first block payload: after header map + sync
    recs, _ = av.read_container(data)
    assert recs == RECS
    # a zlib-wrapped payload would start with 0x78; raw streams
    # decompress only with wbits=-15 — prove the writer used raw by
    # re-reading with the module (already done) and by checking that
    # zlib.decompress without -15 fails on the block region
    sync_at = data.index(b"Obj\x01") + 4
    # walk the metadata map to find sync + first block
    pos = sync_at
    n, pos = av._read_long(data, pos)
    for _ in range(n):
        _, pos = av._read_bytes(data, pos)
        _, pos = av._read_bytes(data, pos)
    zero, pos = av._read_long(data, pos)
    assert zero == 0
    pos += 16  # sync
    _, pos = av._read_long(data, pos)  # count
    size, pos = av._read_long(data, pos)
    payload = data[pos:pos + size]
    with pytest.raises(zlib.error):
        zlib.decompress(payload)  # zlib-wrapped parse must fail
    assert zlib.decompress(payload, -15)  # raw parse succeeds


def test_sync_marker_corruption_detected():
    data = bytearray(av.write_container(RECS, SCHEMA))
    data[-1] ^= 0xFF  # flip a byte of the trailing sync copy
    with pytest.raises(ValueError, match="sync"):
        av.read_container(bytes(data))


def test_empty_container():
    data = av.write_container([], SCHEMA)
    recs, schema = av.read_container(data)
    assert recs == [] and schema == SCHEMA


# -- Arrow bridge -----------------------------------------------------------


def test_table_roundtrip_exact():
    t = pa.table(
        {
            "i": pa.array([1, None, 3], pa.int64()),
            "f": pa.array([0.1, 2.5, None], pa.float64()),
            "s": pa.array(["a", None, "c"], pa.string()),
            "b": pa.array([b"\x00\xff", None, b""], pa.binary()),
            "l": pa.array([[1, 2], [], None], pa.list_(pa.int64())),
        }
    )
    back = av.avro_to_table(av.table_to_avro(t, codec="deflate"))
    # nullable lists come back as empty-vs-null normalized by the union
    assert back.column("i").to_pylist() == [1, None, 3]
    assert back.column("f").to_pylist() == [0.1, 2.5, None]
    assert back.column("s").to_pylist() == ["a", None, "c"]
    assert back.column("b").to_pylist() == [b"\x00\xff", None, b""]
    assert back.column("l").to_pylist() == [[1, 2], [], None]


def test_doubles_bit_exact():
    import struct as _s

    vals = [0.1, -0.0, 1e308, 2**-1074, 3.141592653589793]
    t = pa.table({"x": pa.array(vals, pa.float64())})
    back = av.avro_to_table(av.table_to_avro(t))
    for a, b in zip(vals, back.column("x").to_pylist()):
        assert _s.pack("<d", a) == _s.pack("<d", b)


# -- whole-file staging -----------------------------------------------------


def test_whole_file_staging_roundtrip():
    files = [("dir/a.gpx", b"<gpx>A</gpx>"), ("dir/b.gpx", b"\x00\x01\x02" * 100)]
    staged = av.stage_whole_files(files, codec="deflate")
    back = av.read_staged_files(staged)
    assert back.column("path").to_pylist() == ["dir/a.gpx", "dir/b.gpx"]
    assert back.column("payload").to_pylist() == [b for _, b in files]


def test_parse_avro_batch_fans_out():
    data1 = av.write_container(RECS, SCHEMA)
    data2 = av.write_container(RECS[:1], SCHEMA, codec="deflate")
    batch = pa.table(
        {
            "file_id": pa.array(["f1", "f2"], pa.string()),
            "avro": pa.array([data1, data2], pa.binary()),
        }
    )
    out = av.parse_avro_batch(batch)
    assert out.num_rows == 4
    assert out.column("file_id").to_pylist() == ["f1"] * 3 + ["f2"]
    assert out.column("fid").to_pylist() == [1, -7, 2**40, 1]


def test_fixture_truth_matches_reader():
    from geowave_ray.fixtures import gen_avro_files

    files, truth = gen_avro_files(12)
    batch = files.rename_columns(["file_id", "avro"])
    out = av.parse_avro_batch(batch)
    assert out.num_rows == truth.num_rows
    assert out.column("fid").to_pylist() == truth.column("fid").to_pylist()
    assert out.column("lon").to_pylist() == truth.column("lon").to_pylist()
    got_tags = [",".join(v) for v in out.column("tags").to_pylist()]
    assert got_tags == truth.column("tags_csv").to_pylist()


def test_whole_file_schema_matches_reference_avsc():
    """ADVICE r4: the staged container's embedded writer schema must
    match the reference's wholefile.avsc (record name AvroWholeFile,
    namespace, originalFile first, nullable path union) so a reference
    SpecificDatumReader accepts it; a null path must survive."""
    import json

    assert av.WHOLE_FILE_SCHEMA["name"] == "AvroWholeFile"
    assert (av.WHOLE_FILE_SCHEMA["namespace"]
            == "org.locationtech.geowave.core.ingest.avro")
    assert [f["name"] for f in av.WHOLE_FILE_SCHEMA["fields"]] == [
        "originalFile", "originalFilePath",
    ]
    assert av.WHOLE_FILE_SCHEMA["fields"][1]["type"] == ["string", "null"]
    ref = json.load(open(
        "/root/reference/core/ingest/src/main/avro/wholefile.avsc"
    ))
    assert ref["name"] == av.WHOLE_FILE_SCHEMA["name"]
    assert ref["namespace"] == av.WHOLE_FILE_SCHEMA["namespace"]
    assert [f["name"] for f in ref["fields"]] == [
        f["name"] for f in av.WHOLE_FILE_SCHEMA["fields"]
    ]
    assert [f["type"] for f in ref["fields"]] == [
        f["type"] for f in av.WHOLE_FILE_SCHEMA["fields"]
    ]
    # the embedded schema in a staged container is the same record
    staged = av.stage_whole_files([("p", b"x")])
    _, schema = av.read_container(staged)
    assert schema["name"] == "AvroWholeFile"
    # null path branch of the union roundtrips
    recs = [{"originalFile": b"abc", "originalFilePath": None}]
    data = av.write_container(recs, av.WHOLE_FILE_SCHEMA)
    back, _ = av.read_container(data)
    assert back == recs
