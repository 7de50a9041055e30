"""Spool-of-Avro-segments streaming ingest (sources/kafka_spool.py —
the core/ingest/kafka role: StageToKafkaDriver producer,
IngestFromKafkaDriver consumer loop with batchSize cadence and
offset-commit exactly-once)."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geowave_ray.sources import kafka_spool as ks
from geowave_ray.sources.avro_io import read_container
from geowave_ray.sources.gpx import parse_gpx_batch


def _gpx_xml(tid: str, n: int) -> bytes:
    pts = "".join(
        f'<trkpt lat="{10 + i * 0.01}" lon="{20 + i * 0.01}">'
        f"<ele>{100 + i}</ele><time>2024-01-01T00:{i:02d}:00Z</time></trkpt>"
        for i in range(n)
    )
    return (
        f'<gpx><trk><name>{tid}</name><trkseg>{pts}</trkseg></trk></gpx>'
    ).encode()


def _mk_parse():
    # nested so cloudpickle ships it by VALUE (test modules aren't
    # importable from Ray workers)
    def parse(b: pa.Table) -> pa.Table:
        unstaged = pa.table(
            {
                "file_id": b.column("path"),
                "xml": pa.array(
                    [p.as_py().decode() for p in b.column("payload")],
                    pa.string(),
                ),
            }
        )
        return parse_gpx_batch(unstaged)

    return parse


_parse = _mk_parse()


def test_producer_segments_are_immutable_containers(tmp_path):
    topic = str(tmp_path / "topic")
    with ks.SpoolProducer(topic, records_per_segment=3) as prod:
        for i in range(8):
            prod.send_file(f"f{i}.gpx", _gpx_xml(f"t{i}", 2))
    segs = ks.list_segments(topic)
    assert [os.path.basename(s) for s in segs] == [
        "seg-00000000.avro", "seg-00000001.avro", "seg-00000002.avro",
    ]
    counts = [len(read_container(open(s, "rb").read())[0]) for s in segs]
    assert counts == [3, 3, 2]
    # appending later files starts a NEW segment (immutability)
    ks.stage_directory_to_topic([], topic)
    with ks.SpoolProducer(topic) as prod:
        prod.send_file("f9.gpx", b"<gpx/>")
    assert os.path.basename(ks.list_segments(topic)[-1]) == "seg-00000003.avro"


def test_segment_rows_block_headers_only(tmp_path):
    topic = str(tmp_path / "topic")
    with ks.SpoolProducer(topic, records_per_segment=100, codec="deflate") as p:
        for i in range(7):
            p.send_file(f"f{i}", b"x" * (i + 1))
    seg = ks.list_segments(topic)[0]
    assert ks._segment_rows(seg) == 7


def test_poll_offsets_cross_segments(tmp_path):
    topic = str(tmp_path / "topic")
    with ks.SpoolProducer(topic, records_per_segment=4) as p:
        for i in range(10):
            p.send_file(f"f{i}", b"z")
    off = {"segment_seq": 0, "record": 0, "polls": 0}
    slices, off = ks.poll(topic, off, max_records=6)
    assert [(os.path.basename(s), a, b) for s, a, b in slices] == [
        ("seg-00000000.avro", 0, 4), ("seg-00000001.avro", 0, 2),
    ]
    assert (off["segment_seq"], off["record"]) == (1, 2)
    slices, off = ks.poll(topic, off, max_records=6)
    assert [(os.path.basename(s), a, b) for s, a, b in slices] == [
        ("seg-00000001.avro", 2, 4), ("seg-00000002.avro", 0, 2),
    ]
    assert (off["segment_seq"], off["record"]) == (3, 0)
    slices, off2 = ks.poll(topic, off, max_records=6)
    assert slices == [] and off2 == off


def test_consume_to_store_end_to_end(tmp_path, ray_session):
    topic = str(tmp_path / "topic")
    store = str(tmp_path / "store")
    truth_rows = 0
    with ks.SpoolProducer(topic, records_per_segment=3) as p:
        for i in range(7):
            p.send_file(f"f{i}.gpx", _gpx_xml(f"t{i}", 2 + i % 3))
            truth_rows += 2 + i % 3
    res = ks.consume_to_store(
        topic, store, _parse, max_records_per_poll=4, group="g1"
    )
    assert res["rows"] == truth_rows
    assert res["polls"] == 2  # 4 + 3 files
    polls = sorted(glob.glob(os.path.join(store, "poll=*")))
    assert [os.path.basename(p) for p in polls] == [
        "poll=00000000_00000000", "poll=00000001_00000001",
    ]
    got = pq.read_table(store + "/poll=00000000_00000000")
    assert got.num_rows > 0
    # offsets committed past the end
    off = ks.read_offsets(store, "g1")
    assert (off["segment_seq"], off["record"], off["polls"]) == (3, 0, 2)
    # a new poll with no new data is a no-op
    res2 = ks.consume_to_store(topic, store, _parse, group="g1")
    assert res2["polls"] == 0 and res2["rows"] == 0
    # NEW data appended -> only the delta is consumed (incremental)
    with ks.SpoolProducer(topic) as p:
        p.send_file("f7.gpx", _gpx_xml("t7", 5))
    res3 = ks.consume_to_store(topic, store, _parse, group="g1")
    assert res3["polls"] == 1 and res3["rows"] == 5
    # an INDEPENDENT group re-reads from the beginning
    res4 = ks.consume_to_store(topic, store, _parse, group="g2")
    assert res4["rows"] == truth_rows + 5


def test_crash_replay_is_exactly_once(tmp_path, ray_session):
    """Data written but offsets NOT committed (crash window) -> the
    next run rewrites the SAME poll directory; no duplicates."""
    topic = str(tmp_path / "topic")
    store = str(tmp_path / "store")
    with ks.SpoolProducer(topic, records_per_segment=2) as p:
        for i in range(4):
            p.send_file(f"f{i}.gpx", _gpx_xml(f"t{i}", 3))
    ks.consume_to_store(topic, store, _parse, max_records_per_poll=2,
                        max_polls=2, group="g")
    # simulate the crash: roll offsets back one poll, keep the data dir
    off = ks.read_offsets(store, "g")
    assert off["polls"] == 2
    ks.commit_offsets(store, "g", {"segment_seq": 1, "record": 0, "polls": 1})
    ks.consume_to_store(topic, store, _parse, max_records_per_poll=2, group="g")
    total = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(store, "poll=*", "**", "*.parquet"),
                           recursive=True)
    )
    assert total == 4 * 3  # every trkpt exactly once
    assert len(glob.glob(os.path.join(store, "poll=*"))) == 2


def test_typed_record_topic(tmp_path, ray_session):
    """staged=False: segments carry TYPED feature records (the
    GeoWaveAvroFormatPlugin mode) — rows land as columns directly."""
    from geowave_ray.sources.avro_io import write_container

    topic = str(tmp_path / "topic")
    store = str(tmp_path / "store")
    schema = {
        "type": "record", "name": "Pt",
        "fields": [
            {"name": "pid", "type": "long"},
            {"name": "lon", "type": "double"},
            {"name": "lat", "type": "double"},
        ],
    }
    recs = [{"pid": i, "lon": float(i), "lat": -float(i)} for i in range(9)]
    os.makedirs(topic)
    with open(os.path.join(topic, "seg-00000000.avro"), "wb") as f:
        f.write(write_container(recs, schema, codec="deflate"))
    res = ks.consume_to_store(
        topic, store, lambda b: b, staged=False, group="g",
    )
    assert res["rows"] == 9
    got = pq.read_table(glob.glob(os.path.join(store, "poll=*"))[0])
    assert sorted(got.column("pid").to_pylist()) == list(range(9))


def test_run_kafka_ingest_multi_plugin(tmp_path, ray_session):
    """IngestFromKafkaDriver role: one consumer per plugin topic; a
    broken plugin is isolated (logged, others continue)."""
    t_gpx = str(tmp_path / "t_gpx")
    t_bad = str(tmp_path / "t_bad")
    with ks.SpoolProducer(t_gpx, records_per_segment=4) as p:
        for i in range(5):
            p.send_file(f"f{i}.gpx", _gpx_xml(f"t{i}", 2))
    os.makedirs(t_bad)
    with open(os.path.join(t_bad, "seg-00000000.avro"), "wb") as f:
        f.write(b"not avro at all")
    res = ks.run_kafka_ingest(
        {"gpx": (t_gpx, _parse), "bad": (t_bad, _parse)},
        str(tmp_path / "stores"),
    )
    assert res["gpx"]["rows"] == 10
    assert "error" in res["bad"] and res["bad"]["polls"] == 0
    got = pq.read_table(
        glob.glob(str(tmp_path / "stores" / "gpx" / "poll=*"))[0]
    )
    assert got.num_rows == 10


def test_offsets_json_is_atomic(tmp_path):
    store = str(tmp_path / "store")
    ks.commit_offsets(store, "g", {"segment_seq": 5, "record": 2, "polls": 3})
    p = ks._offsets_path(store, "g")
    assert not os.path.exists(p + ".tmp")
    assert json.load(open(p)) == {"segment_seq": 5, "record": 2, "polls": 3}
