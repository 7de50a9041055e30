"""Streaming ingest from an append-only spool of Avro segments — the
Kafka ingest role re-expressed for a shared filesystem / object store.

Reference roles:
``core/ingest/.../kafka/StageToKafkaDriver.java`` (producer: each input
file's Avro records published to the format plugin's topic),
``IngestFromKafkaDriver.java:180-283`` (consumer loop: poll → per-record
plugin parse → store writer, flushed every ``batchSize`` records,
consumer-group offsets as the progress cursor),
``KafkaIngestRunData.java`` (writer cache + flush).

A TOPIC is a directory of immutable Avro object-container SEGMENTS
(``seg-00000042.avro``) appended atomically (tmp + rename) by the
producer; the (segment sequence, record index) pair is the offset axis,
totally ordered exactly like a single-partition Kafka topic. A consumer
GROUP commits its offset atomically AFTER each poll's store write: the
poll's output directory name is derived from the committed start
offset, so a crash between the data write and the offset commit replays
idempotently (rmtree + rewrite of the same directory) — the
exactly-once discipline Kafka's offset commit provides the reference.

Scale shape: one segment slice = one Ray read unit (the reference runs
one consumer thread per plugin on one box — ``IngestFromKafkaDriver``'s
executor pool; here a poll fans out across the cluster); container
decode + plugin parse + spatial encode all run inside ``map_batches``;
the store append is a partitioned parquet write. Nothing but the
offsets JSON (a few bytes) ever lives on the driver.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Any

import pyarrow as pa

from .avro_io import (
    WHOLE_FILE_SCHEMA,
    read_staged_files,
    write_container,
)

SEG_PREFIX = "seg-"
SEG_SUFFIX = ".avro"


# ---------------------------------------------------------------------------
# producer (StageToKafkaDriver role)
# ---------------------------------------------------------------------------


class SpoolProducer:
    """Stages records into topic segments (StageKafkaData.getProducer +
    producer.send role). ``send`` buffers; ``flush`` publishes one
    immutable segment atomically. Whole files are wrapped as WholeFile
    records exactly like ``AbstractStageWholeFileToAvro.java``."""

    def __init__(
        self,
        topic_dir: str,
        codec: str = "deflate",
        records_per_segment: int = 256,
    ) -> None:
        self.topic_dir = topic_dir
        self.codec = codec
        self.records_per_segment = records_per_segment
        self._buf: list[dict] = []
        os.makedirs(topic_dir, exist_ok=True)

    def send_file(self, path: str, payload: bytes) -> None:
        self._buf.append({"originalFilePath": path, "originalFile": payload})
        if len(self._buf) >= self.records_per_segment:
            self.flush()

    def flush(self) -> str | None:
        if not self._buf:
            return None
        seq = next_segment_seq(self.topic_dir)
        name = f"{SEG_PREFIX}{seq:08d}{SEG_SUFFIX}"
        data = write_container(self._buf, WHOLE_FILE_SCHEMA, codec=self.codec)
        tmp = os.path.join(self.topic_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(self.topic_dir, name))
        self._buf = []
        return name

    def close(self) -> None:
        self.flush()

    def __enter__(self) -> "SpoolProducer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def next_segment_seq(topic_dir: str) -> int:
    segs = list_segments(topic_dir)
    if not segs:
        return 0
    last = os.path.basename(segs[-1])
    return int(last[len(SEG_PREFIX):-len(SEG_SUFFIX)]) + 1


def list_segments(topic_dir: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(topic_dir, f"{SEG_PREFIX}*{SEG_SUFFIX}"))
    )


def stage_directory_to_topic(
    input_files: list[str] | str,
    topic_dir: str,
    codec: str = "deflate",
    records_per_segment: int = 256,
) -> int:
    """StageToKafkaDriver.runOperation role: walk local input files and
    publish each as a WholeFile record. Returns files staged."""
    if isinstance(input_files, str):
        files = sorted(
            p for p in glob.glob(os.path.join(input_files, "*")) if os.path.isfile(p)
        )
    else:
        files = list(input_files)
    with SpoolProducer(
        topic_dir, codec=codec, records_per_segment=records_per_segment
    ) as prod:
        for p in files:
            with open(p, "rb") as f:
                prod.send_file(p, f.read())
    return len(files)


# ---------------------------------------------------------------------------
# consumer-group offsets (Kafka offset-commit role)
# ---------------------------------------------------------------------------


def _offsets_path(store_dir: str, group: str) -> str:
    return os.path.join(store_dir, "_manifest", f"kafka_offsets_{group}.json")


def read_offsets(store_dir: str, group: str) -> dict:
    p = _offsets_path(store_dir, group)
    if not os.path.exists(p):
        return {"segment_seq": 0, "record": 0, "polls": 0}
    with open(p) as f:
        return json.load(f)


def commit_offsets(store_dir: str, group: str, offsets: dict) -> None:
    p = _offsets_path(store_dir, group)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(offsets, f)
    os.replace(tmp, p)


def _segment_seq(path: str) -> int:
    name = os.path.basename(path)
    return int(name[len(SEG_PREFIX):-len(SEG_SUFFIX)])


def _segment_rows(path: str) -> int:
    """Record count from the container block headers (no payload
    decode — counts ride the wire per the Avro container spec).
    Seek-based: only the header map and each block's two varint
    prefixes are read, so counting a large segment costs O(blocks)
    small reads, not a full-file load (poll() calls this for every
    pending segment on every poll)."""
    from .avro_io import _read_bytes, _read_long

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(65536)
        while True:  # the metadata map (schema JSON) may exceed the buffer
            try:
                pos = 4  # magic validated at decode time
                n, pos = _read_long(head, pos)
                while n != 0:
                    if n < 0:
                        n = -n
                        _, pos = _read_long(head, pos)
                    for _ in range(n):
                        _, pos = _read_bytes(head, pos)
                        _, pos = _read_bytes(head, pos)
                    n, pos = _read_long(head, pos)
                break
            except IndexError:
                more = f.read(len(head))
                if not more:
                    raise ValueError(f"truncated Avro container: {path}")
                head += more
        pos += 16  # sync marker
        total = 0
        f.seek(pos)
        while f.tell() < size:
            at = f.tell()
            buf = f.read(20)  # two varints are <= 10 bytes each
            count, p = _read_long(buf, 0)
            bsize, p = _read_long(buf, p)
            total += count
            f.seek(at + p + bsize + 16)
        return total


def poll(
    topic_dir: str, offsets: dict, max_records: int | None = None
) -> tuple[list[tuple[str, int, int]], dict]:
    """consumer.poll role: the next ≤max_records records past the
    committed offset, as (segment_path, start_record, end_record)
    slices, plus the offsets dict a successful ingest should commit."""
    slices: list[tuple[str, int, int]] = []
    seg_seq, rec = offsets["segment_seq"], offsets["record"]
    budget = max_records if max_records is not None else float("inf")
    for seg in list_segments(topic_dir):
        sq = _segment_seq(seg)
        if sq < seg_seq or budget <= 0:
            continue
        start = rec if sq == seg_seq else 0
        n = _segment_rows(seg)
        if start >= n:
            continue
        end = min(n, start + int(budget)) if budget != float("inf") else n
        slices.append((seg, start, end))
        budget -= end - start
        seg_seq, rec = (sq, end) if end < n else (sq + 1, 0)
    new = dict(offsets)
    new["segment_seq"], new["record"] = seg_seq, rec
    return slices, new


# ---------------------------------------------------------------------------
# consume → store (IngestFromKafkaDriver.consumeMessages role)
# ---------------------------------------------------------------------------


def _slices_dataset(slices: list[tuple[str, int, int]], staged: bool):
    """One segment slice per input row; decode fans out in map_batches
    (one slice = one parallel unit, the per-consumer-thread role)."""
    import ray.data

    # typed empty fallback for empty input blocks: the staged schema is
    # fixed; typed-record topics derive theirs from the FIRST segment's
    # embedded Avro schema (all segments of a topic share it)
    if staged or not slices:
        empty = pa.table(
            {"path": pa.array([], pa.string()),
             "payload": pa.array([], pa.binary())}
        )
    else:
        from .avro_io import avro_to_table

        with open(slices[0][0], "rb") as f:
            empty = avro_to_table(f.read()).slice(0, 0)

    def expand(b: pa.Table) -> pa.Table:
        parts = []
        for i in range(b.num_rows):
            with open(b.column("seg")[i].as_py(), "rb") as f:
                data = f.read()
            s, e = b.column("start")[i].as_py(), b.column("end")[i].as_py()
            if staged:
                t = read_staged_files(data).slice(s, e - s)
            else:
                from .avro_io import avro_to_table

                t = avro_to_table(data).slice(s, e - s)
            parts.append(t)
        if not parts:
            return empty
        return pa.concat_tables(parts)

    items = [
        {"seg": seg, "start": s, "end": e} for seg, s, e in slices
    ]
    return ray.data.from_items(items).map_batches(
        expand, batch_format="pyarrow", batch_size=1
    )


def consume_to_store(
    topic_dir: str,
    store_dir: str,
    parse_batch,
    group: str = "ingest",
    max_records_per_poll: int | None = None,
    max_polls: int | None = None,
    staged: bool = True,
    partition_cols: list[str] | None = None,
    reconnect: bool = False,
) -> dict:
    """Poll → parse → append loop (consumeMessages:214-263 role;
    ``max_records_per_poll`` is the reference's ``batchSize`` flush
    cadence, ``reconnect`` its ``flushAndReconnect``). Each poll's
    output lands in ``poll=<seg>_<rec>/`` (named by the START offset,
    so replay after a crash rewrites the same directory); offsets
    commit only after the write is in place — exactly-once."""
    polls = 0
    rows_total = 0
    while max_polls is None or polls < max_polls:
        offsets = read_offsets(store_dir, group)
        slices, new_offsets = poll(topic_dir, offsets, max_records_per_poll)
        if not slices:
            if reconnect and polls == 0:
                # consumerTimeoutMs elapsed with an empty topic; the
                # reference logs and re-polls — in batch context a
                # second empty poll terminates.
                polls += 1
                continue
            break
        ds = _slices_dataset(slices, staged)
        ds = ds.map_batches(parse_batch, batch_format="pyarrow", batch_size=None)
        dest = os.path.join(
            store_dir,
            f"poll={offsets['segment_seq']:08d}_{offsets['record']:08d}",
        )
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)
        if partition_cols:
            ds.write_parquet(tmp, partition_cols=partition_cols)
        else:
            ds.write_parquet(tmp)
        os.replace(tmp, dest)
        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(p).num_rows
            for p in glob.glob(os.path.join(dest, "**", "*.parquet"), recursive=True)
        )
        new_offsets["polls"] = offsets.get("polls", 0) + 1
        commit_offsets(store_dir, group, new_offsets)
        rows_total += rows
        polls += 1
    return {
        "polls": polls,
        "rows": rows_total,
        "offsets": read_offsets(store_dir, group),
    }


def run_kafka_ingest(
    plugins: dict[str, tuple[str, Any]],
    store_root: str,
    group: str = "ingest",
    max_records_per_poll: int | None = None,
    staged: bool = True,
) -> dict[str, dict]:
    """IngestFromKafkaDriver.runOperation role: one consumer per
    format plugin, each draining its own topic (the reference names
    the topic after the plugin — ``configureAndLaunchPlugins``,
    ``IngestFromKafkaDriver.java:115-178``) into
    ``<store_root>/<plugin>/``. A plugin that fails is recorded and
    does not stop the others (the reference logs and leaves it on the
    queue). Returns per-plugin consume summaries."""
    results: dict[str, dict] = {}
    for name, (topic_dir, parse_batch) in sorted(plugins.items()):
        store_dir = os.path.join(store_root, name)
        polls_before = read_offsets(store_dir, group).get("polls", 0)
        try:
            results[name] = consume_to_store(
                topic_dir,
                store_dir,
                parse_batch,
                group=group,
                max_records_per_poll=max_records_per_poll,
                staged=staged,
            )
        except Exception as e:  # noqa: BLE001 — per-plugin isolation
            # polls that COMMITTED before the failure are real (their
            # rows are in the store); report them so callers don't
            # re-drive already-consumed data or mistrust the store
            after = read_offsets(store_dir, group)
            results[name] = {
                "error": str(e),
                "polls": after.get("polls", 0) - polls_before,
                "rows": None,  # count the poll= dirs to reconcile
                "offsets": after,
            }
    return results
