"""Pure-Python Apache Avro object-container codec — the GeoWave
whole-file staging format (reference role:
``core/ingest/src/main/java/org/locationtech/geowave/core/ingest/avro/``
``AbstractStageWholeFileToAvro.java`` + ``WholeFile.avsc`` — raw input
files are wrapped as Avro records ``{originalFile: bytes,
originalFilePath: string}`` and staged for the distributed ingest
drivers; ``GeoWaveAvroFormatPlugin`` reads feature rows the same way).
The wire format is the published Avro 1.x specification (binary
encoding §"Binary Encoding", container files §"Object Container
Files"): zigzag-varint longs, length-prefixed bytes/strings, block
lists, ``Obj\\x01`` magic, metadata map carrying the JSON schema and
codec, 16-byte sync marker between blocks. Codecs: ``null`` and
``deflate`` (raw RFC-1951, no zlib wrapper, per the spec).

Schema support targets the staging role: records whose fields are
primitives (null/boolean/int/long/float/double/bytes/string),
nullable unions ``["null", T]``, and arrays of primitives. The Arrow
bridge maps those onto the matching pyarrow types, so a staged table
round-trips ``pa.Table -> .avro bytes -> pa.Table`` exactly.

Scale shape: a container FILE is the parallel unit, exactly like the
other format plugins — a batch row carries one ``.avro`` payload and
``parse_avro_batch`` expands it inside ``map_batches``; whole-file
staging wraps each raw file as one record, so a staged directory fans
out per file across the cluster just like the reference's
staged-to-HDFS splits."""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

import numpy as np
import pyarrow as pa

from ..util import decode_boundary

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary encoding primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    v = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    # interpret as signed 64-bit before un-zigzagging
    if acc >= 1 << 64:
        raise ValueError("varint overflow")
    return _zigzag_decode(acc), pos


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out += b


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return buf[pos:pos + n], pos + n


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------

_PRIMS = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _encode_value(out: bytearray, schema, v) -> None:
    if isinstance(schema, list):  # union: write branch index then value
        branch = 0 if v is None else next(
            i for i, s in enumerate(schema) if s != "null"
        )
        if v is None and "null" not in schema:
            raise ValueError("null for non-nullable union")
        _write_long(out, branch if v is not None else schema.index("null"))
        if v is not None:
            _encode_value(out, schema[branch], v)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode_value(out, f["type"], v[f["name"]])
            return
        if t == "array":
            if len(v):
                _write_long(out, len(v))
                for item in v:
                    _encode_value(out, schema["items"], item)
            _write_long(out, 0)
            return
        if t == "fixed":
            if len(v) != schema["size"]:
                raise ValueError("fixed size mismatch")
            out += v
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(v))
            return
        if t == "map":
            items = list(v.items())
            if items:
                _write_long(out, len(items))
                for k, mv in items:
                    _write_bytes(out, k.encode("utf-8"))
                    _encode_value(out, schema["values"], mv)
            _write_long(out, 0)
            return
        t_inner = t  # {"type": "string"} wrapper form
        _encode_value(out, t_inner, v)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if v else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(v))
        return
    if schema == "float":
        out += struct.pack("<f", float(v))
        return
    if schema == "double":
        out += struct.pack("<d", float(v))
        return
    if schema == "bytes":
        _write_bytes(out, bytes(v))
        return
    if schema == "string":
        _write_bytes(out, v.encode("utf-8"))
        return
    raise ValueError(f"unsupported schema {schema!r}")


def _decode_value(buf: bytes, pos: int, schema):
    if isinstance(schema, list):
        idx, pos = _read_long(buf, pos)
        return _decode_value(buf, pos, schema[idx])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _decode_value(buf, pos, f["type"])
            return rec, pos
        if t == "array":
            items = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    v, pos = _decode_value(buf, pos, schema["items"])
                    items.append(v)
            return items, pos
        if t == "fixed":
            n = schema["size"]
            return buf[pos:pos + n], pos + n
        if t == "enum":
            idx, pos = _read_long(buf, pos)
            return schema["symbols"][idx], pos
        if t == "map":
            m = {}
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    k, pos = _read_bytes(buf, pos)
                    m[k.decode("utf-8")], pos = _decode_value(
                        buf, pos, schema["values"]
                    )
            return m, pos
        return _decode_value(buf, pos, t)
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return buf[pos] != 0, pos + 1
    if schema in ("int", "long"):
        return _read_long(buf, pos)
    if schema == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema == "bytes":
        return _read_bytes(buf, pos)
    if schema == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    raise ValueError(f"unsupported schema {schema!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def write_container(
    records: list[dict], schema: dict, codec: str = "null",
    rows_per_block: int = 4096,
) -> bytes:
    """Records + record schema -> Avro object-container bytes. The
    16-byte sync marker is derived from the schema+payload hash so
    output is deterministic (the spec only requires uniqueness per
    file; tests and resumable restage rely on determinism here)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec}")
    body_blocks = []
    for i in range(0, max(len(records), 1), rows_per_block):
        chunk = records[i:i + rows_per_block]
        if not chunk:
            break
        raw = bytearray()
        for r in chunk:
            _encode_value(raw, schema, r)
        payload = bytes(raw)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        body_blocks.append((len(chunk), payload))

    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = hashlib.sha256(
        schema_json.encode() + b"".join(p for _, p in body_blocks)
    ).digest()[:16]
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out += sync
    for count, payload in body_blocks:
        _write_long(out, count)
        _write_long(out, len(payload))
        out += payload
        out += sync
    return bytes(out)


@decode_boundary("Avro")
def read_container(data: bytes) -> tuple[list[dict], dict]:
    """Avro object-container bytes -> (records, schema)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(data, pos)
        for _ in range(n):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = data[pos:pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        payload = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        p = 0
        for _ in range(count):
            rec, p = _decode_value(payload, p, schema)
            records.append(rec)
    return records, schema


# ---------------------------------------------------------------------------
# Arrow bridge
# ---------------------------------------------------------------------------

_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_int32, "int"),
    (pa.types.is_integer, "long"),
    (pa.types.is_float32, "float"),
    (pa.types.is_floating, "double"),
    (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
]

_AVRO_TO_ARROW = {
    "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
    "float": pa.float32(), "double": pa.float64(),
    "bytes": pa.binary(), "string": pa.string(), "null": pa.null(),
}


def _field_schema(t: pa.DataType):
    for pred, name in _ARROW_TO_AVRO:
        if pred(t):
            return name
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "items": _field_schema(t.value_type)}
    raise ValueError(f"no Avro mapping for Arrow type {t}")


def table_schema(table: pa.Table, name: str = "Row") -> dict:
    fields = []
    for f in table.schema:
        fs = _field_schema(f.type)
        fields.append(
            {"name": f.name, "type": ["null", fs] if f.nullable else fs}
        )
    return {"type": "record", "name": name, "fields": fields}


def table_to_avro(table: pa.Table, codec: str = "null") -> bytes:
    schema = table_schema(table)
    return write_container(table.to_pylist(), schema, codec=codec)


def _avro_arrow_type(s):
    if isinstance(s, list):
        non_null = [x for x in s if x != "null"]
        return _avro_arrow_type(non_null[0] if non_null else "null")
    if isinstance(s, dict):
        if s["type"] == "array":
            return pa.list_(_avro_arrow_type(s["items"]))
        if s["type"] in ("fixed",):
            return pa.binary(s["size"])
        if s["type"] == "enum":
            return pa.string()
        return _avro_arrow_type(s["type"])
    return _AVRO_TO_ARROW[s]


def avro_to_table(data: bytes) -> pa.Table:
    records, schema = read_container(data)
    if schema.get("type") != "record":
        raise ValueError("container schema is not a record")
    arrays = {}
    for f in schema["fields"]:
        at = _avro_arrow_type(f["type"])
        arrays[f["name"]] = pa.array(
            [r[f["name"]] for r in records], at
        )
    return pa.table(arrays)


def parse_avro_batch(
    batch: pa.Table, avro_col: str = "avro", file_col: str = "file_id",
    empty_schema: pa.Schema | None = None,
) -> pa.Table:
    """map_batches entry: each row carries one container's bytes.

    ``empty_schema``: schema to emit for an EMPTY input block (Ray Data
    produces empty blocks on small inputs; a 0-column table would crash
    downstream column access and mismatch sibling blocks). Callers that
    know their record schema should pass it; the Arrow type for a given
    Avro record schema is what :func:`avro_to_table` yields."""
    parts = []
    for i in range(batch.num_rows):
        t = avro_to_table(batch.column(avro_col)[i].as_py())
        if file_col in batch.column_names:
            t = t.add_column(
                0, file_col,
                pa.array([batch.column(file_col)[i].as_py()] * t.num_rows),
            )
        parts.append(t)
    if not parts:
        if empty_schema is not None:
            return empty_schema.empty_table()
        return pa.table({})
    return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# whole-file staging (AbstractStageWholeFileToAvro role)
# ---------------------------------------------------------------------------

# Matches the reference's wholefile.avsc byte-for-byte at the schema
# level (core/ingest/src/main/avro/wholefile.avsc): record name
# AvroWholeFile in the org.locationtech.geowave.core.ingest.avro
# namespace, originalFile (bytes) FIRST, then originalFilePath as a
# ["string","null"] union — so a reference SpecificDatumReader accepts
# these containers.
WHOLE_FILE_SCHEMA = {
    "type": "record",
    "name": "AvroWholeFile",
    "namespace": "org.locationtech.geowave.core.ingest.avro",
    "fields": [
        {"name": "originalFile", "type": "bytes"},
        {"name": "originalFilePath", "type": ["string", "null"]},
    ],
}


def stage_whole_files(files: list[tuple[str, bytes]], codec: str = "deflate") -> bytes:
    """Raw (path, bytes) inputs -> one staged Avro container, the
    AvroWholeFile wrapping the reference ships to HDFS/Kafka
    (schema-compatible: same record name/namespace/field order/union)."""
    recs = [
        {"originalFile": b, "originalFilePath": p} for p, b in files
    ]
    return write_container(recs, WHOLE_FILE_SCHEMA, codec=codec)


@decode_boundary("Avro")
def read_staged_files(data: bytes) -> pa.Table:
    """Staged container -> (path, payload) rows ready to fan out into
    any format plugin's parse_*_batch."""
    records, schema = read_container(data)
    return pa.table(
        {
            "path": pa.array(
                [r["originalFilePath"] for r in records], pa.string()
            ),
            "payload": pa.array(
                [r["originalFile"] for r in records], pa.binary()
            ),
        }
    )
