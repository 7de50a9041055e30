"""Pure-Python WARC reader/writer (ISO 28500 / WARC 1.0) — the
actual Common-Crawl container, as an ingest format plugin.

Implements the published WARC record framing: ``WARC/1.0`` version
line, CRLF-terminated named headers, ``Content-Length``-delimited
payload, two blank lines between records; response-record payloads
are HTTP messages whose body is the crawled document. Both layouts
Common Crawl ships are read: plain concatenated records (WET/WAT
style) and per-record gzip members (.warc.gz — each record its own
deflate stream, so files split at member boundaries; this is what
makes WARC row-group-splittable at 100 TB, and the reader exposes the
same property by parsing one member at a time via zlib's
``unused_data``).

Role parity: the reference's whole-file ingest plugins
(``core/ingest/.../AbstractStageWholeFileToAvro.java`` staging +
format-plugin parse); here the parsed records land directly in the
north-rule ``pages`` shape (url, warc_ts, html) ready for
``geotag_batch``.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import numpy as np  # noqa: F401  (parity with sibling codecs' imports)
import pyarrow as pa

_CRLF = b"\r\n"


# ------------------------------------------------------------- writer


def _record_bytes(rec: dict) -> bytes:
    """One WARC record (headers + payload + record separator)."""
    payload = rec.get("payload", b"")
    headers = [
        ("WARC-Type", rec.get("type", "response")),
        ("WARC-Date", rec.get("date", "2024-01-01T00:00:00Z")),
        ("WARC-Record-ID", rec.get("record_id",
                                   "<urn:uuid:00000000-0000-0000-0000-000000000000>")),
    ]
    if rec.get("uri"):
        headers.append(("WARC-Target-URI", rec["uri"]))
    if rec.get("content_type"):
        headers.append(("Content-Type", rec["content_type"]))
    headers.append(("Content-Length", str(len(payload))))
    out = bytearray(b"WARC/1.0" + _CRLF)
    for k, v in headers:
        out += f"{k}: {v}".encode() + _CRLF
    out += _CRLF
    out += payload
    out += _CRLF + _CRLF
    return bytes(out)


def http_response(body: bytes, content_type: str = "text/html",
                  status: int = 200) -> bytes:
    """Wrap a document body as the HTTP message a response record
    carries."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def write_warc(records: list[dict], gzip_per_record: bool = False) -> bytes:
    """Records -> WARC file bytes. ``gzip_per_record=True`` writes the
    .warc.gz layout (one gzip member per record)."""
    out = bytearray()
    for rec in records:
        raw = _record_bytes(rec)
        if gzip_per_record:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            out += co.compress(raw) + co.flush()
        else:
            out += raw
    return bytes(out)


# ------------------------------------------------------------- reader


_GZ_CHUNK = 1 << 20


def _split_members(buf: bytes):
    """Yield decompressed gzip members (or the whole buffer if plain).

    Feeds fixed-size slices of a memoryview and advances a consumed
    -bytes offset, so a file with tens of thousands of members (a real
    .warc.gz) costs O(file size), not O(members x file size) tail
    copies."""
    if buf[:2] != b"\x1f\x8b":
        yield buf
        return
    mv = memoryview(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError("WARC: trailing garbage after gzip members")
        do = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = bytearray()
        while not do.eof:
            if pos >= n:
                raise ValueError("WARC: truncated gzip member")
            piece = mv[pos:pos + _GZ_CHUNK]
            try:
                out += do.decompress(piece)
            except zlib.error as e:
                raise ValueError(f"WARC: corrupt gzip member: {e}") from None
            consumed = len(piece) - (len(do.unused_data) if do.eof else 0)
            pos += consumed
        out += do.flush()
        yield bytes(out)


def _parse_records(chunk: bytes):
    """Yield (headers dict, payload bytes) for records in a chunk."""
    pos = 0
    n = len(chunk)
    while pos < n:
        # skip inter-record blank lines
        while chunk[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = chunk.index(_CRLF, pos)
        version = chunk[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"WARC: bad version line {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = chunk.index(_CRLF, pos)
            line = chunk[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii").lower()] = v.strip().decode(
                "utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC: record without Content-Length") from None
        payload = chunk[pos:pos + length]
        if len(payload) != length:
            raise ValueError("WARC: truncated record payload")
        pos += length
        yield headers, payload


def read_warc(buf: bytes):
    """WARC bytes (plain or per-record gzip) -> list of
    (headers dict, payload bytes)."""
    out = []
    for member in _split_members(buf):
        out.extend(_parse_records(member))
    return out


def split_http_payload(payload: bytes) -> tuple[int, bytes]:
    """HTTP message -> (status code, body). Non-HTTP payloads return
    (0, payload) unchanged."""
    if not payload.startswith(b"HTTP/"):
        return 0, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return 0, payload
    status_line = payload[: payload.index(_CRLF)]
    parts = status_line.split()
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    return status, payload[sep + 4:]


def _warc_date_us(s: str) -> int:
    """WARC-Date (ISO 8601 Zulu; WARC 1.1 allows fractional seconds)
    -> microseconds since epoch."""
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1_000_000)
        except ValueError:
            continue
    raise ValueError(f"WARC: bad WARC-Date {s!r}")


def parse_warc_batch(batch: pa.Table, file_col: str = "warc",
                     id_col: str = "file_id") -> pa.Table:
    """map_batches kernel: (file_id, warc bytes) rows -> one row per
    RESPONSE record in the north-rule pages shape
    (file_id, rec_no, url, warc_ts, html, http_status, n_bytes).
    warcinfo/request/metadata records are skipped, exactly like the
    crawl pipelines that consume Common Crawl."""
    f_ids, recs, urls, tss, bodies, stats, sizes = ([], [], [], [], [], [],
                                                    [])
    ids = batch.column(id_col).to_pylist()
    for fid, v in zip(ids, batch.column(file_col)):
        rec_no = 0
        for headers, payload in read_warc(v.as_py()):
            if headers.get("warc-type") != "response":
                continue
            if "warc-date" not in headers:
                raise ValueError("WARC: response record without WARC-Date")
            status, body = split_http_payload(payload)
            f_ids.append(fid)
            recs.append(rec_no)
            urls.append(headers.get("warc-target-uri", ""))
            tss.append(_warc_date_us(headers["warc-date"]))
            bodies.append(body)
            stats.append(status)
            sizes.append(len(body))
            rec_no += 1
    return pa.table(
        {
            "file_id": pa.array(f_ids, pa.string()),
            "rec_no": pa.array(recs, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "http_status": pa.array(stats, pa.int64()),
            "n_bytes": pa.array(sizes, pa.int64()),
        }
    )
