"""WARC container tests (sources/warc.py) — record framing checked
byte-by-byte against the ISO 28500 layout, per-record gzip member
splitting, skip semantics, HTTP payload split, rejection paths, and
the WARC -> pages -> html-extraction pipeline chain."""

import zlib

import numpy as np
import pytest

from geowave_ray.sources import warc


def _sample_records():
    body = b"<html><body>hello</body></html>"
    return body, [
        {"type": "warcinfo", "payload": b"software: t\r\n"},
        {"type": "request", "uri": "https://a.example/x",
         "payload": b"GET / HTTP/1.1\r\n\r\n"},
        {"type": "response", "uri": "https://a.example/x",
         "date": "2024-03-05T12:30:45Z",
         "payload": warc.http_response(body)},
        {"type": "response", "uri": "https://b.example/y",
         "date": "2024-03-05T12:31:00Z",
         "payload": warc.http_response(b"PLAIN", content_type="text/plain",
                                       status=404)},
    ]


def test_record_framing_golden():
    """Walk the produced bytes with the test's own framing logic:
    version line, CRLF headers, blank line, Content-Length payload,
    double-CRLF separator."""
    buf = warc.write_warc([{"type": "response", "uri": "https://e/1",
                            "date": "2024-01-02T03:04:05Z",
                            "payload": b"12345"}])
    assert buf.startswith(b"WARC/1.0\r\n")
    head, _, rest = buf.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    fields = dict(ln.split(b": ", 1) for ln in lines[1:])
    assert fields[b"WARC-Type"] == b"response"
    assert fields[b"WARC-Target-URI"] == b"https://e/1"
    assert fields[b"Content-Length"] == b"5"
    assert rest == b"12345\r\n\r\n"


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_both_layouts(gz):
    body, recs = _sample_records()
    buf = warc.write_warc(recs, gzip_per_record=gz)
    parsed = warc.read_warc(buf)
    assert [h["warc-type"] for h, _ in parsed] == [
        "warcinfo", "request", "response", "response"]
    assert parsed[2][1] == warc.http_response(body)
    if gz:
        # each record is its own gzip member -> file is splittable
        assert buf[:2] == b"\x1f\x8b"
        n_members = buf.count(b"\x1f\x8b\x08")
        assert n_members == 4


def test_gzip_members_parse_independently():
    _, recs = _sample_records()
    buf = warc.write_warc(recs, gzip_per_record=True)
    # decompress just the FIRST member and parse it alone
    do = zlib.decompressobj(16 + zlib.MAX_WBITS)
    first = do.decompress(buf) + do.flush()
    (h, p), = list(warc._parse_records(first))
    assert h["warc-type"] == "warcinfo"


def test_http_split_and_status():
    s, b = warc.split_http_payload(warc.http_response(b"X", status=301))
    assert s == 301 and b == b"X"
    s2, b2 = warc.split_http_payload(b"not http at all")
    assert s2 == 0 and b2 == b"not http at all"


def test_rejections():
    with pytest.raises(ValueError, match="version"):
        warc.read_warc(b"NOTWARC/1.0\r\n\r\n")
    # truncated payload
    buf = warc.write_warc([{"type": "response", "uri": "u",
                            "payload": b"123456789"}])
    with pytest.raises(ValueError, match="truncated"):
        warc.read_warc(buf[:-8])
    # record without Content-Length
    bad = b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        warc.read_warc(bad)
    # trailing garbage after gzip members
    gzbuf = warc.write_warc([{"type": "warcinfo", "payload": b"a"}],
                            gzip_per_record=True)
    with pytest.raises(ValueError, match="garbage"):
        warc.read_warc(gzbuf + b"junk")


def test_warc_to_pages_to_text_pipeline(ray_session):
    """The full web-ingest chain: WARC parse -> pages shape ->
    HTML text extraction, all inside Dataset stages."""
    import pyarrow as pa
    import ray.data

    from geowave_ray.sources.warc import parse_warc_batch
    from geowave_ray.text import extract_html_text

    files = []
    for j in range(4):
        recs = [{"type": "response", "uri": f"https://p{j}.example/",
                 "date": "2024-06-01T00:00:00Z",
                 "payload": warc.http_response(
                     f"<html><body><p>doc {j} text</p></body></html>".encode()
                 )}]
        files.append(warc.write_warc(recs, gzip_per_record=bool(j % 2)))
    ds = ray.data.from_arrow(pa.table({
        "file_id": pa.array([f"f{j}" for j in range(4)]),
        "warc": pa.array(files, pa.binary()),
    }))
    pages = ds.map_batches(parse_warc_batch, batch_format="pyarrow")
    texts = extract_html_text(pages, html_col="html", out_col="text")
    rows = sorted((r["url"], r["text"]) for r in texts.take_all())
    assert rows == [(f"https://p{j}.example/", f"doc {j} text")
                    for j in range(4)]


def test_cli_ingest_warc_end_to_end(tmp_path, ray_session):
    """The Common-Crawl chain through the CLI: WARC table -> parse ->
    extract -> lang -> geotag -> bucketed store; then a bbox query
    over the resulting store returns the ingested pages."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from geowave_ray.cli import main

    files = []
    for j in range(6):
        recs = [{"type": "response", "uri": f"https://w{j}.example/p",
                 "date": "2024-06-01T00:00:00Z",
                 "payload": warc.http_response(
                     f"<html><body>the and of page {j}</body></html>".encode()
                 )}]
        files.append(warc.write_warc(recs, gzip_per_record=bool(j % 2)))
    table = tmp_path / "warcs.parquet"
    pq.write_table(pa.table({
        "file_id": pa.array([f"f{j}" for j in range(6)]),
        "warc": pa.array(files, pa.binary()),
    }), str(table))
    store = tmp_path / "store"
    assert main(["ingest-warc", str(table), str(store)]) == 0
    import glob

    part_files = glob.glob(str(store / "group=*" / "cell_bucket=*" / "*.parquet"))
    assert part_files
    got = pa.concat_tables([pq.read_table(f) for f in part_files])
    assert got.num_rows == 6
    assert set(got.column("url").to_pylist()) == {
        f"https://w{j}.example/p" for j in range(6)}
    assert "cell_id" in got.column_names and "lang" in got.column_names
    assert "lon" in got.column_names


def test_warc_date_variants_and_missing():
    import pyarrow as pa

    # WARC 1.1 fractional seconds parse
    assert warc._warc_date_us("2024-03-05T12:30:45.123Z") \
        == warc._warc_date_us("2024-03-05T12:30:45Z") + 123000
    with pytest.raises(ValueError, match="WARC-Date"):
        warc._warc_date_us("not a date")
    # response record without WARC-Date -> ValueError, not KeyError
    rec = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="WARC-Date"):
        warc.parse_warc_batch(pa.table({
            "file_id": pa.array(["f"]),
            "warc": pa.array([rec], pa.binary()),
        }))


def test_gzip_many_members_linear():
    """A file with many per-record gzip members parses correctly (the
    member splitter walks a consumed-offset, no tail re-copies)."""
    recs = [{"type": "response", "uri": f"https://m.example/{i}",
             "date": "2024-01-01T00:00:00Z",
             "payload": warc.http_response(f"body {i}".encode())}
            for i in range(300)]
    buf = warc.write_warc(recs, gzip_per_record=True)
    parsed = warc.read_warc(buf)
    assert len(parsed) == 300
    assert parsed[299][1].endswith(b"body 299")
