"""WARC source: framing round-trips, gzip members, HTTP split, Spark read."""

from __future__ import annotations

import gzip

import pytest

from temporal_retriever_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    split_http_payload,
    write_warc_bytes,
)

HTML = b"<html><body><p>hello corpus</p></body></html>"
HTTP_PAYLOAD = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html; charset=utf-8\r\n"
    b"Server: test\r\n"
    b"\r\n" + HTML
)

RECORDS = [
    (
        {
            "WARC-Type": "warcinfo",
            "WARC-Record-ID": "<urn:uuid:aaa>",
            "Content-Type": "application/warc-fields",
            "WARC-Date": "2024-01-01T00:00:00Z",
        },
        b"software: test-crawler/1.0\r\n",
    ),
    (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:bbb>",
            "WARC-Target-URI": "http://example.com/page",
            "WARC-Date": "2024-01-01T00:00:01Z",
            "Content-Type": "application/http; msgtype=response",
        },
        HTTP_PAYLOAD,
    ),
    (
        {
            "WARC-Type": "request",
            "WARC-Record-ID": "<urn:uuid:ccc>",
            "WARC-Target-URI": "http://example.com/page",
            "WARC-Date": "2024-01-01T00:00:01Z",
            "Content-Type": "application/http; msgtype=request",
        },
        b"GET /page HTTP/1.1\r\nHost: example.com\r\n\r\n",
    ),
]


class TestFraming:
    def test_roundtrip(self):
        blob = write_warc_bytes(RECORDS)
        out = list(iter_warc_records(blob, strict=True))
        assert len(out) == 3
        for (h_in, p_in), (h_out, p_out) in zip(RECORDS, out):
            assert p_out == p_in
            assert h_out["warc-type"] == h_in["WARC-Type"]
            assert int(h_out["content-length"]) == len(p_in)

    def test_payload_containing_crlfcrlf_survives(self):
        # Content-Length framing, not delimiter scanning
        tricky = b"AA\r\n\r\nBB\r\n\r\nCC"
        blob = write_warc_bytes([({"WARC-Type": "resource"}, tricky)])
        [(h, p)] = list(iter_warc_records(blob, strict=True))
        assert p == tricky

    def test_truncated_tail_lenient_vs_strict(self):
        blob = write_warc_bytes(RECORDS)[:-20]  # cut into last payload
        out = list(iter_warc_records(blob))
        assert len(out) == 2  # first two intact records survive
        with pytest.raises(ValueError, match="truncated"):
            list(iter_warc_records(blob, strict=True))

    def test_garbage_between_records(self):
        blob = write_warc_bytes(RECORDS[:1]) + b"NOT A RECORD"
        out = list(iter_warc_records(blob))
        assert len(out) == 1
        with pytest.raises(ValueError, match="magic"):
            list(iter_warc_records(blob, strict=True))

    def test_empty_input(self):
        assert list(iter_warc_records(b"")) == []


class TestHttpSplit:
    def test_response_split(self):
        status, ctype, body = split_http_payload(HTTP_PAYLOAD)
        assert status == 200
        assert ctype == "text/html; charset=utf-8"
        assert body == HTML

    def test_non_http_passthrough(self):
        raw = b"software: x\r\n"
        assert split_http_payload(raw) == (None, None, raw)

    def test_mangled_status_line(self):
        raw = b"HTTP/1.1 XX\r\n\r\nbody"
        assert split_http_payload(raw) == (None, None, raw)


class TestSparkRead:
    @pytest.fixture()
    def warc_dir(self, tmp_path):
        blob = write_warc_bytes(RECORDS)
        (tmp_path / "plain.warc").write_bytes(blob)
        # per-record gzip members concatenated — the Common Crawl layout
        members = b"".join(
            gzip.compress(write_warc_bytes([r])) for r in RECORDS
        )
        (tmp_path / "members.warc.gz").write_bytes(members)
        return str(tmp_path)

    def test_reads_plain_and_multimember_gzip(self, spark, warc_dir):
        df = read_warc(spark, warc_dir)
        rows = df.collect()
        assert len(rows) == 6  # 3 records x 2 files
        by_type = {}
        for r in rows:
            by_type.setdefault(r["warc_type"], []).append(r)
        assert len(by_type["response"]) == 2
        resp = by_type["response"][0]
        assert resp["http_status"] == 200
        assert bytes(resp["payload"]) == HTML
        assert resp["target_uri"] == "http://example.com/page"
        assert resp["content_length"] == len(HTTP_PAYLOAD)
        info = by_type["warcinfo"][0]
        assert info["http_status"] is None
        assert bytes(info["payload"]).startswith(b"software:")

    def test_http_parse_off_keeps_raw_payload(self, spark, warc_dir):
        df = read_warc(spark, warc_dir, http_parse=False)
        resp = [r for r in df.collect() if r["warc_type"] == "response"][0]
        assert bytes(resp["payload"]) == HTTP_PAYLOAD
        assert resp["http_status"] is None

    def test_downstream_dataframe_ops(self, spark, warc_dir):
        from pyspark.sql import functions as F

        df = read_warc(spark, warc_dir)
        agg = (
            df.filter(F.col("http_status") == 200)
            .groupBy("warc_type")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert agg == [("response", 2)] or [
            (r["warc_type"], r["n"]) for r in agg
        ] == [("response", 2)]
