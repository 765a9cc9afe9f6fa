"""WARC scan (sources/warc.py): ISO 28500 parse — plain and
per-record-gzip-member archives — distributed over a lake of archive
payloads, feeding the HTML boilerplate-strip text pipeline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.sources.warc import (
    build_warc,
    parse_warc,
    warc_lake_records,
)


def _archive(i: int, gz: bool = False) -> bytes:
    return build_warc(
        [
            {"record_type": "warcinfo",
             "body": b"software: test\r\nformat: WARC/1.0"},
            {"record_type": "response", "url": f"http://ex.com/{i}/a",
             "html": f"<html><body><p>doc {i} alpha</p></body></html>"},
            {"record_type": "request", "url": f"http://ex.com/{i}/a",
             "body": b"GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n"},
            {"record_type": "response", "url": f"http://ex.com/{i}/b",
             "html": f"<html><body>doc {i} beta &amp; more</body></html>"},
        ],
        gzip_members=gz,
    )


def test_parse_warc_plain_and_gzip_members():
    for gz in (False, True):
        recs = parse_warc(_archive(7, gz=gz))
        assert [r["record_type"] for r in recs] == [
            "warcinfo", "response", "request", "response"
        ]
        resp = [r for r in recs if r["record_type"] == "response"]
        assert resp[0]["url"] == "http://ex.com/7/a"
        assert resp[0]["http_status"] == 200
        assert resp[0]["content_type"] == "text/html"
        assert b"doc 7 alpha" in resp[0]["body"]
        assert b"HTTP/1.1" not in resp[0]["body"]  # envelope stripped


def test_parse_warc_rejects_garbage():
    with pytest.raises(ValueError, match="WARC"):
        parse_warc(b"definitely not a warc record")


def test_warc_lake_distributed_response_extraction(spark):
    rows = [(i, _archive(i, gz=(i % 2 == 0))) for i in range(6)]
    lake = spark.createDataFrame(rows, "archive_id long, payload binary")
    recs = warc_lake_records(lake)
    plan = recs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # executor-side parse

    out = recs.collect()
    assert len(out) == 12  # 2 responses per archive; others filtered
    assert {r.record_type for r in out} == {"response"}
    assert all(r.http_status == 200 for r in out)
    by_url = {r.url: bytes(r.body) for r in out}
    assert b"doc 3 beta" in by_url["http://ex.com/3/b"]


def test_warc_to_text_pipeline(spark):
    """The crawl-ingestion composition: WARC lake → response bodies →
    HTML boilerplate strip → visible text."""
    from gpi_etl_spark.operators import textstats

    lake = spark.createDataFrame(
        [(1, _archive(1, gz=True))], "archive_id long, payload binary"
    )
    text = (
        warc_lake_records(lake)
        .withColumn("html", F.col("body").cast("string"))
        .select(
            "url", textstats.html_to_text(F.col("html")).alias("text")
        )
    )
    got = {r.url: r.text for r in text.collect()}
    assert got["http://ex.com/1/a"] == "doc 1 alpha"
    assert got["http://ex.com/1/b"] == "doc 1 beta & more"
