"""Connectors (injected fetchers, no network) + multimodal plumbing."""

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.operators.multimodal import (
    attach_binary_meta,
    extract_features,
    resize_images,
)
from gpi_etl_spark.sources.connectors import http_csv, paginated, zipped_member
from gpi_etl_spark.sources.fixed_width import parse_fixed_width


def test_parse_fixed_width_with_skip(spark):
    lines = spark.createDataFrame(
        [("header junk",), ("04JAN2026 25.1",), ("11JAN2026 26.2",)], "value string"
    )
    out = parse_fixed_width(lines, [10, 5], ["week", "sst"], skip_rows=1)
    rows = [(r.week, r.sst) for r in out.collect()]
    assert rows == [("04JAN2026", "25.1"), ("11JAN2026", "26.2")]


def test_http_csv_with_injected_fetch(spark):
    payload = b"Date,Close,Junk\n2024-01-01,10.5,x\n2024-01-02,11.0,y\n"
    df = http_csv(spark, "http://example/feed.csv", fetch=lambda url: payload,
                  columns=["Date", "Close"])
    assert df.columns == ["Date", "Close"]
    assert df.count() == 2


def test_zipped_member():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("report.xls", b"xlsbytes")
        zf.writestr("readme.txt", b"no")
    assert zipped_member(buf.getvalue(), ".xls") == b"xlsbytes"


def test_paginated_loop():
    pages = {None: ([{"a": 1}], "t1"), "t1": ([{"a": 2}], None)}
    rows = paginated(lambda tok: pages[tok])
    assert rows == [{"a": 1}, {"a": 2}]


def _media(spark):
    rows = [(1, b"abc123", ("image", "png", 2, 2, None, None)),
            (2, b"zzzzzz", ("audio", "wav", None, None, 1000, 8000))]
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,"
        "duration_ms:bigint,sample_rate:int>",
    )


def test_attach_binary_meta(spark):
    out = attach_binary_meta(_media(spark))
    r = out.filter(F.col("media_id") == 1).first()
    assert r.n_bytes == 6
    assert len(r.payload_sha256) == 64


def test_extract_features_deterministic_fake(spark):
    out1 = extract_features(_media(spark)).orderBy("media_id").collect()
    out2 = extract_features(_media(spark)).orderBy("media_id").collect()
    assert [r.feature for r in out1] == [r.feature for r in out2]
    assert all(len(r.feature) == 4 for r in out1)
    assert out1[0].n_bytes == 6


def test_real_decode_paths_are_flagged_stubs(spark):
    with pytest.raises(NotImplementedError):
        resize_images(_media(spark), 64, 64)
