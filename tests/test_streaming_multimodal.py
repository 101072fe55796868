"""Structured-Streaming incremental dedup + multimodal binary plumbing."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from europa_spark.multimodal import (
    make_fake_media,
    media_exact_dups,
    media_signatures,
    with_media_metadata,
)
from europa_spark.streaming import read_dup_log, start_incremental_dedup


def _write_docs(path: str, rows: list[tuple[str, str]]) -> None:
    t = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows]),
            pa.array([None] * len(rows), pa.timestamp("us", tz="UTC")),
            pa.array([None] * len(rows), pa.binary()),
            pa.array([r[1] for r in rows]),
            pa.array(["en"] * len(rows)),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )
    pq.write_table(t, path)


def test_incremental_stream_dedup(spark, tmp_path):
    src = tmp_path / "src"
    state = str(tmp_path / "state")
    os.makedirs(src)

    _write_docs(str(src / "b1.parquet"), [("u1", "alpha beta"), ("u2", "alpha beta"), ("u3", "unique one")])
    q = start_incremental_dedup(spark, str(src), state)
    q.awaitTermination(120)

    log1 = {(r["url"], r["duplicate_of"]) for r in read_dup_log(spark, state).collect()}
    assert log1 == {("u2", "u1")}  # intra-batch dup, first-wins by min url

    # second batch: cross-batch dup of u1 + new unique
    _write_docs(str(src / "b2.parquet"), [("u4", "alpha beta"), ("u5", "another text")])
    q = start_incremental_dedup(spark, str(src), state)
    q.awaitTermination(120)

    log2 = {(r["url"], r["duplicate_of"]) for r in read_dup_log(spark, state).collect()}
    assert log2 == {("u2", "u1"), ("u4", "u1")}, log2


def test_media_metadata_and_signatures(spark):
    rows = [
        ("m1", make_fake_media(8, 6, b"abcabc")),
        ("m2", make_fake_media(8, 6, b"abcabc")),       # byte-identical to m1
        ("m3", make_fake_media(16, 4, b"zzzzzz")),
        ("m4", b"\xff\xd8\xffJPEGDATA"),                 # real codec: skipped
    ]
    df = spark.createDataFrame(rows, "url string, media binary")
    meta = {r["url"]: r for r in with_media_metadata(df).collect()}
    assert meta["m1"]["media_type"] == "fake"
    assert meta["m4"]["media_type"] == "jpeg"
    assert meta["m1"]["n_bytes"] == len(rows[0][1])

    sigs = {r["url"]: r for r in media_signatures(df).collect()}
    assert set(sigs) == {"m1", "m2", "m3"}  # jpeg skipped (stub decoder)
    assert (sigs["m1"]["width"], sigs["m1"]["height"]) == (8, 6)
    assert sigs["m1"]["sig"] == sigs["m2"]["sig"]
    assert len(sigs["m1"]["sig"]) == 64
    assert sigs["m1"]["sig"] != sigs["m3"]["sig"]

    dups = {(r["url"], r["group_id"]) for r in media_exact_dups(df).collect()}
    assert dups == {("m1", "m1"), ("m2", "m1")}
