"""Extraction invariant: Spark built-ins byte-identical to the Python mirror
and to the fixture truth table (FIXTURES.md §2)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from europa_spark.extract import extract_text_py, with_extracted, split_quarantine

# FIXTURES.md §2 test vectors
VECTORS = [
    (
        b"<html><body><p>Hello,&nbsp;world &amp;&#39;friends&#39;</p></body></html>",
        "Hello, world &'friends'",
    ),
    (b'<div>a<script type="t">x<y</script>b<!-- c<d -->e</div>', "abe"),
    (b"<p>line1\r\n\t line2</p><style>p{}</style>", "line1 line2"),
    (b"\xff\xfe<p>ok</p>", "�� ok"),
]


def test_python_mirror_vectors():
    for html, want in VECTORS:
        assert extract_text_py(None, html) == want


def test_text_route_verbatim():
    assert extract_text_py(" raw\ttext \n", None) == " raw\ttext \n"
    assert extract_text_py("", None) == ""
    assert extract_text_py(None, None) == ""


def test_spark_matches_vectors(spark):
    rows = [(f"u{i}", html, None) for i, (html, _) in enumerate(VECTORS)]
    df = spark.createDataFrame(rows, "url string, html binary, text string")
    got = {r["url"]: r["extracted"]
           for r in with_extracted(df).select("url", "extracted").collect()}
    for i, (_, want) in enumerate(VECTORS):
        assert got[f"u{i}"] == want, (i, got[f"u{i}"], want)


def test_spark_matches_truth_table(spark, docs_df, corpus):
    ext = with_extracted(docs_df).select(
        "url",
        F.sha2(F.encode(F.col("extracted"), "UTF-8"), 256).alias("text_sha256"),
        F.length(F.encode(F.col("extracted"), "UTF-8")).alias("text_len"),
    )
    got = {r["url"]: (r["text_sha256"], r["text_len"]) for r in ext.collect()}
    truth = corpus.expected_extraction
    assert len(got) == len(truth)
    mismatches = [
        u for u, sha, ln in truth.itertuples(index=False)
        if got[u] != (sha, ln)
    ]
    assert not mismatches, mismatches[:5]


def test_quarantine_split(spark, docs_df, corpus):
    clean, quar = split_quarantine(with_extracted(docs_df))
    got = {r["url"]: r["reason"] for r in quar.collect()}
    want = {r.url: r.reason for r in corpus.expected_quarantine.itertuples(index=False)}
    assert got == want
    assert clean.count() + len(got) == docs_df.count()
