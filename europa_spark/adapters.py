"""Adapters from the sandbox testdata schema to the canonical input shape.

The driver's `documents` table is (doc_id BIGINT, text, lang, source,
n_chars); the engine's canonical input (BASELINE.json input_hint) is
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
The mapping is deterministic and expressible identically in Spark and ANSI
SQL so DuckDB oracles can reproduce it:

    url     = 'doc://' || lpad(doc_id, 10, '0')   (lexicographic == numeric)
    warc_ts = TIMESTAMP '2025-01-01' + doc_id * 137 seconds
    html    = NULL
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

URL_SQL = "'doc://' || lpad(CAST(doc_id AS VARCHAR), 10, '0')"


def url_col():
    return F.concat(F.lit("doc://"), F.lpad(F.col("doc_id").cast("string"), 10, "0"))


def load_driver_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def to_canonical(driver_docs: DataFrame) -> DataFrame:
    return driver_docs.select(
        url_col().alias("url"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + (F.col("doc_id") * F.expr("INTERVAL 137 SECONDS"))
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def load_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    return to_canonical(load_driver_documents(spark, sf_dir))


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
