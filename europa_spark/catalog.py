"""Catalog shim — Iceberg when configured, partitioned parquet otherwise.

SURVEY.md §7: no Iceberg runtime jar ships in this sandbox, so table IO goes
through this thin layer: if the session has an Iceberg catalog configured
(`spark.sql.catalog.*`) and the source looks like a table name, use
`format("iceberg")`; otherwise fall back to parquet paths. The checkpoint
layer (europa_spark.checkpoint) supplies the snapshot/append semantics the
design needs in the parquet fallback (atomic manifest swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg_catalog(spark: SparkSession) -> bool:
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") for k, _ in confs)


def is_table_name(source: str) -> bool:
    return "/" not in source and not source.endswith(".parquet")


def load_table(spark: SparkSession, source: str) -> DataFrame:
    """`db.documents` via the configured catalog (Iceberg in production),
    else a parquet path/glob."""
    if is_table_name(source):
        if _has_iceberg_catalog(spark):
            return spark.read.format("iceberg").load(source)
        return spark.read.table(source)
    return spark.read.parquet(source)


def save_table(
    df: DataFrame, target: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if is_table_name(target):
        if _has_iceberg_catalog(df.sparkSession):
            writer.format("iceberg").saveAsTable(target)
        else:
            writer.saveAsTable(target)
    else:
        writer.parquet(target)
