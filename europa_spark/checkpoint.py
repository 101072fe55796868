"""Resumable checkpoint tables + per-stage lineage counters.

Re-expresses the reference's cross-run incrementality — the Qdrant cache of
signatures and similarity edges (QdrantRepository.cs:82-103,158-182; driven
at SimilarImageFinder.cs:167-178,303-315) — as idempotent parquet tables
with an atomic JSON manifest (no Iceberg runtime jar in this sandbox; the
layout mirrors Iceberg's snapshot-commit semantics: write data files first,
then atomically swap the manifest; a half-written stage is invisible).

Resume semantics (north rule "resumes mid-run"):
  * each stage is keyed by (stage_name, config_hash);
  * a completed stage is read back instead of recomputed (J5 cache-hit);
  * counters table records per-stage, per-partition row counts + wall time
    (the SignalR progress feed S5 analog, NotificationHub.cs:1-4).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


class CheckpointStore:
    def __init__(self, root: str, config_hash: str):
        self.root = root
        self.config_hash = config_hash
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, MANIFEST)

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"stages": {}, "counters": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # atomic commit

    def _key(self, stage: str) -> str:
        return f"{stage}@{self.config_hash}"

    def has(self, stage: str) -> bool:
        return self._key(stage) in self._read_manifest()["stages"]

    def path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}@{self.config_hash}")

    # -- stage io ----------------------------------------------------------
    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        entry = self._read_manifest()["stages"][self._key(stage)]
        return spark.read.parquet(entry["path"])

    def save(self, df: DataFrame, stage: str) -> DataFrame:
        """Write a completed stage; returns the re-read DataFrame (so the
        downstream plan reads the materialized table, cutting lineage)."""
        spark = df.sparkSession
        path = self.path(stage)
        t0 = time.time()
        # per-partition lineage: rows per spark partition, recorded while the
        # write materializes the stage (single pass via partition-id agg)
        df = df.withColumn("_pid", F.spark_partition_id())
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        per_part = [
            {"partition_id": r["_pid"], "rows": r["rows"]}
            for r in out.groupBy("_pid").agg(F.count("*").alias("rows")).collect()
        ]
        wall_ms = int((time.time() - t0) * 1000)
        m = self._read_manifest()
        m["stages"][self._key(stage)] = {
            "path": path,
            "rows": sum(p["rows"] for p in per_part),
            "n_partitions": len(per_part),
            "wall_ms": wall_ms,
        }
        m["counters"].append(
            {
                "stage": stage,
                "config_hash": self.config_hash,
                "rows_out": sum(p["rows"] for p in per_part),
                "wall_ms": wall_ms,
                "partitions": per_part,
            }
        )
        self._write_manifest(m)
        return out.drop("_pid")

    def get_or_compute(
        self, spark: SparkSession, stage: str, compute
    ) -> tuple[DataFrame, bool]:
        """(df, was_cached). The J4/J5 resume shape: completed stages are
        never recomputed."""
        if self.has(stage):
            return self.load(spark, stage).drop("_pid"), True
        return self.save(compute(), stage), False

    def counters(self) -> list[dict]:
        return self._read_manifest()["counters"]

    def invalidate(self, stage: str | None = None) -> None:
        m = self._read_manifest()
        keys = [self._key(stage)] if stage else list(m["stages"])
        for k in keys:
            entry = m["stages"].pop(k, None)
            if entry:
                shutil.rmtree(entry["path"], ignore_errors=True)
        self._write_manifest(m)
