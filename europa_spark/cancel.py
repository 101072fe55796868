"""Cooperative cancellation — the CancellationToken analog (threaded through
the whole reference, e.g. DuplicateByHashFinder.cs:46-50,
SimilarImageFinder.cs:92-116): scope every Spark job issued by a pipeline
run under a job group, so a controller thread can abort the run mid-flight.

Spark mapping: ``SparkContext.setJobGroup(id, ..., interruptOnCancel=True)``
tags jobs submitted from this thread; ``cancelJobGroup(id)`` kills all of
them (running tasks get interrupted). Works with the checkpoint store's
resume semantics: a cancelled run's completed stages are committed
atomically, so the next run resumes from the last finished stage — the exact
behavior the reference gets from its Qdrant cache after a cancel.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession


class JobGroup:
    """Context manager scoping jobs to a cancellable group.

    Usage::

        group = JobGroup(spark, "dedup-run-42")
        with group:
            out = run(docs, store=store)     # issue jobs inside the scope
            out["report"].count()
        # from another thread at any point: group.cancel()
    """

    def __init__(
        self,
        spark: SparkSession,
        group_id: str | None = None,
        description: str = "europa-spark cancellable run",
    ):
        self.spark = spark
        self.group_id = group_id or f"europa-{uuid.uuid4().hex[:12]}"
        self.description = description

    def __enter__(self) -> "JobGroup":
        self.spark.sparkContext.setJobGroup(
            self.group_id, self.description, interruptOnCancel=True
        )
        return self

    def cancel(self) -> None:
        """Abort every job in the group (thread-safe; call from anywhere)."""
        self.spark.sparkContext.cancelJobGroup(self.group_id)

    def __exit__(self, *exc) -> None:
        sc = self.spark.sparkContext
        # detach this thread from the group so later jobs aren't cancellable
        # by a stale handle
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
        sc.setLocalProperty("spark.job.interruptOnCancel", None)
