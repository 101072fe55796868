"""Exact-substring duplicate pass — winnowed k-gram fingerprints.

Plays the role of the reference's (dead) audio-fingerprint path: insert
hashed fingerprints, match with a vote threshold (AudioHashGenerator.cs:
12-49, ThresholdVotes=25 at :38), best-match join — re-expressed as a
fingerprint equi-join + vote-count aggregation (SURVEY.md H8/H9/A6).
Catches verbatim >= ~600-char blocks embedded in otherwise-unique text that
MinHash misses (overall Jaccard below threshold).

Algorithm: winnowing (Schleimer, Wilkerson, Aiken — "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003): rolling hashes of
char k-grams; keep the min of each sliding window of w hashes; any shared
substring of length >= k + w - 1 guarantees >= 1 shared fingerprint.

Skew handling: fingerprints occurring in more than ``winnow_max_df``
documents are dropped before the join (boilerplate stop-fingerprints) — the
same frequency-cap idea as the LSH bucket cap, bounding the equi-join
fan-out at O(max_df^2) per hot fingerprint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .config import DedupConfig, CANONICAL

_U64 = np.uint64
_ROLL_BASE = _U64(1099511628211)  # FNV prime, odd

WINNOW_MAX_DF = 1000  # stop-fingerprint document-frequency cap


def _winnow_np(text: str, k: int, w: int) -> np.ndarray:
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(_U64)
    n = len(b)
    if n == 0:
        return np.empty(0, dtype=_U64)
    if n < k:
        # short doc: single fingerprint of the whole text (python ints mod
        # 2^64 — numpy warns on scalar uint64 overflow)
        h = 0
        for x in b.tolist():
            h = (h * int(_ROLL_BASE) + int(x)) & 0xFFFFFFFFFFFFFFFF
        return np.array([h], dtype=_U64)
    m = n - k + 1
    h = np.zeros(m, dtype=_U64)
    for j in range(k):
        h = h * _ROLL_BASE + b[j : j + m]
    if m <= w:
        return np.unique(h[[int(np.argmin(h))]])
    windows = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(windows.min(axis=1))


def make_winnow_udf(cfg: DedupConfig = CANONICAL):
    from pyspark.sql.functions import pandas_udf

    k, w = cfg.winnow_kgram, cfg.winnow_window

    @pandas_udf(ArrayType(LongType()))
    def winnow_fingerprints(text: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _winnow_np(t if t is not None else "", k, w).view(np.int64).tolist()
                for t in text
            ]
        )

    return winnow_fingerprints


def substring_pairs(
    reps: DataFrame, cfg: DedupConfig = CANONICAL, max_df: int = WINNOW_MAX_DF
) -> DataFrame:
    """reps(url, extracted) -> confirmed substring pairs.

    explode fingerprints -> drop stop-fingerprints (df > max_df) -> self
    equi-join -> vote count >= cfg.substring_votes (the A6 collision-counting
    aggregation, exactly the LSH shape).
    """
    fp_udf = make_winnow_udf(cfg)
    fps = reps.select(
        "url", F.explode(fp_udf(F.col("extracted"))).alias("fp")
    ).distinct()
    # stop-fingerprint cap: a fingerprint shared by thousands of docs is
    # boilerplate, not evidence of a copied passage
    rare = (
        fps.groupBy("fp")
        .count()
        .filter((F.col("count") > 1) & (F.col("count") <= max_df))
        .select("fp")
    )
    fps = fps.join(rare, "fp")
    a, b = fps.alias("a"), fps.alias("b")
    votes = (
        a.join(b, "fp")
        .filter(F.col("a.url") < F.col("b.url"))
        .groupBy(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))
        .agg(F.count("*").alias("votes"))
    )
    return votes.filter(F.col("votes") >= cfg.substring_votes).select(
        "url_a",
        "url_b",
        F.lit("substring").alias("method"),
        F.col("votes").cast("double").alias("score"),
    )
