"""Winnowing substring pass vs planted block-D truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from europa_spark.config import DedupConfig
from europa_spark.exact import representatives, with_content_hash
from europa_spark.extract import split_quarantine, with_extracted
from europa_spark.substring import _winnow_np, substring_pairs


def test_winnow_guarantee():
    """Any shared substring >= k + w - 1 chars must share >= 1 fingerprint;
    our 600+ char planted blocks must clear the vote threshold at the
    canonical (k=64, w=128, votes=3) config."""
    from europa_spark.config import CANONICAL

    k, w = CANONICAL.winnow_kgram, CANONICAL.winnow_window
    rng = np.random.default_rng(1)
    alpha = "abcdefghij "
    a = "".join(rng.choice(list(alpha), 3000))
    b = "".join(rng.choice(list(alpha), 1200))
    shared = a[1000:1700]  # 700 chars
    c = b[:600] + shared + b[600:]
    fa = set(_winnow_np(a, k, w).tolist())
    fc = set(_winnow_np(c, k, w).tolist())
    assert len(fa & fc) >= CANONICAL.substring_votes, len(fa & fc)


def test_winnow_determinism_and_short_docs():
    assert _winnow_np("", 64, 128).size == 0
    assert _winnow_np("short", 64, 128).size == 1
    x = _winnow_np("hello world " * 50, 64, 128)
    y = _winnow_np("hello world " * 50, 64, 128)
    assert (x == y).all()


@pytest.fixture(scope="module")
def reps(spark, docs_df):
    clean, _ = split_quarantine(with_extracted(docs_df))
    return representatives(with_content_hash(clean)).select("url", "extracted").cache()


def test_planted_substring_pairs(spark, reps, corpus):
    got = {
        (r["url_a"], r["url_b"]) for r in substring_pairs(reps).collect()
    }
    planted = {
        (a, b)
        for a, b, m, _ in corpus.expected_pairs.itertuples(index=False)
        if m == "substring"
    }
    missed = planted - got
    assert not missed, sorted(missed)[:5]
    # no exact-dup block (B/E) cross-contamination: reps are collapsed, and
    # any extra pair must involve at least one D-block doc or be a genuine
    # shared-run pair; C mutants legitimately share long runs with their base
    for a, b in got - planted:
        assert "/d/" in a or "/d/" in b or "/c/" in a or "/c/" in b, (a, b)
