"""Pair-level delta compute: incremental run over (old + new) must produce
the same pair set as a from-scratch batch run (J4/J5 resume semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from europa_spark.exact import representatives, with_content_hash
from europa_spark.extract import split_quarantine, with_extracted
from europa_spark.minhash import incremental_minhash_pairs, minhash_pairs, with_signatures


@pytest.fixture(scope="module")
def split_reps(spark, docs_df):
    clean, _ = split_quarantine(with_extracted(docs_df))
    reps = representatives(with_content_hash(clean)).select("url", "extracted")
    old = reps.filter(F.crc32(F.col("url")) % 4 != 0)
    new = reps.filter(F.crc32(F.col("url")) % 4 == 0)
    return reps.cache(), old.cache(), new.cache()


def test_incremental_equals_batch(spark, split_reps):
    reps, old, new = split_reps
    batch_pairs = {
        (r["url_a"], r["url_b"]) for r in minhash_pairs(reps).collect()
    }
    old_sigs = with_signatures(old)
    old_pairs = minhash_pairs(old, sigs=old_sigs)
    old_set = {(r["url_a"], r["url_b"]) for r in old_pairs.collect()}
    _, delta = incremental_minhash_pairs(old_sigs, new, existing_pairs=old_pairs)
    delta_set = {(r["url_a"], r["url_b"]) for r in delta.collect()}
    # no overlap (anti-join) and exact union
    assert not (old_set & delta_set)
    assert old_set | delta_set == batch_pairs
    # every delta pair touches a new doc
    new_urls = {r["url"] for r in new.collect()}
    assert all(a in new_urls or b in new_urls for a, b in delta_set)
