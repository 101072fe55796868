"""Batch-vectorized kernels must be bit-identical to the per-row reference
kernels (the batch versions are what production runs; the per-row versions
define the semantics)."""

from __future__ import annotations

import numpy as np

from europa_spark.minhash import _batch_shingle_hashes, _shingle_hashes_np
from europa_spark.substring import _batch_winnow, _winnow_np


def _texts():
    rng = np.random.default_rng(5)
    alpha = list("abcdefg ")
    texts = ["".join(rng.choice(alpha, int(n))) for n in rng.integers(0, 3000, 60)]
    # adversarial shapes: empty, single word, exactly k words/chars, repeats
    texts += ["", "one", "a b c d e", "a b c d", "x" * 64, "x" * 63, "y " * 200]
    return texts


def test_batch_shingles_equal_reference():
    texts = _texts()
    batch = _batch_shingle_hashes(texts, 5)
    for t, got in zip(texts, batch):
        want = _shingle_hashes_np(t, 5, {})
        assert got.dtype == want.dtype
        assert np.array_equal(got, want), t[:40]


def test_batch_winnow_equal_reference():
    texts = _texts()
    batch = _batch_winnow(texts, 64, 32)
    for t, got in zip(texts, batch):
        want = _winnow_np(t, 64, 32)
        assert np.array_equal(got, want), t[:40]


def test_dual_signature_udf_equals_separate_passes(spark):
    """The one-pass dual UDF (r3 byte-stream optimization) must emit exactly
    the same minhash and fingerprint arrays as the two separate passes."""
    from pyspark.sql import functions as F

    from europa_spark.config import CANONICAL
    from europa_spark.minhash import with_dual_signatures, with_signatures
    from europa_spark.substring import make_winnow_udf

    rows = [(f"u{i}", t) for i, t in enumerate(_texts())]
    df = spark.createDataFrame(rows, "url string, extracted string")
    dual = {
        r["url"]: (r["minhash"], r["fps"])
        for r in with_dual_signatures(df, CANONICAL).collect()
    }
    mh = {
        r["url"]: r["minhash"]
        for r in with_signatures(df, CANONICAL, include_shingles=False).collect()
    }
    wn = {
        r["url"]: r["fps"]
        for r in df.select(
            "url", make_winnow_udf(CANONICAL)(F.col("extracted")).alias("fps")
        ).collect()
    }
    for u in mh:
        assert dual[u][0] == mh[u], u
        assert dual[u][1] == wn[u], u
