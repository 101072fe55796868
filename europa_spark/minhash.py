"""MinHash/LSH near-duplicate path — the block-mean-hash + Qdrant radius
search (SURVEY.md H6/J2/J3) re-expressed as signatures + band equi-joins.

Reference semantics being preserved:
  * signature generation per unique content (BlockMeanHash.cs:46-99 — the
    "higher-resolution" signature; ours is MinHash num_perm=128 over word
    k-shingles per FIXTURES.md §3),
  * radius similarity search with a threshold (QdrantRepository.cs:184-206)
    -> LSH band self-join, an equi-join by construction,
  * exact re-verification at the threshold (QdrantRepository.cs:192) ->
    exact Jaccard on stored shingle-hash sets, computed JVM-side via
    array_intersect/array_union (no Python in the verify hot path).

Scale design (north rule: explicit skew handling):
  * signatures are computed once per DISTINCT content (caller passes the
    representatives set, europa_spark.exact.representatives);
  * band buckets above ``cfg.bucket_cap`` are routed to a linear star-edge
    path (member -> bucket min) instead of the quadratic all-pairs self-join
    — a 10k-member boilerplate bucket yields 10k candidates, not 50M
    (FIXTURES.md §1 block E is the adversarial fixture);
  * sub-cap buckets go through a plain equi-join; AQE skew-join splitting
    handles residual per-key hotness;
  * all shuffled relations are narrow (ids + 64-bit hashes); the wide
    ``shingles`` arrays are only joined in at the final verify step.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .config import DedupConfig, CANONICAL

_U64 = np.uint64
# polynomial base for combining token hashes into shingle hashes (odd, fixed)
_SHINGLE_BASE = _U64(0x9E3779B97F4A7C15)


def _token_hash(tok: str, cache: dict) -> int:
    h = cache.get(tok)
    if h is None:
        h = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
        )
        cache[tok] = h
    return h


def _shingle_hashes_np(text: str, k: int, cache: dict) -> np.ndarray:
    """Distinct 64-bit hashes of word k-grams (split on single spaces,
    FIXTURES.md §3). Docs shorter than k words hash the whole token list."""
    toks = text.split(" ")
    th = np.fromiter(
        (_token_hash(t, cache) for t in toks), dtype=_U64, count=len(toks)
    )
    n = len(th)
    if n == 0:
        return np.empty(0, dtype=_U64)
    kk = min(k, n)
    m = n - kk + 1
    acc = np.zeros(m, dtype=_U64)
    for j in range(kk):
        acc = acc * _SHINGLE_BASE + th[j : j + m]
    return np.unique(acc)


def make_shingle_udf(cfg: DedupConfig = CANONICAL):
    from pyspark.sql.functions import pandas_udf

    k = cfg.shingle_k

    @pandas_udf(ArrayType(LongType()))
    def shingle_hashes(text: pd.Series) -> pd.Series:
        cache: dict = {}
        return pd.Series(
            [
                _shingle_hashes_np(t if t is not None else "", k, cache)
                .view(np.int64)
                .tolist()
                for t in text
            ]
        )

    return shingle_hashes


def _perm_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """num_perm multiply-shift hash params, seeded (FIXTURES.md §3 seed=42).
    Universal family h_i(x) = a_i*x + b_i mod 2^64 with odd a_i."""
    rng = np.random.default_rng(cfg.seed)
    a = rng.integers(1, 1 << 63, size=cfg.num_perm, dtype=np.uint64) * _U64(2) + _U64(1)
    b = rng.integers(0, 1 << 63, size=cfg.num_perm, dtype=np.uint64)
    return a, b


def make_minhash_udf(cfg: DedupConfig = CANONICAL):
    from pyspark.sql.functions import pandas_udf

    a, b = _perm_params(cfg)
    num_perm = cfg.num_perm
    # chunk rows so the (num_perm x total_shingles) matrix stays ~100 MB
    max_cells = 16_000_000

    @pandas_udf(ArrayType(LongType()))
    def minhash_sig(shingles: pd.Series) -> pd.Series:
        out: list[list[int]] = []
        arrs = [
            np.asarray(s, dtype=np.int64).view(_U64)
            if s is not None and len(s) > 0
            else np.empty(0, dtype=_U64)
            for s in shingles
        ]
        i = 0
        while i < len(arrs):
            # grow a chunk up to the cell budget
            j, cells = i, 0
            while j < len(arrs) and (cells == 0 or cells + len(arrs[j]) * num_perm <= max_cells):
                cells += len(arrs[j]) * num_perm
                j += 1
            chunk = arrs[i:j]
            lens = np.array([len(c) for c in chunk])
            nonempty = [c for c in chunk if len(c)]
            if nonempty:
                s = np.concatenate(nonempty)
                x = a[:, None] * s[None, :] + b[:, None]          # uint64 wrap
                offs = np.zeros(len(nonempty), dtype=np.int64)
                np.cumsum([len(c) for c in nonempty[:-1]], out=offs[1:])
                mins = np.minimum.reduceat(x, offs, axis=1)        # (P, rows)
            mi = 0
            for ln in lens:
                if ln == 0:
                    # degenerate signature — quarantined upstream, but keep a
                    # deterministic sentinel rather than exploding
                    out.append([np.iinfo(np.int64).max] * num_perm)
                else:
                    out.append(mins[:, mi].view(np.int64).tolist())
                    mi += 1
            i = j
        return pd.Series(out)

    return minhash_sig


def with_signatures(reps: DataFrame, cfg: DedupConfig = CANONICAL) -> DataFrame:
    """reps(url, extracted, ...) -> + shingles ARRAY<BIGINT>,
    minhash ARRAY<BIGINT>. One Arrow round-trip per UDF; everything else
    stays JVM-side."""
    sh = make_shingle_udf(cfg)
    mh = make_minhash_udf(cfg)
    return reps.withColumn("shingles", sh(F.col("extracted"))).withColumn(
        "minhash", mh(F.col("shingles"))
    )


def band_table(sigs: DataFrame, cfg: DedupConfig = CANONICAL) -> DataFrame:
    """(url, band_idx, band_hash) — signature split into b bands of r rows,
    each band hashed JVM-side (xxhash64 over the slice + band index). The
    'vector DB collection' becomes this plain table (SURVEY.md S6/J2)."""
    r = cfg.rows_per_band
    bands = F.array(
        *[
            F.xxhash64(F.slice(F.col("minhash"), i * r + 1, r), F.lit(i))
            for i in range(cfg.bands)
        ]
    )
    return sigs.select(
        "url", F.posexplode(bands).alias("band_idx", "band_hash")
    )


def candidate_pairs(bands: DataFrame, cfg: DedupConfig = CANONICAL) -> DataFrame:
    """Distinct candidate (url_a < url_b) pairs from band collisions.

    Buckets <= bucket_cap: all-pairs equi self-join (J2). Oversized buckets:
    linear star edges to the bucket minimum — explicit skew cap (north rule);
    connectivity is preserved through the bucket representative while work
    stays O(bucket) instead of O(bucket^2).
    """
    w = Window.partitionBy("band_idx", "band_hash")
    sized = bands.withColumn("bucket_n", F.count("*").over(w)).withColumn(
        "bucket_min", F.min("url").over(w)
    )
    normal = sized.filter(F.col("bucket_n").between(2, cfg.bucket_cap)).select(
        "band_idx", "band_hash", "url"
    )
    a = normal.alias("a")
    b = normal.alias("b")
    normal_pairs = a.join(b, ["band_idx", "band_hash"]).filter(
        F.col("a.url") < F.col("b.url")
    ).select(F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b"))

    hot_pairs = (
        sized.filter(
            (F.col("bucket_n") > cfg.bucket_cap)
            & (F.col("url") != F.col("bucket_min"))
        )
        .select(F.col("bucket_min").alias("url_a"), F.col("url").alias("url_b"))
    )
    return normal_pairs.unionByName(hot_pairs).distinct()


def verify_pairs(
    candidates: DataFrame, sigs: DataFrame, cfg: DedupConfig = CANONICAL
) -> DataFrame:
    """Exact-Jaccard confirmation of candidates (J3). JVM-side set algebra on
    the stored shingle arrays — the pandas-UDF-free verify path."""
    sh = sigs.select(F.col("url"), F.col("shingles"))
    j = (
        candidates.join(sh.withColumnRenamed("url", "url_a").withColumnRenamed("shingles", "sh_a"), "url_a")
        .join(sh.withColumnRenamed("url", "url_b").withColumnRenamed("shingles", "sh_b"), "url_b")
        .withColumn(
            "score",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return (
        j.filter(F.col("score") >= F.lit(cfg.jaccard_threshold))
        .select("url_a", "url_b", F.lit("minhash").alias("method"), "score")
    )


def minhash_pairs(
    reps: DataFrame, cfg: DedupConfig = CANONICAL, sigs: DataFrame | None = None
) -> DataFrame:
    """Full near-dup path: representatives -> confirmed minhash pairs."""
    if sigs is None:
        sigs = with_signatures(reps, cfg)
    cands = candidate_pairs(band_table(sigs, cfg), cfg)
    return verify_pairs(cands, sigs, cfg)
