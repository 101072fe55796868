"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-duplicate pipeline on sf0.001;
``queries()`` exposes each implemented operator from SURVEY.md §2 over the
pre-registered testdata tables; ``oracle_sql()`` gives the DuckDB twin for
every SQL-expressible query (signature-UDF stages get rows-only checks and
are gated by the planted-truth pytest suite instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from europa_spark.adapters import URL_SQL, load_canonical, load_embeddings
from europa_spark.ann import (
    ann_ivf,
    ann_lsh,
    embedding_dup_pairs,
    embedding_dup_pairs_sql,
    knn_cosine,
    knn_exact_quantized,
    knn_exact_quantized_sql,
)
from europa_spark.config import CANONICAL
from europa_spark.exact import exact_membership, exact_clusters, representatives, with_content_hash
from europa_spark.extract import split_quarantine, with_extracted
from europa_spark.minhash import minhash_pairs
from europa_spark.pipeline import run
from europa_spark.quality import (
    doc_fingerprints,
    doc_fingerprints_sql,
    language_id,
    language_id_sql,
    quality_features,
    quality_features_sql,
)
from europa_spark.simhash import simhash_pairs
from europa_spark.substring import substring_pairs

# DuckDB view `documents` has the driver schema (doc_id, text, lang, source,
# n_chars); this CTE maps it to the canonical (url, text, lang) shape used by
# every oracle — the exact SQL twin of adapters.to_canonical.
DOCS_SQL = f"SELECT {URL_SQL} AS url, text, lang FROM documents"

SHINGLE_K = CANONICAL.shingle_k
JACCARD_T = CANONICAL.jaccard_threshold


def _clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_canonical(spark, sf_dir)
    clean, _ = split_quarantine(with_extracted(docs))
    return clean


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup pipeline report on sf0.001 (every clean doc with
    its cluster id and keep/duplicate decision)."""
    docs = load_canonical(spark, "/root/testdata/sf0.001")
    return run(docs)["report"]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_exact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = exact_membership(_clean(spark, sf_dir))
    return m.select(
        "url", "content_hash",
        F.col("group_size").cast("long").alias("group_size"),
        "exact_group_id",
    )


def _q_exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cl = exact_clusters(exact_membership(_clean(spark, sf_dir)))
    return cl.select(
        "content_hash", "cluster_id", F.col("n_members").cast("long").alias("n_members")
    )


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(_clean(spark, sf_dir), text_col="extracted")


def _q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = language_id(_clean(spark, sf_dir), text_col="extracted")
    casts = [F.col(c).cast("long").alias(c) if c.startswith("score_") else F.col(c)
             for c in out.columns]
    return out.select(*casts)


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprints(_clean(spark, sf_dir), text_col="extracted")


def _q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _clean(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("extracted")).alias("total_chars"),
            (F.sum(F.length("extracted")) / F.count("*")).alias("avg_chars"),
        )
    )


def _q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _clean(spark, sf_dir).select(
        F.explode(F.split("extracted", " ", -1)).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(50)
    )


def _shingle_col(text, k: int):
    toks = F.split(text, " ", -1)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws("\x01", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array(F.concat_ws("\x01", toks)))


def _q_shingle_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact word-5-gram Jaccard pairs >= threshold — the J3
    verifier as a standalone relational operator (engine-neutral)."""
    d = _clean(spark, sf_dir).select(
        "url", _shingle_col(F.col("extracted"), SHINGLE_K).alias("sh")
    )
    a = d.select(F.col("url").alias("url_a"), F.col("sh").alias("sh_a"))
    b = d.select(F.col("url").alias("url_b"), F.col("sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("url_a") < F.col("url_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("url_a", "url_b", "jaccard")
    )


def _q_unigram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard >= 0.5 pairs (unigram variant, non-trivial on the
    sandbox corpus's small vocabulary)."""
    d = _clean(spark, sf_dir).select(
        "url", F.array_distinct(F.split("extracted", " ", -1)).alias("t")
    )
    a = d.select(F.col("url").alias("url_a"), F.col("t").alias("t_a"))
    b = d.select(F.col("url").alias("url_b"), F.col("t").alias("t_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("url_a") < F.col("url_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("t_a", "t_b"))
            / F.size(F.array_union("t_a", "t_b")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("url_a", "url_b", "jaccard")
    )


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH + exact-Jaccard verify. Oracle = brute-force exact
    Jaccard: identical output as long as LSH candidate recall is 1.0 at
    this scale (verification is exact, so false positives are impossible)."""
    clean = _clean(spark, sf_dir)
    reps = representatives(with_content_hash(clean)).select("url", "extracted")
    return minhash_pairs(reps).select("url_a", "url_b", F.col("score").alias("jaccard"))


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = _clean(spark, sf_dir)
    reps = representatives(with_content_hash(clean)).select("url", "extracted")
    return simhash_pairs(reps).select("url_a", "url_b", "score")


def _q_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = _clean(spark, sf_dir)
    reps = representatives(with_content_hash(clean)).select("url", "extracted")
    return substring_pairs(reps).select("url_a", "url_b", "score")


def _q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_canonical(spark, sf_dir)
    return run(docs)["report"]


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_canonical(spark, sf_dir)
    cl = run(docs)["clusters"]
    return cl.select(
        "cluster_id",
        F.col("n_members").cast("long").alias("n_members"),
        F.transform("members", lambda m: m["url"]).alias("member_urls"),
    )


def _q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_canonical(spark, sf_dir)
    _, quar = split_quarantine(with_extracted(docs))
    return quar


def _q_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_exact_quantized(load_embeddings(spark, sf_dir), k=5)


def _q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_cosine(load_embeddings(spark, sf_dir), k=5)


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh(load_embeddings(spark, sf_dir), k=5)


def _q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_dup_pairs(load_embeddings(spark, sf_dir), threshold=0.9)


def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_ivf(load_embeddings(spark, sf_dir), k=5)


# --- multimodal: the testdata tables carry no media bytes, so the binary
# column is constructed deterministically from the text (FAKE fixture format,
# europa_spark.multimodal docstring) — the query then exercises the REAL
# binary-column plumbing: magic-byte type cascade, metadata projection,
# sha2-over-BINARY exact groups, mapInPandas decode+signature.
# header kept printable-ASCII ('01','02' big-endian u16 dims) so the DuckDB
# oracle can build the identical byte string in VARCHAR space (DuckDB 1.0's
# sha256 has no BLOB overload)
_FAKE_HEADER = b"FAKE0102"


def _with_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _clean(spark, sf_dir)
    return d.select(
        "url",
        F.concat(
            F.lit(bytearray(_FAKE_HEADER)), F.encode(F.col("extracted"), "UTF-8")
        ).alias("media"),
    )


def _q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from europa_spark.multimodal import with_media_metadata

    return with_media_metadata(_with_media(spark, sf_dir)).select(
        "url", "media_type", "n_bytes"
    )


def _q_media_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from europa_spark.multimodal import media_exact_dups

    return media_exact_dups(_with_media(spark, sf_dir)).select(
        "url", "media_hash", F.col("group_size").cast("long").alias("group_size"),
        "group_id",
    )


def _q_media_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from europa_spark.multimodal import media_signatures

    return media_signatures(_with_media(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup_report": _q_exact_report,
        "exact_dedup_clusters": _q_exact_clusters,
        "quality_scores": _q_quality,
        "language_id": _q_langid,
        "doc_fingerprints": _q_fingerprints,
        "lang_profile": _q_lang_profile,
        "token_histogram": _q_token_histogram,
        "shingle_jaccard_pairs": _q_shingle_jaccard_pairs,
        "unigram_jaccard_pairs": _q_unigram_jaccard_pairs,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "substring_pairs": _q_substring_pairs,
        "dedup_report": _q_dedup_report,
        "dedup_clusters": _q_dedup_clusters,
        "quarantine": _q_quarantine,
        "knn_quantized": _q_knn_quantized,
        "knn_cosine": _q_knn_cosine,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "embedding_dup_pairs": _q_embedding_dups,
        "media_metadata": _q_media_metadata,
        "media_exact_dups": _q_media_exact_dups,
        "media_signatures": _q_media_signatures,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB). Views: region nation customer supplier part orders
# lineitem events documents embeddings
# ---------------------------------------------------------------------------

_SHINGLES_CTE = f"""
WITH d AS ({DOCS_SQL}),
t AS (SELECT url, string_split(text, ' ') AS toks FROM d),
s AS (
  SELECT url,
         CASE WHEN len(toks) >= {SHINGLE_K}
              THEN list_distinct(list_transform(
                     range(1, len(toks) - {SHINGLE_K} + 2),
                     i -> array_to_string(list_slice(toks, i, i + {SHINGLE_K} - 1),
                                          chr(1))))
              ELSE [array_to_string(toks, chr(1))]
         END AS sh
  FROM t
)
"""


# clean docs (quarantine excluded) + the constructed FAKE media blob — the
# SQL twin of _with_media (header || utf8 text bytes)
_MEDIA_CTE = f"""
WITH d AS ({DOCS_SQL}),
m AS (
  SELECT url, 'FAKE0102' || text AS media
  FROM d
  WHERE text IS NOT NULL AND NOT regexp_matches(text, '^[ \t\n\r\f\x0B]*$')
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup_report": f"""
WITH d AS ({DOCS_SQL})
SELECT url, sha256(text) AS content_hash,
       count(*) OVER (PARTITION BY sha256(text)) AS group_size,
       min(url) OVER (PARTITION BY sha256(text)) AS exact_group_id
FROM d
""",
        "exact_dedup_clusters": f"""
WITH d AS ({DOCS_SQL})
SELECT sha256(text) AS content_hash, min(url) AS cluster_id,
       count(*) AS n_members
FROM d GROUP BY sha256(text) HAVING count(*) > 1
""",
        "quality_scores": quality_features_sql(DOCS_SQL),
        "language_id": language_id_sql(DOCS_SQL),
        "doc_fingerprints": doc_fingerprints_sql(DOCS_SQL),
        "lang_profile": f"""
WITH d AS ({DOCS_SQL})
SELECT lang, count(*) AS n_docs, sum(length(text)) AS total_chars,
       sum(length(text)) / CAST(count(*) AS DOUBLE) AS avg_chars
FROM d GROUP BY lang
""",
        "token_histogram": f"""
WITH d AS ({DOCS_SQL}),
tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM d)
SELECT token, count(*) AS freq FROM tok
GROUP BY token ORDER BY freq DESC, token ASC LIMIT 50
""",
        "shingle_jaccard_pairs": _SHINGLES_CTE
        + f"""
SELECT a.url AS url_a, b.url AS url_b,
       len(list_intersect(a.sh, b.sh))
         / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
FROM s a, s b
WHERE a.url < b.url
  AND len(list_intersect(a.sh, b.sh))
        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= {JACCARD_T}
""",
        "unigram_jaccard_pairs": f"""
WITH d AS ({DOCS_SQL}),
t AS (SELECT url, list_distinct(string_split(text, ' ')) AS tk FROM d)
SELECT a.url AS url_a, b.url AS url_b,
       len(list_intersect(a.tk, b.tk))
         / CAST(len(list_distinct(list_concat(a.tk, b.tk))) AS DOUBLE) AS jaccard
FROM t a, t b
WHERE a.url < b.url
  AND len(list_intersect(a.tk, b.tk))
        / CAST(len(list_distinct(list_concat(a.tk, b.tk))) AS DOUBLE) >= 0.5
""",
        # LSH + exact verify == brute-force exact Jaccard when candidate
        # recall is 1.0 (verified at this scale; fixture tests gate recall)
        "minhash_lsh_pairs": _SHINGLES_CTE
        + f"""
SELECT a.url AS url_a, b.url AS url_b,
       len(list_intersect(a.sh, b.sh))
         / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
FROM s a, s b
WHERE a.url < b.url
  AND len(list_intersect(a.sh, b.sh))
        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= {JACCARD_T}
""",
        "quarantine": f"""
WITH d AS (SELECT {URL_SQL} AS url, text FROM documents)
SELECT url,
       CASE WHEN text IS NULL THEN 'no_content' ELSE 'empty' END AS reason
FROM d
WHERE text IS NULL OR regexp_matches(text, '^[ \t\n\r\f\x0B]*$')
""",
        "knn_quantized": knn_exact_quantized_sql(k=5),
        "embedding_dup_pairs": embedding_dup_pairs_sql(threshold=0.9),
        "media_metadata": _MEDIA_CTE
        + r"""
SELECT url,
       CASE WHEN substr(media, 1, 4) = 'FAKE' THEN 'fake'
            ELSE 'unknown' END AS media_type,
       CAST(octet_length(encode(media)) AS BIGINT) AS n_bytes
FROM m
""",
        "media_exact_dups": _MEDIA_CTE
        + r"""
, h AS (SELECT url, sha256(media) AS media_hash FROM m),
g AS (
  SELECT url, media_hash,
         count(*) OVER (PARTITION BY media_hash) AS group_size,
         min(url) OVER (PARTITION BY media_hash) AS group_id
  FROM h
)
SELECT url, media_hash, group_size, group_id FROM g WHERE group_size > 1
""",
    }
