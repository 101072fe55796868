"""Text-analysis operators for training-data pipelines — language ID,
quality scoring, token counting, document fingerprinting.

These extend the dedup engine with the per-document filters a large-scale
corpus pipeline runs before/alongside dedup. Everything here is pure
Catalyst column expressions (JVM-side, whole-stage codegen) — no UDFs — and
every op has an exact ANSI-SQL twin for the DuckDB oracle (only integer
arithmetic and IEEE division/sqrt, so values match bit-for-bit across
engines).

Tokenization: split on single spaces, consistent with the dedup shingling
(FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately tiny, deterministic marker sets (a real deployment would swap
# in fastText-style models via a pandas UDF; the heuristic keeps the oracle
# SQL-expressible)
STOPWORDS_EN = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that",
)
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}
PUNCT_CLASS = r"[^.,;:!?]"


def tokens_col(text: Column) -> Column:
    return F.split(text, " ", -1)


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens_col(text)))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def stopword_count(text: Column, stops: tuple[str, ...] = STOPWORDS_EN) -> Column:
    sset = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(tokens_col(text), lambda t: F.array_contains(sset, t)))


# GPT-2-style pre-tokenizer shape, lookahead-free so the Java (Spark) and
# RE2 (DuckDB) engines count identically: contractions, optionally-space-
# prefixed letter runs / digit runs / punctuation runs. Counting matches of
# this pattern is the standard cheap estimate of BPE token count for
# training-data budgeting (whitespace token_count above is the other tier).
BPE_SPLIT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_estimate(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN))


def marker_count(text: Column, markers: tuple[str, ...]) -> Column:
    mset = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens_col(text), lambda t: F.array_contains(mset, t)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features. Ratios are exact int/int IEEE divisions.

    The classic pre-training quality heuristics (Gopher/C4-style): doc
    length, mean word length, type-token ratio, stopword ratio, punctuation
    density.
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    return docs.select(
        F.col("url"),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        (distinct_token_count(t) / n_tok).alias("type_token_ratio"),
        ((F.length(t) - n_tok + 1) / n_tok).alias("mean_token_len"),
        (stopword_count(t) / n_tok).alias("stopword_ratio"),
        (punct_count(t) / F.length(t)).alias("punct_ratio"),
        bpe_token_estimate(t).cast("long").alias("bpe_token_estimate"),
    )


def quality_features_sql(doc_source_sql: str) -> str:
    """DuckDB twin of quality_features; doc_source_sql must yield
    (url, text)."""
    stops = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    bpe_pat = BPE_SPLIT_PATTERN.replace("'", "''")  # SQL string escaping
    return f"""
WITH d AS ({doc_source_sql}),
t AS (
  SELECT url, text, string_split(text, ' ') AS toks, length(text) AS n_chars
  FROM d
)
SELECT
  url,
  n_chars,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct_tokens,
  len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS type_token_ratio,
  (n_chars - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_token_len,
  len(list_filter(toks, x -> x IN ({stops}))) / CAST(len(toks) AS DOUBLE)
    AS stopword_ratio,
  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / CAST(n_chars AS DOUBLE)
    AS punct_ratio,
  CAST(len(regexp_extract_all(text,
       '{bpe_pat}')) AS BIGINT) AS bpe_token_estimate
FROM t
"""


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language classifier: argmax of per-language marker
    counts, ties broken by language code order, 'und' when all zero."""
    t = F.col(text_col)
    counts = {lang: marker_count(t, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    # when-chain in sorted language order: first language reaching `best`
    # wins ties, 'und' when no marker matched at all
    expr = None
    for lang in sorted(LANG_MARKERS):
        cond = (counts[lang] == best) & (best > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    pred = expr.otherwise(F.lit("und"))
    sel = [F.col("url"), pred.alias("lang_pred")]
    sel += [counts[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)]
    return docs.select(*sel)


def language_id_sql(doc_source_sql: str) -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = []
    for lang in langs:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(string_split(text, ' '), x -> x IN ({markers})))"
            f" AS score_{lang}"
        )
    when_chain = " ".join(
        f"WHEN score_{lang} = best AND best > 0 THEN '{lang}'" for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    return f"""
WITH d AS ({doc_source_sql}),
s AS (SELECT url, {", ".join(score_exprs)} FROM d),
b AS (SELECT *, {greatest} AS best FROM s)
SELECT url, CASE {when_chain} ELSE 'und' END AS lang_pred,
       {", ".join(f"score_{lang}" for lang in langs)}
FROM b
"""


def doc_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: sha256 of the text bytes plus a cheap prefix
    key (the stage-1 cascade key shape, engine-neutral form)."""
    t = F.col(text_col)
    return docs.select(
        F.col("url"),
        F.sha2(F.encode(t, "UTF-8"), 256).alias("content_sha256"),
        F.substring(t, 1, 32).alias("prefix32"),
        F.length(t).alias("n_chars"),
    )


def doc_fingerprints_sql(doc_source_sql: str) -> str:
    return f"""
SELECT url, sha256(text) AS content_sha256, substr(text, 1, 32) AS prefix32,
       length(text) AS n_chars
FROM ({doc_source_sql})
"""
