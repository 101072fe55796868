"""Physical-plan assertions: predicate pushdown to the parquet scan, narrow
shuffles, broadcast of small id maps — the 'is this the plan you'd want at
100x scale' checks (SURVEY.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from europa_spark.config import DedupConfig
from europa_spark.pipeline import apply_filters


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lang_filter_pushed_to_scan(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    filtered = apply_filters(docs, DedupConfig(langs=("en", "de")))
    plan = _executed(filtered.select("url"))
    assert "PushedFilters" in plan
    assert "In(lang" in plan, plan[:2000]


def test_exclude_filter_pushed(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    filtered = apply_filters(docs, DedupConfig(exclude_langs=("ru",)))
    plan = _executed(filtered.select("url"))
    assert "PushedFilters" in plan, plan[:2000]
    # single-element isin folds to Not(EqualTo); multi-element stays Not(In)
    assert "Not(EqualTo(lang,ru))" in plan or "Not(In(lang" in plan, plan[:2000]


def test_column_pruning_on_narrow_projection(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    plan = _executed(docs.select("url", "lang"))
    # ReadSchema must not include the wide html/text columns
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "html" not in rs and "text" not in rs, rs


def test_broadcast_hint_config_gated(spark, corpus_dir):
    """r2 VERDICT #6: broadcast hints must be config-gated. Default cfg
    still CHOOSES broadcast at test scale (the hint works); with
    broadcast_hints=False the static plan contains no broadcast exchange
    for the winners semi-join (AQE may still pick one at runtime from
    actual sizes — that is the desired fallback, not a hint)."""
    from europa_spark.exact import exact_membership
    from europa_spark.extract import split_quarantine, with_extracted
    from europa_spark.minhash import maybe_broadcast

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    clean, _ = split_quarantine(with_extracted(docs))
    clean = clean.select("url", "warc_ts", "extracted")
    membership = exact_membership(clean)
    winners = membership.filter(
        F.col("url") == F.col("exact_group_id")
    ).select("url")

    hinted = clean.join(
        maybe_broadcast(winners, DedupConfig()), "url", "left_semi"
    )
    assert "BroadcastHashJoin" in _executed(hinted)
    assert (
        "ResolvedHint (strategy=broadcast"
        in hinted._jdf.queryExecution().analyzed().toString()
    )

    unhinted = clean.join(
        maybe_broadcast(winners, DedupConfig(broadcast_hints=False)),
        "url",
        "left_semi",
    )
    # no BROADCAST hint node in the plan — whatever join the optimizer picks
    # now comes from its own stats/AQE, which is exactly the hints-off
    # contract. (Non-broadcast SHUFFLE_HASH hints are a different, always-on
    # design decision — exact.py/substring.py avoid sorting wide relations —
    # and legitimately remain in the plan.)
    assert (
        "ResolvedHint (strategy=broadcast"
        not in unhinted._jdf.queryExecution().analyzed().toString()
    )


def test_pipeline_green_without_broadcast_hints(spark, corpus_dir):
    """The hints-off deployment path (>10^9 docs) must produce identical
    results, not just parse."""
    from europa_spark.pipeline import run

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    on = run(docs)
    off = run(docs, cfg=DedupConfig(broadcast_hints=False))
    try:
        assert sorted(map(tuple, on["report"].collect())) == sorted(
            map(tuple, off["report"].collect())
        )
    finally:
        on["release"]()
        off["release"]()


def test_exact_membership_shuffles_are_narrow(spark, corpus_dir):
    """The membership window shuffles (url, warc_ts, content_hash) — never
    the document text."""
    import re

    from europa_spark.exact import exact_membership
    from europa_spark.extract import split_quarantine, with_extracted

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    clean, _ = split_quarantine(with_extracted(docs))
    plan = _executed(exact_membership(clean))
    for m in re.finditer(r"Exchange ([^\n]*)", plan):
        assert "extracted" not in m.group(1) and "text" not in m.group(1)