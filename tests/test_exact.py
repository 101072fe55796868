"""Exact-dup cascade vs planted truth (FIXTURES.md blocks B/E/F)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from europa_spark.exact import (
    exact_clusters,
    exact_membership,
    exact_pairs,
    representatives,
    with_content_hash,
)
from europa_spark.extract import split_quarantine, with_extracted


@pytest.fixture(scope="module")
def clean(spark, docs_df):
    clean, _ = split_quarantine(with_extracted(docs_df))
    return clean.cache()


def _expected_exact_pairs(corpus):
    return {
        (a, b)
        for a, b, m, _ in corpus.expected_pairs.itertuples(index=False)
        if m == "exact"
    }


def test_membership_matches_truth(spark, clean, corpus):
    m = exact_membership(clean).cache()
    # every planted exact pair shares a content_hash
    h = {r["url"]: r["content_hash"] for r in m.collect()}
    for a, b in _expected_exact_pairs(corpus):
        assert h[a] == h[b], (a, b)
    # group sizes: clusters of >=2 == number of urls in exact components
    n_dup_rows = m.filter(F.col("group_size") > 1).count()
    # truth: urls appearing in any exact pair
    urls = set()
    for a, b in _expected_exact_pairs(corpus):
        urls.add(a)
        urls.add(b)
    assert n_dup_rows == len(urls)


def test_cascade_equals_single_pass(spark, clean):
    """The prefix cascade must produce identical dup groupings to the
    single-pass hash (it only re-keys provably-unique rows)."""
    m1 = exact_membership(clean, use_cascade=False)
    m2 = exact_membership(clean, use_cascade=True)
    g1 = {(r["url"], r["exact_group_id"]) for r in
          m1.filter("group_size > 1").collect()}
    g2 = {(r["url"], r["exact_group_id"]) for r in
          m2.filter("group_size > 1").collect()}
    assert g1 == g2


def test_clusters_shape_and_order(spark, clean, corpus):
    cl = exact_clusters(exact_membership(clean))
    rows = cl.collect()
    assert all(r["n_members"] >= 2 for r in rows)
    for r in rows:
        ts = [m["warc_ts"] for m in r["members"]]
        assert ts == sorted(ts, reverse=True), "members must be newest-first"
        assert r["cluster_id"] == min(m["url"] for m in r["members"])


def test_exact_pairs_star_edges(spark, clean, corpus):
    """Star edges must connect exactly the planted exact components."""
    pairs = exact_pairs(exact_membership(clean)).collect()
    # each group of size n emits n-1 edges, all anchored at the min url
    by_anchor: dict[str, set[str]] = {}
    for r in pairs:
        assert r["url_a"] < r["url_b"]
        by_anchor.setdefault(r["url_a"], set()).add(r["url_b"])
    # closure of star edges == planted exact pair closure
    planted = _expected_exact_pairs(corpus)
    comp: dict[str, set[str]] = {}
    for a, b in planted:
        comp.setdefault(a, set()).add(b)
    # build closure sets from star edges and from planted pairs; compare
    def closure(edges: dict[str, set[str]]) -> set[frozenset]:
        groups = []
        for anchor, members in edges.items():
            groups.append(frozenset({anchor} | members))
        return set(groups)

    got_groups = closure(by_anchor)
    # planted closure via union-find
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in planted:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict[str, set[str]] = {}
    for u in list(parent):
        want.setdefault(find(u), set()).add(u)
    assert got_groups == {frozenset(v) for v in want.values()}


def test_representatives_collapse(spark, clean):
    hashed = with_content_hash(clean)
    reps = representatives(hashed)
    assert reps.count() == hashed.select("content_hash").distinct().count()
    assert reps.groupBy("content_hash").count().filter("count > 1").count() == 0
