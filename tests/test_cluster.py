"""Union-find fixpoint on crafted graphs (SURVEY.md §5.2 item 2)."""

from __future__ import annotations

from europa_spark.cluster import cluster_members, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    return {r["url"]: r["cluster_id"] for r in connected_components(df).collect()}


def test_chain(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert got == {u: "a" for u in "abcde"}


def test_star(spark):
    got = _cc(spark, [("m", x) for x in ["n", "o", "p", "q"]])
    assert got == {u: "m" for u in "mnopq"}


def test_two_components_and_self_loop(spark):
    got = _cc(spark, [("a", "b"), ("x", "y"), ("y", "z"), ("q", "q")])
    assert got["a"] == got["b"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"
    assert got["q"] == "q"


def test_long_chain_converges(spark):
    n = 40
    edges = [(f"u{i:03d}", f"u{i+1:03d}") for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"u000"}


def _cc_hinted(spark, edges):
    # n_edges_hint supplied -> the single-pass adjacency build path
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    return {
        r["url"]: r["cluster_id"]
        for r in connected_components(df, n_edges_hint=len(edges)).collect()
    }


def test_hinted_star_round1_convergence(spark):
    # stars converge at init: round 0's propagate+count job measures zero
    # changes and the loop exits before any pointer doubling
    got = _cc_hinted(spark, [("m", x) for x in ["n", "o", "p", "q"]])
    assert got == {u: "m" for u in "mnopq"}


def test_hinted_multiround(spark):
    # a chain does NOT converge at round 1 — the hinted path must run
    # pointer doubling across rounds and still reach the fixpoint
    edges = [(f"u{i:03d}", f"u{i+1:03d}") for i in range(20)]
    got = _cc_hinted(spark, edges)
    assert set(got.values()) == {"u000"}


def test_hinted_equals_unhinted(spark):
    # seeded random graph: hinted and unhinted adjacency builds agree exactly
    import random

    rng = random.Random(42)
    edges = [
        (f"n{rng.randrange(60):02d}", f"n{rng.randrange(60):02d}")
        for _ in range(80)
    ]
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    hinted = {
        r["url"]: r["cluster_id"]
        for r in connected_components(df, n_edges_hint=len(edges)).collect()
    }
    plain = {
        r["url"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    assert hinted == plain


def test_cluster_members_order(spark):
    import datetime

    comps = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c")], "url string, cluster_id string"
    )
    docs = spark.createDataFrame(
        [
            ("a", datetime.datetime(2025, 1, 1)),
            ("b", datetime.datetime(2025, 1, 2)),
            ("c", datetime.datetime(2025, 1, 3)),
        ],
        "url string, warc_ts timestamp",
    )
    rows = {r["cluster_id"]: r for r in cluster_members(comps, docs).collect()}
    assert list(rows) == ["a"]  # singleton component c is dropped
    assert [m["url"] for m in rows["a"]["members"]] == ["b", "a"]  # newest first


def test_member_cap_two_phase_topk(spark):
    """Member arrays cap at max_members NEWEST via the salted two-phase
    top-K — n_members stays the TRUE count, and the truncated array equals
    the naive global newest-first top-K exactly (a mega boilerplate cluster
    must never materialize whole in one reduce task)."""
    import datetime

    from pyspark.sql import functions as F

    from europa_spark.cluster import cluster_members

    n = 97
    docs = spark.createDataFrame(
        [
            (f"u{i:03d}", datetime.datetime(2020, 1, 1)
             + datetime.timedelta(minutes=i))
            for i in range(n)
        ],
        "url string, warc_ts timestamp",
    )
    comp = docs.select("url", F.lit("u000").alias("cluster_id"))
    out = cluster_members(comp, docs, max_members=10).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_members"] == n
    got = [(m["url"]) for m in row["members"]]
    want = [f"u{i:03d}" for i in range(n - 1, n - 11, -1)]  # newest first
    assert got == want
    # uncapped path unchanged
    full = cluster_members(comp, docs).collect()[0]
    assert full["n_members"] == n and len(full["members"]) == n
    assert [m["url"] for m in full["members"]][:3] == ["u096", "u095", "u094"]


def test_topk_members_carry_survives_truncation(spark):
    """The carry column (a per-key constant, e.g. exact_clusters' winner id)
    must ride through BOTH top-K phases unchanged — including when the
    newest-K truncation drops the carried member itself (the oldest/min
    url of a mega-group is exactly the row most likely to be truncated
    out of the newest-first array)."""
    import datetime

    from pyspark.sql import functions as F

    from europa_spark.cluster import _topk_members

    n = 61
    rows = spark.createDataFrame(
        [
            (
                "h1",
                datetime.datetime(2020, 1, 1) + datetime.timedelta(minutes=i),
                f"u{i:03d}",
                "u000",  # per-key constant: the group's min url
            )
            for i in range(n)
        ],
        "content_hash string, warc_ts timestamp, url string, cluster_id string",
    )
    out = _topk_members(rows, "content_hash", 5, carry=("cluster_id",)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_members"] == n
    assert [m["url"] for m in row["members"]] == [
        f"u{i:03d}" for i in range(n - 1, n - 6, -1)
    ]
    # u000 (the carried winner) was truncated out of members, yet the carry
    # still reports it
    assert row["cluster_id"] == "u000"
    assert "u000" not in [m["url"] for m in row["members"]]
