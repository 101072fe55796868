"""Transitive clustering — deterministic closure of the reference's greedy
group-claiming (SimilarImageFinder.ProcessGroupsForFinalList,
Api/Implementations/SimilarImages/SimilarImageFinder.cs:340-411).

The reference consumes groups in channel-completion order and claims whole
neighbor sets greedily — order-dependent and nondeterministic (SURVEY.md
§2.9 delta 1). We compute the transitive closure instead: connected
components over the confirmed pair graph via iterative "hash-to-min" label
propagation (DataFrame self-joins), which is reproducible and satisfies the
cluster-membership gate.

Scale notes:
  * converges in O(diameter) rounds; our graphs have tiny diameters because
    exact groups and hot LSH buckets emit STAR edges (anchor = min url), so
    3-6 rounds cover web corpora;
  * ``localCheckpoint`` each round cuts the growing lineage (Catalyst does
    not optimize across iterations, SURVEY.md §4);
  * per-round convergence check is a single count on the label-change delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iter: int = 25, checkpoint_every: int = 1
) -> DataFrame:
    """pairs(url_a, url_b, ...) -> (url, cluster_id = min url of component).

    Only nodes appearing in >= 1 edge are emitted (singletons are not
    clusters; SimilarImageFinder.cs:119 keeps groups of >= 2 only).
    """
    edges = pairs.select("url_a", "url_b").distinct()
    # symmetric adjacency (undirected graph as two directed edges)
    adj = edges.unionByName(
        edges.select(
            F.col("url_b").alias("url_a"), F.col("url_a").alias("url_b")
        )
    ).localCheckpoint()

    # size the loop's shuffles to the graph, not the corpus: the pair graph
    # is typically orders of magnitude smaller than the input (only dups have
    # edges), and each round issues several shuffles — at the session-wide
    # partition count the loop is pure scheduling overhead on small graphs
    # (observed 13s for a 60k-edge graph at 64 partitions vs ~2s right-sized).
    # ~1M edges per partition; floor 4, ceiling = session setting.
    spark = pairs.sparkSession
    n_edges = adj.count()  # cheap: materialized by the checkpoint above
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_parts = max(4, min(session_parts, 1 + n_edges // 1_000_000))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        return _cc_loop(adj, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _cc_loop(adj: DataFrame, max_iter: int) -> DataFrame:

    # init: label(v) = min(v, min neighbor)
    labels = (
        adj.groupBy(F.col("url_a").alias("url"))
        .agg(F.min("url_b").alias("label"))
        .select("url", F.least("url", "label").alias("label"))
        .localCheckpoint()
    )

    for it in range(max_iter):
        # propagate: every neighbor's label is a candidate for mine. The old
        # label rides along (is_old tag) so the convergence check falls out
        # of the same aggregation — no extra join/shuffle per round.
        prop = (
            adj.join(labels, adj["url_b"] == labels["url"])
            .select(F.col("url_a").alias("url"), "label", F.lit(False).alias("is_old"))
        )
        stepped = (
            prop.unionByName(labels.withColumn("is_old", F.lit(True)))
            .groupBy("url")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("is_old"), F.col("label"))).alias("old_label"),
            )
        )
        # pointer doubling: also adopt my label's label — turns the
        # O(diameter) propagation into O(log diameter) rounds
        lut = stepped.select(
            F.col("url").alias("l_url"), F.col("label").alias("l_label")
        )
        final_label = F.least(
            F.col("label"), F.coalesce(F.col("l_label"), F.col("label"))
        )
        new_labels = (
            stepped.join(lut, stepped["label"] == lut["l_url"], "left")
            .select(
                "url",
                final_label.alias("label"),
                (final_label != F.col("old_label")).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # also cuts lineage
        changed = new_labels.filter("changed").count()  # cheap: materialized
        labels = new_labels.select("url", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"union-find did not converge in {max_iter} rounds")

    return labels.select("url", F.col("label").alias("cluster_id"))


def cluster_members(
    components: DataFrame, docs: DataFrame
) -> DataFrame:
    """Expand components back over documents (C2, SimilarImageFinder.cs:
    430-471): (cluster_id, n_members, members newest-first)."""
    joined = docs.join(components, "url").select(
        "cluster_id", "warc_ts", "url"
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.reverse(
                F.array_sort(F.collect_list(F.struct("warc_ts", "url")))
            ).alias("members"),
        )
        .filter(F.col("n_members") >= 2)
    )
