"""Connected components by iterative min-label propagation — the
cluster-resolution primitive shared by text dedup (MinHash candidate
graph) and image dedup (phash near-dup graph).

Each round every node takes the min of its own label and its
neighbors' labels; converges in O(component diameter) rounds
(duplicate clusters are shallow — near-cliques — so typically 2-3).
Each iteration is one shuffle join + map-side min agg; labels are
localCheckpointed so lineage stays one round deep (the same
driver-fixpoint discipline as the crawl). At 10^10 nodes this is the
standard large-scale CC shape (label propagation, never a driver-side
union-find). Labels are the node ids themselves, so any orderable id
type works (long doc ids, string image ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(<id_col>, cluster_id): cluster_id = the smallest node id
    reachable from the node through ``pairs`` (undirected), itself if
    isolated. ``nodes`` must contain every id (including isolated
    ones); ``pairs`` rows are candidate edges."""
    edges = pairs.select(
        F.col(a_col).alias("_src"), F.col(b_col).alias("_dst")
    ).unionByName(pairs.select(F.col(b_col).alias("_src"), F.col(a_col).alias("_dst")))
    edges = edges.localCheckpoint(eager=True)
    labels = (
        nodes.select(F.col(id_col).alias("_id"))
        .distinct()
        .withColumn("_label", F.col("_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["_dst"] == labels["_id"])
            .groupBy(F.col("_src").alias("_id"))
            .agg(F.min("_label").alias("_nlabel"))
        )
        new_labels = (
            labels.join(neigh, "_id", "left")
            .select(
                "_id",
                F.least(F.col("_label"), F.coalesce("_nlabel", F.col("_label"))).alias(
                    "_label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "_id")
            .filter(F.col("n._label") != F.col("o._label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("_id").alias(id_col), F.col("_label").alias("cluster_id")
    )
