"""Distributed Lloyd's k-means over an embedding column — the
centroid-training stage for IVF ANN (``similarity.ivf_topk`` consumes
centroids; this is where they come from).

Shape at scale, per iteration:
- centroids are k rows — they BROADCAST; the n×k distance evaluation is
  a map-only crossJoin with no shuffle of the big side;
- the argmin per vector is ``min(struct(dist, cid))`` — a partial
  aggregation (combiner halves the shuffle), never a window sort;
- the new means are one partial-aggregating groupBy(cid) with one
  ``avg`` column per dimension — k×dim numbers reach the driver, not
  vectors;
- the driver holds ONLY the k×dim centroid matrix between iterations
  (the classic Lloyd's-on-MapReduce shape) — never vector rows.

Reproducibility contract (what makes a DuckDB oracle possible):
deterministic init (the k lowest-id vectors), centroids QUANTIZED to 6
decimals at every iteration boundary (so cross-engine float-sum
ordering cannot flip an assignment), distances accumulated in a fixed
left-to-right element order, ties broken by centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(embeddings: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, embedding, cid): nearest centroid per vector (squared
    L2, left-to-right accumulation, ties to the lowest cid)."""
    spark = embeddings.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cid int, c array<double>"
    )
    dist = F.aggregate(
        F.zip_with(
            "embedding",
            "c",
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        embeddings.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cdf))
        .withColumn("dist", dist)
        .groupBy("vec_id", "embedding")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
        .select("vec_id", "embedding", F.col("m.cid").alias("cid"))
    )


def kmeans_fit(embeddings: DataFrame, k: int = 4, n_iter: int = 2) -> DataFrame:
    """Lloyd's k-means: returns (cid, pos, val, size) — the trained
    centroid matrix exploded to one row per (cluster, dimension), plus
    each cluster's final membership count. An empty cluster keeps its
    previous centroid (standard Lloyd's rule, and the rule the oracle
    replays)."""
    spark = embeddings.sparkSession
    dim = len(embeddings.select("embedding").first()["embedding"])
    init_rows = embeddings.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    centroids = [[round(float(v), 6) for v in r["embedding"]] for r in init_rows]

    sizes = {i: 0 for i in range(k)}
    for _ in range(n_iter):
        assigned = _assign(embeddings, centroids)
        stats = assigned.groupBy("cid").agg(
            F.count("*").alias("size"),
            *[
                F.round(F.avg(F.element_at("embedding", i + 1).cast("double")), 6).alias(
                    f"c{i}"
                )
                for i in range(dim)
            ],
        ).collect()
        by_cid = {r["cid"]: r for r in stats}
        sizes = {i: (by_cid[i]["size"] if i in by_cid else 0) for i in range(k)}
        centroids = [
            [float(by_cid[i][f"c{j}"]) for j in range(dim)] if i in by_cid else centroids[i]
            for i in range(k)
        ]

    rows = [
        (cid, pos, centroids[cid][pos], sizes[cid]) for cid in range(k) for pos in range(dim)
    ]
    return spark.createDataFrame(rows, "cid int, pos int, val double, size long").orderBy(
        "cid", "pos"
    )


def kmeans_predict(embeddings: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, cid): assignment under a fixed centroid matrix — the
    IVF cell-routing step at query/index time."""
    return _assign(embeddings, centroids).select("vec_id", "cid")
