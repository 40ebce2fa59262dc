"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the baseline (JVM-side zip_with/aggregate,
no Python); the LSH-bucketed variant is the scale path: deterministic
sign-buckets on leading dimensions prune the candidate set before the
exact rerank — at 10^10 rows only the query's bucket shuffles.

Dot products are summed left-to-right in both Spark and the DuckDB
oracle (list ops are sequential) so the doubles agree bit-for-bit;
results are rounded to 6 dp anyway for hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force top-k by cosine similarity to the embedding of
    ``query_vec_id``; the 1-row query side is broadcast."""
    from .text import spread_small

    query = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    # the per-row dot/norm folds are the heavy part; spread an
    # under-partitioned toy scan so they use every core (no-op at scale)
    scored = spread_small(embeddings.filter(F.col("vec_id") != query_vec_id)).crossJoin(
        F.broadcast(query)
    )
    return (
        scored.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round(cosine_similarity_col(F.col("embedding"), F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def neardup_pairs(embeddings: DataFrame, threshold: float = 0.42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact). The O(n²) join is
    the verification kernel; at 10^10 rows it runs WITHIN LSH buckets
    (see lsh_topk's sign-bucketing) so only candidate pairs meet — here
    it runs standalone over the small corpus as its own oracle-checked
    operator."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            F.col("vec_a").cast("long").alias("vec_a"),
            F.col("vec_b").cast("long").alias("vec_b"),
            F.round(cosine_similarity_col(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def neardup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.42, dims: int = 4
) -> DataFrame:
    """Embedding near-dup, the scale shape: sign-bucket LSH candidate
    generation (equi-join on the bucket — a hash join, never a
    BroadcastNestedLoopJoin over the full relation) + the exact cosine
    kernel as the within-bucket rerank. Misses cross-bucket pairs by
    construction (the LSH recall trade); ``neardup_pairs`` is the
    exact all-pairs verifier for corpora small enough to afford it."""
    bucketed = embeddings.withColumn("bucket", _sign_bucket(F.col("embedding"), dims))
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            F.col("vec_a").cast("long").alias("vec_a"),
            F.col("vec_b").cast("long").alias("vec_b"),
            F.round(cosine_similarity_col(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def phash_neardup(images: DataFrame, max_distance: int = 6) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over an image table
    (image_id, phash:int64): Hamming distance via xor + bit_count,
    candidates pruned by 16-bit band equality (pigeonhole: two hashes
    within distance d <= 3 per band share at least one of 4 identical
    bands — at 10^10 images only same-band pairs ever meet in the
    join, never the cross product)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("phash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
            for b in range(4)
        ]
    )
    banded = images.select(
        F.col("image_id"), F.col("phash"), F.explode(bands).alias("band")
    ).select("image_id", "phash", "band.band_idx", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("distance", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("long"))
        .filter(F.col("distance") <= max_distance)
        .select("img_a", "img_b", "distance")
    )


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid cell, probe only the query's ``n_probe`` nearest cells,
    exact cosine rerank inside them. At scale the cell is a partition
    key, so the scan prunes to n_probe/n_cells of the corpus.

    Centroids are the first ``n_cells`` vectors by vec_id — a seeded
    sample standing in for a k-means train step (which would be an
    offline job at 10^10 rows anyway); the IVF plumbing (assignment,
    probe-subset pruning, rerank) is the real shape and is what the
    plan gates check. Assignment is a broadcast join of the tiny
    centroid table + min_by, never a shuffle of the corpus."""
    cents = embeddings.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    assigned = (
        embeddings.join(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.col("cent_id"), _sq_l2(F.col("embedding"), F.col("cvec"))
            ).alias("cell"),
            F.min_by(
                F.struct("embedding"), _sq_l2(F.col("embedding"), F.col("cvec"))
            ).alias("e"),
        )
        .select("vec_id", "cell", F.col("e.embedding").alias("embedding"))
    )
    qcells = (
        assigned.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qvec"))
        .join(F.broadcast(cents))
        .withColumn("qdist", _sq_l2(F.col("qvec"), F.col("cvec")))
        .orderBy("qdist", "cent_id")
        .limit(n_probe)
        .select(F.col("cent_id").alias("cell"), "qvec")
    )
    candidates = assigned.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(qcells), "cell"
    )
    return (
        candidates.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            F.round(cosine_similarity_col(F.col("embedding"), F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def _sign_bucket(vec, dims: int = 4):
    """Deterministic LSH bucket: concatenated signs of the leading dims."""
    return F.concat_ws(
        "", *[F.when(F.element_at(vec, i + 1) >= 0, "1").otherwise("0") for i in range(dims)]
    )


def _flip_bit(bucket, i: int, dims: int):
    """bucket string with sign-bit i flipped (multi-probe neighbor)."""
    return F.concat(
        F.substring(bucket, 1, i),
        F.when(F.substring(bucket, i + 1, 1) == "1", "0").otherwise("1"),
        F.substring(bucket, i + 2, dims - i - 1),
    )


def lsh_topk_multiprobe(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    dims: int = 8,
    probe_distance: int = 1,
) -> DataFrame:
    """ANN top-k with more planes + multi-probe (the 10^10 recall
    shape): ``dims`` sign-planes give 2^dims buckets (so each bucket is
    a small fraction of the corpus), and the query probes its own
    bucket plus every bucket at Hamming distance 1 (dims+1 probes) —
    recall lost to a near-boundary sign flip comes back without
    scanning the corpus. The candidate join stays an equi-join on the
    bucket column (partition-prunable at scale); the exact cosine
    rerank runs only on the probed buckets' rows.

    ``probe_distance`` currently supports 0 (exact bucket) and 1."""
    bucketed = embeddings.withColumn("bucket", _sign_bucket(F.col("embedding"), dims))
    query = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    probes = [F.col("qbucket")]
    if probe_distance >= 1:
        probes += [_flip_bit(F.col("qbucket"), i, dims) for i in range(dims)]
    probe_rows = query.select(
        "qvec", F.explode(F.array(*probes)).alias("bucket")
    )
    candidates = bucketed.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(probe_rows), "bucket"
    )
    return (
        candidates.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("bucket"),
            F.round(cosine_similarity_col(F.col("embedding"), F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def lsh_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10, dims: int = 4) -> DataFrame:
    """IVF/LSH-style ANN: candidates share the query's sign-bucket;
    exact cosine rerank within the bucket. At scale the bucket column
    is a partition key, so the scan prunes to one bucket."""
    bucketed = embeddings.withColumn("bucket", _sign_bucket(F.col("embedding"), dims))
    query = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    candidates = bucketed.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(query), F.col("bucket") == F.col("qbucket")
    )
    return (
        candidates.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("bucket"),
            F.round(cosine_similarity_col(F.col("embedding"), F.col("qvec")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_recall(
    embeddings: DataFrame, query_ids=(0, 7, 13), k: int = 10
) -> DataFrame:
    """Recall@k evaluation harness: each ANN variant (single-bucket
    LSH, multi-probe LSH, IVF) scored against brute-force cosine top-k
    for a panel of query vectors — (method, query_id, recall) rows.

    This is an EVAL harness, not a data-path operator: each top-k list
    is k rows, so collecting them to compare is the correct shape at
    any corpus size (the expensive part — the candidate scans — runs
    distributed inside each variant)."""
    from .pq import pq_encode, pq_topk_from_codes, pq_train

    spark = embeddings.sparkSession
    # PQ codebooks are query-independent: train + encode once, rank per
    # query against the cached codes
    books = pq_train(embeddings, m=4, n_codes=8, n_iter=2)
    enc = pq_encode(embeddings, books).localCheckpoint(eager=True)
    rows = []
    for q in query_ids:
        exact = {r["vec_id"] for r in cosine_topk(embeddings, q, k).collect()}
        q_emb = embeddings.filter(F.col("vec_id") == q).select("embedding").first()[
            "embedding"
        ]
        variants = (
            ("ivf", ivf_topk(embeddings, q, k, n_cells=16, n_probe=4)),
            ("lsh", lsh_topk(embeddings, q, k, dims=4)),
            ("lsh_multiprobe", lsh_topk_multiprobe(embeddings, q, k, dims=8)),
            (
                "pq",
                pq_topk_from_codes(
                    enc, books, [float(v) for v in q_emb], k=k, exclude_vec_id=q
                ),
            ),
        )
        for method, df in variants:
            got = {r["vec_id"] for r in df.collect()}
            rows.append((method, q, round(len(got & exact) / k, 6)))
    return spark.createDataFrame(
        rows, "method string, query_id long, recall double"
    ).orderBy("method", "query_id")


def image_dedup_clusters(
    images: DataFrame, max_distance: int = 6, max_iter: int = 25
) -> DataFrame:
    """(image_id, cluster_id, is_canonical): perceptual-hash duplicate
    clusters over an image table — connected components (shared
    min-label propagation, :mod:`operators.graph`) over the banded-
    Hamming candidate graph of :func:`phash_neardup`; cluster_id = the
    lexicographically smallest member, which is also the canonical
    keep-one representative."""
    from .graph import min_label_components

    pairs = phash_neardup(images, max_distance).select("img_a", "img_b")
    comp = min_label_components(
        images.select("image_id"), pairs, id_col="image_id",
        a_col="img_a", b_col="img_b", max_iter=max_iter,
    )
    return comp.select(
        "image_id",
        "cluster_id",
        (F.col("image_id") == F.col("cluster_id")).alias("is_canonical"),
    )
