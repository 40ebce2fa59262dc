"""Training-data pipeline assembly operators.

The ops a 100 TB pretraining-data pipeline runs AFTER cleaning/dedup:

- :func:`hash_split` — deterministic train/val/test assignment by a
  salted md5 of the key: reproducible across runs, engines, and
  repartitionings (``rand()`` is none of those), and a new document
  lands in its split without touching any other row;
- :func:`stratified_sample` — per-group deterministic top-N by hash
  order (seeded shuffling without an RNG), for eval carve-outs and
  per-language quota sampling;
- :func:`tfidf_top_terms` — corpus vocabulary statistics + top TF-IDF
  terms per document, the vocab/keyword stage of data curation;
- :func:`pack_sequences` — token-budget bin packing (which training
  shard does each doc land in) via a DISTRIBUTED exclusive prefix sum,
  never a partitionless window;
- :func:`contamination` — shingle overlap of the corpus against a
  held-out benchmark subset (the decontamination check), broadcast
  semi-join on the shingle so the eval universe never shuffles the
  corpus side.

All are JVM-side column expressions (the prefix sum's numbering pass is
the one Arrow-batched mapInPandas), and all are replayable in DuckDB —
hashes are md5, ranks are row_number over explicit total orders,
floats are rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles_col
from .text import tokens_col

DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def split_bounds(splits=DEFAULT_SPLITS) -> list[tuple[str, str]]:
    """(name, upper-bound) pairs for all but the last split, where the
    bound is the first 4 hex digits of the cumulative weight — fixed-
    width lowercase hex compares identically as a string in Spark and
    DuckDB, so the assignment is portable without hex→int conversion."""
    bounds, acc = [], 0.0
    for name, w in splits[:-1]:
        acc += w
        bounds.append((name, format(int(acc * 65536), "04x")))
    return bounds


def hash_split(docs: DataFrame, splits=DEFAULT_SPLITS, seed: str = "split") -> DataFrame:
    """(doc_id, split): deterministic split assignment. The bucket is
    the first 4 hex digits of md5('<seed>:<doc_id>') compared against
    cumulative-weight bounds — every engine and every run agrees, and
    membership depends only on the row's own key (safe under
    incremental ingestion; a shuffle or sort never changes splits)."""
    h4 = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))), 1, 4
    )
    col = None
    for name, bound in split_bounds(splits):
        cond = h4 < F.lit(bound)
        col = F.when(cond, name) if col is None else col.when(cond, name)
    col = col.otherwise(splits[-1][0]) if col is not None else F.lit(splits[-1][0])
    return docs.select(F.col("doc_id").cast("long").alias("doc_id"), col.alias("split"))


def stratified_sample(
    docs: DataFrame, n_per_group: int = 20, group_col: str = "lang", seed: str = "sample"
) -> DataFrame:
    """(doc_id, <group>, rk): the n_per_group hash-first documents of
    each group — a seeded deterministic shuffle (order by md5 of the
    salted key) instead of an RNG draw. The per-group window is a
    hash-partitioned shuffle on the group key; Spark's window-group-
    limit rewrite turns the rank filter into a per-partition top-N, so
    no group's full membership is ever sorted in one task beyond N."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy(group_col).orderBy(F.col("_h"), F.col("doc_id"))
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), F.col(group_col), h.alias("_h")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_group)
        .select("doc_id", group_col, F.col("rk").cast("long").alias("rk"))
    )


def tfidf_top_terms(docs: DataFrame, top_k: int = 5) -> DataFrame:
    """(doc_id, term, tf, df, score, rk): top-k TF-IDF terms per doc.

    Shape at scale: the token explode feeds TWO partial-aggregating
    groupBys ((doc, term) term frequencies, then term document
    frequencies — the second aggregates the already-small first), the
    corpus size joins in as a broadcast scalar, and the per-doc top-k
    is a window-group-limit rank. Scores are rounded to 6 decimals so
    cross-engine libm differences can't reorder the ranking."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(tokens_col()).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count_distinct(F.col("doc_id")).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            F.col("rk").cast("long").alias("rk"),
        )
    )


def pack_sequences(docs: DataFrame, budget: int = 256) -> DataFrame:
    """(doc_id, n_tokens, bin_id): token-budget packing — documents in
    doc_id order fill fixed-budget training shards; a doc's shard is
    floor(exclusive-prefix-sum(tokens) / budget).

    The prefix sum is :func:`assign_prefix_sum`'s two-pass distributed
    form (range partition → per-partition cumsum → offset broadcast) —
    the naive ``Window.orderBy(doc_id)`` with no partitionBy computes
    the same column through a single task and dies at scale."""
    from ..frontier.indexing import assign_prefix_sum

    sized = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
    )
    cum = assign_prefix_sum(sized, ["doc_id"], "n_tokens", out_col="_cum_before")
    return cum.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("_cum_before") / F.lit(budget)).cast("long").alias("bin_id"),
    )


def contamination(docs: DataFrame, eval_mod: int = 97) -> DataFrame:
    """(doc_id, n_shingles, n_contaminated, contamination): what
    fraction of each training document's distinct 3-gram shingles also
    appears in the held-out benchmark subset (doc_id % eval_mod == 0
    stands in for the eval suite) — the decontamination gate.

    The eval shingle universe is tiny relative to the corpus, so it
    broadcasts and the corpus side is ONE semi-join probe + one
    partial-aggregating groupBy; the corpus never shuffles on the
    shingle. Docs with no shingles are excluded (ratio undefined)."""
    sh = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(shingles_col()).alias("shingle")
    )
    is_eval = (F.col("doc_id") % F.lit(eval_mod)) == 0
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    train = sh.filter(~is_eval)
    totals = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        train.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    n_hit = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        n_hit.cast("long").alias("n_contaminated"),
        F.round(n_hit / F.col("n_shingles"), 6).alias("contamination"),
    )
