"""Product Quantization (PQ) ANN — the memory-side complement to IVF.

Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split the embedding into ``m`` subspaces, train a
``n_codes``-entry codebook per subspace (Lloyd's on the sub-vectors),
encode every vector as ``m`` small code ids, and answer queries by
Asymmetric Distance Computation — the query stays exact, each vector's
distance is the sum of per-subspace table lookups.

Shape at scale (the whole point of PQ at 100 TB):
- training reuses :func:`operators.kmeans.lloyd` per subspace —
  broadcast-free narrow assignment + posexploded mean agg;
- the codebooks are driver-held (m × n_codes × dim/m floats, a few KB)
  and inline into expressions as literals;
- ENCODE is one narrow projection (m argmins over sliced arrays) — a
  100 TB corpus becomes m bytes/vector of codes with zero shuffle;
- ADC query is another narrow projection: the m distance tables
  (m × n_codes doubles) inline as array literals, per-vector distance
  is m ``element_at`` lookups + a fixed-order sum, and top-k is
  TakeOrderedAndProject (per-partition heap, no global sort).

Reproducibility contract (DuckDB-replayable, same as kmeans):
deterministic init, 6-decimal quantization of codebooks AND of each
ADC table entry AND of the final summed distance, left-to-right
accumulation, ties to the lowest code/vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import argmin_centroid, lloyd


def pq_train(
    embeddings: DataFrame, m: int = 4, n_codes: int = 8, n_iter: int = 2
) -> list[list[list[float]]]:
    """Train ``m`` per-subspace codebooks; returns
    ``books[s][code][j]`` (each ``dim/m`` wide, 6-decimal quantized)."""
    dim = len(embeddings.select("embedding").first()["embedding"])
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for s in range(m):
        sub_df = embeddings.select(
            "vec_id", F.slice("embedding", s * sub + 1, sub).alias("embedding")
        )
        cents, _ = lloyd(sub_df, k=n_codes, n_iter=n_iter)
        books.append(cents)
    return books


def pq_encode(embeddings: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """(vec_id, code0..code{m-1}): nearest code per subspace — one
    narrow projection, no shuffle."""
    sub = len(books[0][0])
    code_cols = [
        argmin_centroid(F.slice("embedding", s * sub + 1, sub), book)
        .cast("int")
        .alias(f"code{s}")
        for s, book in enumerate(books)
    ]
    return embeddings.select(F.col("vec_id").cast("long").alias("vec_id"), *code_cols)


def _adc_tables(query_vec: list[float], books: list[list[list[float]]]) -> list[list[float]]:
    """Per-subspace distance tables d[s][code] = ||q_s - book[s][code]||²
    (driver-side — m × n_codes doubles), left-to-right accumulation,
    round(6) per entry."""
    sub = len(books[0][0])
    tables = []
    for s, book in enumerate(books):
        qs = query_vec[s * sub : (s + 1) * sub]
        row = []
        for c in book:
            acc = 0.0
            for a, b in zip(qs, c):
                acc += (a - b) * (a - b)
            row.append(round(acc, 6))
        tables.append(row)
    return tables


def pq_topk_from_codes(
    enc: DataFrame,
    books: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Rank an already-encoded corpus against one query: ADC distance =
    fixed-order sum of per-subspace table lookups (tables inline as
    literals), ascending, ties to lowest vec_id. The encode cost is
    paid once per corpus, this per-query step touches only codes."""
    tables = _adc_tables([float(v) for v in query_vec], books)
    adc = None
    for s, row in enumerate(tables):
        term = F.element_at(
            F.array(*[F.lit(float(v)) for v in row]), F.col(f"code{s}") + 1
        )
        adc = term if adc is None else adc + term
    out = enc
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return (
        out.select("vec_id", F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """(vec_id, adc_dist): the query's ``k`` approximate nearest
    neighbours by PQ/ADC — train, encode, rank in one call."""
    books = pq_train(embeddings, m=m, n_codes=n_codes, n_iter=n_iter)
    enc = pq_encode(embeddings, books)
    q_emb = embeddings.filter(F.col("vec_id") == query_vec_id).select("embedding").first()[
        "embedding"
    ]
    return pq_topk_from_codes(
        enc, books, [float(v) for v in q_emb], k=k, exclude_vec_id=query_vec_id
    )
