"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013 /
TPAMI 2014): learn an orthogonal rotation R that aligns the embedding
space with the PQ subspace grid before quantizing, minimizing
||X·R − recon||² — on anisotropic/correlated data the rotation
recovers most of the accuracy plain PQ loses to subspace correlation.

Training alternates (the classic OPQ-NP loop):
  1. encode the rotated corpus with the current PQ codebooks;
  2. reconstruct each vector from its codes;
  3. R ← U·Vᵀ from the SVD of Xᵀ·recon (the Procrustes solution);
  4. retrain codebooks on the re-rotated corpus.

Shape at scale:
- the rotation is a driver-held dim×dim matrix; applying it is one
  vectorized numpy matmul inside mapInPandas (Arrow batches — a dense
  dim×dim matmul is exactly what built-in column expressions cannot
  express efficiently, the sanctioned pandas-UDF case);
- the Procrustes cross-matrix Xᵀ·recon is a dim×dim accumulation:
  computed per Arrow batch in numpy and REDUCED as dim² tiny rows
  through one partial-aggregating groupBy — no driver-side row pass;
- the SVD runs on the driver over a dim×dim matrix (numpy/LAPACK) —
  a few thousand floats, never data rows;
- encoding/ADC reuse operators/pq.py unchanged on the rotated space.

Correctness contract (DuckDB-replayable since round 4): every
engine-boundary value is quantized — rotated vectors and Procrustes
cross-matrix cells at 6 decimals, codebooks by pq_train's own rule —
so the oracle can replay the SAME alternating trajectory in SQL
(rotate -> per-subspace Lloyd's -> encode -> reconstruct -> cross
matrix), with numpy used only for the dim x dim SVD at oracle-build
time; the final check SQL rotates with the learned R inlined as
literals and replays train+encode+ADC like the PQ oracle. Determinism
is pinned by tests, plus a recall test showing OPQ beating plain PQ
on correlated data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pq import pq_encode, pq_topk_from_codes, pq_train


def _rotate(embeddings: DataFrame, R) -> DataFrame:
    """(vec_id, embedding·R): one vectorized matmul per Arrow batch.
    Rotated values snap to the DYADIC grid 2^-20 (~1e-6), not a
    decimal grid: dyadic values are exactly representable in doubles,
    so every downstream sum/mean in Lloyd's is order-independent and
    bit-identical between engines. A decimal round(6) here would put
    cluster means exactly on the HALF-boundaries of pq_train's own
    round(6) (means of 1e-6-grid multiples), where Spark's BigDecimal
    HALF_UP and DuckDB's float-path round disagree — observed
    immediately at sf0.01. floor(x*2^20 + 0.5) also ties identically
    in numpy and SQL, unlike round-half-to-even vs half-away. The
    BLAS-vs-list-algebra accumulation drift (~1e-13) can still flip a
    grid cell with probability ~1e-7 per value; deterministic per
    dataset, absorbed by the gate's one-time check."""
    rows_R = [[float(v) for v in row] for row in R]

    def apply(batches):
        import numpy as np
        import pandas as pd

        Rm = np.array(rows_R, dtype=np.float64)
        for pdf in batches:
            X = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)))
            out = np.floor((X @ Rm) * 1048576.0 + 0.5) / 1048576.0
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": [r.tolist() for r in out]}
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        apply, schema="vec_id long, embedding array<double>"
    )


def _cross_matrix(embeddings: DataFrame, recon: DataFrame, dim: int):
    """Xᵀ·recon as a dim×dim numpy matrix: per-batch outer-product
    partial sums reduced through one groupBy over dim² tiny rows."""
    joined = embeddings.select(
        "vec_id", F.col("embedding").alias("x")
    ).join(recon.select("vec_id", F.col("embedding").alias("y")), "vec_id")

    def partial(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.float64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            X = np.stack(pdf["x"].map(lambda a: np.asarray(a, dtype=np.float64)))
            Y = np.stack(pdf["y"].map(lambda a: np.asarray(a, dtype=np.float64)))
            acc += X.T @ Y
        if not any_rows:
            return
        i, j = [int(a) for a in range(dim) for _ in range(dim)], [
            int(b) for _ in range(dim) for b in range(dim)
        ]
        yield pd.DataFrame({"i": i, "j": j, "v": acc.reshape(-1)})

    cells = joined.mapInPandas(partial, schema="i int, j int, v double")
    # dyadic 2^-10 snap per cell: the comparison boundary before the
    # SVD — the oracle's single SQL sum and this partial-sum tree
    # accumulate in different orders (drift ~1e-11 on O(100) cells);
    # the coarse grid makes a cell flip ~1e-8-improbable while both
    # engines hand numpy's SVD bit-identical input (same machine, same
    # LAPACK => the same R). M only steers training, so the coarse
    # quantization costs nothing downstream.
    rows = (
        cells.groupBy("i", "j")
        .agg((F.floor(F.sum("v") * F.lit(1024.0) + F.lit(0.5)) / F.lit(1024.0)).alias("v"))
        .collect()
    )
    import numpy as np

    M = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        M[r["i"], r["j"]] = r["v"]
    return M


def _reconstruct(enc: DataFrame, books) -> DataFrame:
    """(vec_id, embedding): decode PQ codes back to centroids — a
    narrow projection (codebooks inline as literals)."""
    parts = [
        F.element_at(
            F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in book]),
            F.col(f"code{s}") + 1,
        )
        for s, book in enumerate(books)
    ]
    return enc.select("vec_id", F.flatten(F.array(*parts)).alias("embedding"))


def opq_train(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    n_iter: int = 2,
    n_opq_iter: int = 2,
):
    """Returns (R, books): the learned orthogonal rotation (dim×dim,
    driver-held) and the PQ codebooks trained on the rotated corpus."""
    import numpy as np

    dim = len(embeddings.select("embedding").first()["embedding"])
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    R = np.eye(dim)
    books = None
    base = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda v: v.cast("double")).alias("embedding"),
    ).localCheckpoint(eager=True)
    for _ in range(n_opq_iter):
        rotated = _rotate(base, R).localCheckpoint(eager=True)
        books = pq_train(rotated, m=m, n_codes=n_codes, n_iter=n_iter)
        recon = _reconstruct(pq_encode(rotated, books), books)
        # Procrustes: R <- U V^T of X^T * recon (X unrotated)
        M = _cross_matrix(base, recon, dim)
        U, _s, Vt = np.linalg.svd(M)
        R = U @ Vt
    # retrain codebooks once on the FINAL rotation: the loop updates R
    # after training, so the last books correspond to the previous
    # rotation — encoding must use codebooks from the same space it
    # rotates into (also what makes the DuckDB replay one chain:
    # rotate with the final R literal, then train+encode+ADC in SQL)
    books = pq_train(_rotate(base, R).localCheckpoint(eager=True), m=m, n_codes=n_codes, n_iter=n_iter)
    return R, books


def opq_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    n_iter: int = 2,
    n_opq_iter: int = 2,
) -> DataFrame:
    """(vec_id, adc_dist): PQ/ADC in the learned rotated space —
    rotation preserves L2 distances, so ADC semantics carry over
    unchanged; only the subspace grid moves."""
    import numpy as np

    R, books = opq_train(embeddings, m, n_codes, n_iter, n_opq_iter)
    rotated = _rotate(
        embeddings.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.transform("embedding", lambda v: v.cast("double")).alias("embedding"),
        ),
        R,
    ).localCheckpoint(eager=True)
    enc = pq_encode(rotated, books)
    q = np.asarray(
        rotated.filter(F.col("vec_id") == query_vec_id).first()["embedding"],
        dtype=np.float64,
    )
    return pq_topk_from_codes(
        enc, books, [float(v) for v in q], k=k, exclude_vec_id=query_vec_id
    )
