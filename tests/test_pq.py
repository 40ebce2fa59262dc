"""Product-quantization ANN (operators/pq.py): encode/ADC semantics
and the narrow plan shapes that make PQ viable at corpus scale."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _clustered(spark, n=60, dim=16, k=3):
    rng = np.random.default_rng(11)
    rows = [
        (int(i), [round(float(v), 6) for v in rng.normal((i % k) * 5.0, 0.05, size=dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.spark
def test_pq_encode_plan_is_narrow(spark):
    """Encoding a corpus against driver-held codebooks must be one
    map-only projection — no join, no shuffle, no aggregation."""
    from mhtml_to_html_spark.operators.pq import pq_encode, pq_train

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train(emb, m=4, n_codes=4, n_iter=1)
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    for op in ("Join", "Exchange", "Aggregate", "Window"):
        assert op not in plan, f"{op} in encode plan"


@pytest.mark.spark
def test_pq_topk_recovers_cluster_members(spark):
    """On well-separated clusters ADC must rank the query's own cluster
    first: all top-k results share the query's cluster."""
    from mhtml_to_html_spark.operators.pq import pq_topk

    df = _clustered(spark)
    rows = pq_topk(df, query_vec_id=0, k=10, m=4, n_codes=6, n_iter=2).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] % 3 == 0 for r in rows), "ADC leaked cross-cluster neighbours"
    # distances ascend and ties (same-code vectors) break by vec_id
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)


@pytest.mark.spark
def test_pq_topk_deterministic(spark):
    from mhtml_to_html_spark.operators.pq import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = [tuple(r) for r in pq_topk(emb, 0, 10, m=4, n_codes=8, n_iter=2).collect()]
    b = [tuple(r) for r in pq_topk(emb, 0, 10, m=4, n_codes=8, n_iter=2).collect()]
    assert a == b


@pytest.mark.spark
def test_pq_train_rejects_indivisible_dim(spark):
    from mhtml_to_html_spark.operators.pq import pq_train

    df = _clustered(spark, n=10, dim=10)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=4, n_codes=2, n_iter=1)


@pytest.mark.spark
def test_ivfpq_recovers_cluster_members(spark):
    """Residual-PQ within probed cells: the query's own cluster fills
    the top-k on well-separated synthetic clusters."""
    from mhtml_to_html_spark.operators.pq import ivfpq_topk

    df = _clustered(spark)
    rows = ivfpq_topk(df, query_vec_id=0, k=10, n_cells=3, n_probe=1,
                      m=4, n_codes=4, n_iter=2).collect()
    assert len(rows) == 10
    assert all(r["vec_id"] % 3 == 0 for r in rows)
    assert len({r["cell"] for r in rows}) == 1  # one probed cell
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)


@pytest.mark.spark
def test_ivfpq_deterministic_and_probe_prunes(spark):
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.operators.pq import ivfpq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = [tuple(r) for r in ivfpq_topk(emb, 0, 10, n_cells=4, n_probe=2).collect()]
    b = [tuple(r) for r in ivfpq_topk(emb, 0, 10, n_cells=4, n_probe=2).collect()]
    assert a == b
    # results only come from the probed cells
    cells = {t[1] for t in a}
    assert len(cells) <= 2


@pytest.mark.spark
def test_materialized_ivfpq_index_prunes_partitions(spark, tmp_path):
    """write_ivfpq_index + ivfpq_query: results equal the in-memory
    ivfpq_topk, and the probe filter reaches the codes scan as a
    PartitionFilter (the prune is physical, not just logical)."""
    from mhtml_to_html_spark.operators.pq import (
        ivfpq_query,
        ivfpq_topk,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, n_cells=4, m=4, n_codes=8, n_iter=2)
    q_emb = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    from_index = ivfpq_query(spark, path, q_emb, k=10, n_probe=2, exclude_vec_id=0)
    in_memory = ivfpq_topk(emb, 0, 10, n_cells=4, n_probe=2, m=4, n_codes=8, n_iter=2)
    assert [tuple(r) for r in from_index.collect()] == [
        tuple(r) for r in in_memory.collect()
    ]
    plan = from_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters:")[1][:120]


def _correlated(spark, n=240, dim=16, latent=4):
    """Anisotropic data (latent low-rank signal mixed across dims) —
    the regime where plain PQ loses accuracy to subspace correlation
    and OPQ's learned rotation wins it back."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(latent, dim))
    rows = []
    for i in range(n):
        z = rng.normal(size=latent)
        x = z @ A + rng.normal(scale=0.05, size=dim)
        rows.append((int(i), [round(float(v), 6) for v in x]))
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.spark
def test_opq_beats_plain_pq_on_correlated_data(spark):
    from mhtml_to_html_spark.operators.opq import opq_topk
    from mhtml_to_html_spark.operators.pq import pq_topk

    rows, df = _correlated(spark)
    df = df.localCheckpoint()

    def exact(qid, k=10):
        q = np.array(rows[qid][1])
        d = [(float(np.sum((np.array(r[1]) - q) ** 2)), r[0]) for r in rows if r[0] != qid]
        return {v for _, v in sorted(d)[:k]}

    k, rec_pq, rec_opq = 10, 0.0, 0.0
    for qid in (0, 7, 13):
        ex = exact(qid, k)
        got_pq = {r["vec_id"] for r in pq_topk(df, qid, k, m=4, n_codes=8, n_iter=2).collect()}
        got_opq = {
            r["vec_id"]
            for r in opq_topk(df, qid, k, m=4, n_codes=8, n_iter=2, n_opq_iter=2).collect()
        }
        rec_pq += len(got_pq & ex) / k
        rec_opq += len(got_opq & ex) / k
    assert rec_opq >= rec_pq, f"OPQ recall {rec_opq/3:.2f} < PQ {rec_pq/3:.2f}"


@pytest.mark.spark
def test_opq_rotation_is_orthogonal_and_deterministic(spark):
    from mhtml_to_html_spark.operators.opq import opq_train, opq_topk

    _, df = _correlated(spark, n=80)
    df = df.localCheckpoint()
    R, books = opq_train(df, m=4, n_codes=4, n_iter=1, n_opq_iter=2)
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-8), "R not orthogonal"
    assert len(books) == 4 and len(books[0]) == 4
    a = [tuple(r) for r in opq_topk(df, 0, 5, m=4, n_codes=4, n_iter=1).collect()]
    b = [tuple(r) for r in opq_topk(df, 0, 5, m=4, n_codes=4, n_iter=1).collect()]
    assert a == b
