"""Training-data pipeline assembly operators (operators/pipeline.py):
hash split, stratified sampling, TF-IDF, sequence packing,
decontamination — semantics plus the plan shapes that survive scale."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.mark.spark
def test_hash_split_partitions_corpus(spark):
    from mhtml_to_html_spark.operators.pipeline import hash_split

    docs = _docs(spark)
    n_docs = docs.count()
    split = hash_split(docs)
    rows = {r["doc_id"]: r["split"] for r in split.collect()}
    assert len(rows) == n_docs  # full coverage, one split per doc
    counts = {}
    for s in rows.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) <= {"train", "val", "test"}
    # 80/10/10 within a loose tolerance at n=50
    assert counts["train"] / n_docs > 0.6
    # assignment is a pure function of the key: repartitioning the
    # input must not move any document
    again = {
        r["doc_id"]: r["split"] for r in hash_split(docs.repartition(7)).collect()
    }
    assert again == rows


@pytest.mark.spark
def test_hash_split_custom_weights(spark):
    from mhtml_to_html_spark.operators.pipeline import hash_split

    split = hash_split(_docs(spark), splits=(("a", 0.5), ("b", 0.5)))
    got = {r["split"] for r in split.collect()}
    assert got <= {"a", "b"} and len(got) == 2


@pytest.mark.spark
def test_stratified_sample_quota_and_determinism(spark):
    from mhtml_to_html_spark.operators.pipeline import stratified_sample

    docs = _docs(spark)
    group_sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    sample = stratified_sample(docs, n_per_group=5)
    rows = sample.collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["lang"], []).append((r["rk"], r["doc_id"]))
    for lang, members in per_group.items():
        assert len(members) == min(5, group_sizes[lang])
        assert sorted(rk for rk, _ in members) == list(range(1, len(members) + 1))
    # same seed -> same sample
    assert sorted((r["lang"], r["rk"], r["doc_id"]) for r in rows) == sorted(
        (r["lang"], r["rk"], r["doc_id"]) for r in stratified_sample(docs, n_per_group=5).collect()
    )
    # different seed -> (overwhelmingly) different selection order
    other = stratified_sample(docs, n_per_group=5, seed="other")
    assert {r["doc_id"] for r in rows} != {r["doc_id"] for r in other.collect()}


@pytest.mark.spark
def test_tfidf_rare_terms_outrank_common(spark):
    from pyspark.sql import Row

    from mhtml_to_html_spark.operators.pipeline import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common rareword"),
            Row(doc_id=2, text="common common"),
            Row(doc_id=3, text="common filler"),
        ]
    )
    top = tfidf_top_terms(docs, top_k=2)
    d1 = {r["rk"]: r for r in top.filter("doc_id = 1").collect()}
    # 'rareword' (df=1) must outrank 'common' (df=3, higher tf) in doc 1
    assert d1[1]["term"] == "rareword"
    assert d1[1]["df"] == 1 and d1[2]["term"] == "common" and d1[2]["df"] == 3


@pytest.mark.spark
def test_pack_sequences_matches_sequential_packing(spark):
    from mhtml_to_html_spark.operators.pipeline import pack_sequences
    from mhtml_to_html_spark.operators.text import tokens_col

    import pyspark.sql.functions as F

    docs = _docs(spark)
    budget = 64
    got = {r["doc_id"]: (r["n_tokens"], r["bin_id"]) for r in pack_sequences(docs, budget).collect()}
    # sequential oracle: exclusive prefix sum in doc_id order
    sizes = sorted(
        (r["doc_id"], r["n"])
        for r in docs.select(F.col("doc_id").cast("long").alias("doc_id"), F.size(tokens_col()).alias("n")).collect()
    )
    acc = 0
    for doc_id, n in sizes:
        assert got[doc_id] == (n, acc // budget), doc_id
        acc += n
    # bins are contiguous and monotone in doc_id order
    bins = [got[d][1] for d, _ in sizes]
    assert bins == sorted(bins)


@pytest.mark.spark
def test_contamination_flags_copied_eval_doc(spark):
    from pyspark.sql import Row

    from mhtml_to_html_spark.operators.pipeline import contamination

    eval_text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=eval_text),  # eval doc (0 % 7 == 0)
            Row(doc_id=1, text=eval_text),  # full copy -> contamination 1.0
            Row(doc_id=2, text="one two three four five six"),  # disjoint -> 0.0
            Row(doc_id=3, text="alpha beta gamma nine ten eleven twelve"),
        ]
    )
    got = {r["doc_id"]: r for r in contamination(docs, eval_mod=7).collect()}
    assert set(got) == {1, 2, 3}  # eval docs excluded
    assert got[1]["contamination"] == 1.0
    assert got[2]["contamination"] == 0.0
    assert 0.0 < got[3]["contamination"] < 1.0


@pytest.mark.spark
def test_pack_sequences_no_single_partition_exchange(spark):
    from mhtml_to_html_spark.operators.pipeline import pack_sequences

    from test_plans import plan_of

    plan = plan_of(pack_sequences(_docs(spark), 256))
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan  # the prefix sum must not be a global window


@pytest.mark.spark
def test_contamination_broadcasts_eval_universe(spark):
    from mhtml_to_html_spark.operators.pipeline import contamination

    from test_plans import plan_of

    plan = plan_of(contamination(_docs(spark)))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin LeftSemi" not in plan


@pytest.mark.spark
def test_sessionize_batch_gap_semantics(spark):
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.operators.events import sessionize_batch

    rows = [
        (1, "2024-01-01 10:00:00", 7, 1.0),
        (2, "2024-01-01 10:10:00", 7, 2.0),   # same session (10 min)
        (3, "2024-01-01 11:00:00", 7, 4.0),   # 50 min gap -> new session
        (4, "2024-01-01 10:05:00", 8, 8.0),   # other user
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in sessionize_batch(events, 30).collect()
    )
    assert got == [(7, 1, 4.0), (7, 2, 3.0), (8, 1, 8.0)]


@pytest.mark.spark
def test_corpus_stats_percentiles(spark):
    from mhtml_to_html_spark.operators.text import corpus_stats

    docs = spark.createDataFrame(
        [(i, "x", "en", "s", n) for i, n in enumerate([10, 20, 30, 40])],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = corpus_stats(docs).collect()[0]
    assert r["n_docs"] == 4 and r["avg_chars"] == 25.0
    assert r["p50_chars"] == 25.0  # linear interpolation between 20 and 30
    assert r["p95_chars"] == 38.5


@pytest.mark.spark
def test_repetition_metrics_known_values(spark):
    """Hand-checked repetition signals: 'a b a b a' has bigrams
    [a b, b a, a b, b a] -> dup 0.5, top 0.5; all-distinct text -> 0."""
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (0, "a b a b a"),
            (1, "one two three four five six seven eight nine ten"),
            (2, "x"),
            (3, "go go go go"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert rows[0]["n_ngrams"] == 4
    assert rows[0]["dup_ngram_frac"] == 0.5 and rows[0]["top_ngram_frac"] == 0.5
    assert rows[1]["dup_ngram_frac"] == 0.0 and not rows[1]["repetitive"]
    assert rows[2]["n_ngrams"] == 0 and rows[2]["top_ngram_frac"] == 0.0
    # 'go go' x3 occurrences of the single distinct bigram
    assert rows[3]["top_ngram_frac"] == 1.0 and rows[3]["repetitive"]
    # map-only contract: no shuffle anywhere in the plan
    plan = repetition_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.spark
def test_caption_pair_filter_rules_and_order(spark):
    """First-failing-rule determinism + each rule reachable."""
    from mhtml_to_html_spark.operators.curation import caption_pair_filter

    rows = [
        ("ok", 300, 400, "jpeg", "one two three four five six"),
        ("short", 300, 400, "jpeg", "tiny caption"),
        ("small", 100, 400, "jpeg", "one two three four five six"),
        ("aspect", 200, 900, "png", "one two three four five six"),
        ("format", 300, 400, "tiff", "one two three four five six"),
        # caption_short fires BEFORE too_small (rule order contract)
        ("both", 64, 4000, "tiff", "x"),
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int, fmt string, caption string")
    out = {r["image_id"]: r for r in caption_pair_filter(df).collect()}
    assert out["ok"]["keep"] and out["ok"]["reject_reason"] is None
    assert out["short"]["reject_reason"] == "caption_short"
    assert out["small"]["reject_reason"] == "too_small"
    assert out["aspect"]["reject_reason"] == "bad_aspect"
    assert out["format"]["reject_reason"] == "bad_format"
    assert out["both"]["reject_reason"] == "caption_short"
    plan = caption_pair_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.spark
def test_ngram_jaccard_max_df_drops_stop_shingles(spark):
    """Two docs sharing ONLY boilerplate must pair without the prune
    and disappear with it; a genuinely-duplicated pair must survive."""
    boiler = "all rights reserved contact us terms of service apply now"
    df = spark.createDataFrame(
        [
            (0, boiler + " alpha beta gamma delta"),
            (1, boiler + " epsilon zeta eta theta"),
            (2, "unique payload one two three four five six"),
            (3, "unique payload one two three four five six"),
            (4, boiler + " iota kappa lambda mu"),  # boilerplate df=3 > max_df
        ],
        "doc_id long, text string",
    )
    from mhtml_to_html_spark.operators.dedup import ngram_jaccard_pairs

    plain = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(df, 0.3).collect()}
    pruned = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, 0.3, max_df=2).collect()
    }
    assert (0, 1) in plain, "boilerplate-only pair should pass without the prune"
    assert (0, 1) not in pruned, "stop-shingle prune must kill the boilerplate pair"
    assert (2, 3) in plain and (2, 3) in pruned, "real duplicates survive the prune"


@pytest.mark.spark
def test_curate_documents_matches_standalone_signals(spark):
    """The fused curation projection must agree with the standalone
    oracle-pinned operators on every shared column, stay shuffle-free,
    and apply rules in first-failure order."""
    from mhtml_to_html_spark.operators.curation import curate_documents
    from mhtml_to_html_spark.operators.text import (
        language_id,
        quality_score,
        repetition_metrics,
    )

    docs = _docs(spark)
    fused = {r["doc_id"]: r for r in curate_documents(docs).collect()}
    lang = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()}
    qual = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    rep = {r["doc_id"]: r["top_ngram_frac"] for r in repetition_metrics(docs).collect()}
    for d, r in fused.items():
        assert r["predicted_lang"] == lang[d]
        assert r["quality"] == qual[d]
        assert r["top_ngram_frac"] == rep[d]
        if r["keep"]:
            assert r["reject_reason"] is None
    plan = curate_documents(docs)._jdf.queryExecution().executedPlan().toString()
    # narrow-pipeline contract: no joins and no keyed shuffle anywhere —
    # the only allowed Exchange is the adaptive round-robin input spread
    # (text.spread_small), which moves the slim (doc_id, text) rows once
    # when the scan under-partitioned a toy input and is a no-op at scale
    assert "Join" not in plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert plan.count("Exchange") <= 1


@pytest.mark.spark
def test_curate_documents_rule_order(spark):
    from mhtml_to_html_spark.operators.curation import curate_documents

    df = spark.createDataFrame(
        # short AND repetitive: too_short must win (first failure)
        [(0, "go go go"), (1, "the quick brown fox jumps over the lazy dog again today")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curate_documents(df, min_quality=0.0).collect()}
    assert out[0]["reject_reason"] == "too_short"
    assert out[1]["keep"]


@pytest.mark.spark
def test_bm25_ranks_relevance_and_df_discrimination(spark):
    """A doc matching the rare query term must outrank docs repeating
    a common term (idf discrimination), term frequency saturates (k1),
    and the df table broadcast-joins."""
    from mhtml_to_html_spark.operators.text import bm25_topk

    rows = [
        (0, "needle in a haystack of words here today"),
        (1, "common common common common common words words"),
        (2, "common words and more filler text here now"),
        (3, "common unrelated content about nothing at all"),
        (4, "totally unrelated filler about nothing at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, "needle common", k=5).collect()
    # 'common' hits 3/5 docs (low idf); even tf=5 cannot outrank the
    # df=1 'needle' match
    assert got[0]["doc_id"] == 0, "rare-term match must rank first"
    ids = [r["doc_id"] for r in got]
    assert 4 not in ids, "non-matching docs never score"
    scores = [r["bm25"] for r in got]
    assert scores == sorted(scores, reverse=True)
    plan = bm25_topk(df, "needle common")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(df, "   ")


@pytest.mark.spark
def test_caption_pair_filter_rejects_null_fields(spark):
    """NULL caption/fmt/dimensions must NOT sail through as keep=true
    (every comparison against NULL is NULL): explicit missing_field
    rule fires first."""
    from mhtml_to_html_spark.operators.curation import caption_pair_filter

    df = spark.createDataFrame(
        [
            ("nullcap", 300, 400, "jpeg", None),
            ("nullfmt", 300, 400, None, "one two three four five six"),
            ("nullw", None, 400, "jpeg", "one two three four five six"),
            ("ok", 300, 400, "jpeg", "one two three four five six"),
        ],
        "image_id string, w int, h int, fmt string, caption string",
    )
    out = {r["image_id"]: r for r in caption_pair_filter(df).collect()}
    for bad in ("nullcap", "nullfmt", "nullw"):
        assert out[bad]["reject_reason"] == "missing_field" and not out[bad]["keep"]
    assert out["ok"]["keep"]


@pytest.mark.spark
def test_unigram_nll_orders_typical_before_rare(spark):
    """A document of corpus-typical tokens must score LOWER (more
    likely) than one full of hapax tokens; scores are positive."""
    from mhtml_to_html_spark.operators.text import unigram_nll

    rows = [(i, "alpha beta gamma delta") for i in range(8)]
    rows.append((8, "zzz qqq www uuu"))  # hapax-only doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["nll"] for r in unigram_nll(df).collect()}
    assert all(v > 0 for v in got.values())
    assert got[0] < got[8], "typical doc must be more likely than hapax doc"
    assert got[0] == got[3]  # identical docs, identical scores
