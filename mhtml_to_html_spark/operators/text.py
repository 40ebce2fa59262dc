"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-overlap heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting. All built from JVM-side
``pyspark.sql.functions`` — no Python in the hot path — and all
expressible in portable SQL so DuckDB oracles can replay them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists; deterministic, shared with the SQL
# oracles (the corpus is synthetic, so these are the operator's contract
# rather than a linguistic claim)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"],
}

TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# every character the punctuation ratio does NOT count: the JVM `translate`
# char-map removes exactly these, so length(translate(text, ALNUM_WS, ''))
# equals the old n_chars - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', ''))
# — same integer for every input (Java \s = [ \t\n\x0B\f\r]) at ~7x less CPU
# (regexp_replace walks a Pattern match loop per char; translate is one map
# lookup per char). Equality pinned by tests incl. unicode/null/empty cases.
ALNUM_WS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n\x0b\x0c\r"
)


def spread_small(docs: DataFrame) -> DataFrame:
    """Spread a few-split input across the cluster ONLY when the scan
    under-partitioned it (a toy parquet arrives as one or two splits,
    so a heavy per-row projection would run on one or two cores). At
    real scale the scan already yields splits sized by
    spark.sql.files.maxPartitionBytes and this is a no-op — an
    unconditional repartition would be a gratuitous full round-robin
    shuffle of the corpus text (the round-2 simhash/minhash bench
    regressions). Shared by the dedup operators (historically
    dedup._spread_small) and, since r6, the map-heavy text projections:
    at sf1 the documents scan is 2 splits, so quality/repetition/
    curation ran on 2 of 32 cores (docs_curate 6.3s -> 2.0s from the
    spread alone)."""
    spark = docs.sparkSession
    n_par = max(spark.sparkContext.defaultParallelism, 4)
    if docs.rdd.getNumPartitions() >= n_par:
        return docs
    return docs.repartition(n_par)


def tokens_col(text_col: str = "text"):
    """Whitespace tokens of the lower-cased text."""
    return F.filter(F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != "")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace count + a BPE-ish
    regex token count (letters runs, digit runs, single punctuation)."""
    return spread_small(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_col()).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0))
        .cast("long")
        .alias("bpe_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality signals with
    a combined [0,1] score."""
    n_chars = F.length("text").cast("double")
    # translate char-map == the old regexp_replace count, ~7x cheaper
    # (see ALNUM_WS note)
    n_punct = F.length(F.translate(F.col("text"), ALNUM_WS, "")).cast("double")
    toks = tokens_col()
    n_tokens = F.size(toks).cast("double")
    stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop)).cast("double")
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1.0)), 6)
    stop_hit = F.round(n_stop / F.lit(len(LANG_STOPWORDS["en"])), 6)
    len_score = F.round(F.least(n_chars / F.lit(500.0), F.lit(1.0)), 6)
    return spread_small(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_hit.alias("stopword_hit"),
        len_score.alias("len_score"),
        F.round((len_score + (F.lit(1.0) - punct_ratio) + stop_hit) / F.lit(3.0), 6).alias(
            "quality"
        ),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language guess: for each language, the number
    of distinct tokens hitting its stopword list; highest count wins
    (ties broken by language code)."""
    toks = F.array_distinct(tokens_col())
    scored = spread_small(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[
            F.size(F.array_intersect(toks, F.array([F.lit(w) for w in words]))).alias(f"hits_{lang}")
            for lang, words in sorted(LANG_STOPWORDS.items())
        ],
    )
    langs = sorted(LANG_STOPWORDS)
    # greatest-by: build (hits, lang) structs and take array_max — the
    # struct comparison breaks ties by the *negated* lang rank so the
    # alphabetically-first language wins equal scores
    pairs = F.array(
        *[
            F.struct(F.col(f"hits_{lang}").alias("hits"), F.lit(-i).alias("rank"))
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(pairs)
    lang_expr = F.element_at(F.array(*[F.lit(lang) for lang in langs]), -best["rank"] + 1)
    return scored.select(
        "doc_id",
        F.when(best["hits"] > 0, lang_expr).otherwise(F.lit("und")).alias("predicted_lang"),
        best["hits"].cast("long").alias("hits"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lower-cased text (rolling-hash analogue that
    both engines compute identically)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    return spread_small(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )


def ngrams_col(toks, n: int):
    """Word n-grams of a token array as an array<string> column (empty
    when the document has fewer than ``n`` tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngram_count(grams):
    """Count of the single most frequent element: longest equal-run
    over the SORTED array, one O(n log n) sort + one O(n) aggregate
    scan per row. The naive form — transform(array_distinct(g),
    x -> size(filter(g, y -> y = x))) — rebuilds the gram array inside
    the lambda for every distinct gram (lambda bodies are outside
    whole-stage codegen's subexpression elimination), going
    O(distinct·total) array constructions per row: ~400x slower on
    sf0.01 documents once the bench actually executed it. Returns 0
    for an empty array."""
    step_cur = lambda acc, x: F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1))
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(0).alias("best"),
            F.lit(0).alias("cur"),
            F.lit(None).cast("string").alias("prev"),
        ),
        lambda acc, x: F.struct(
            F.greatest(acc["best"], step_cur(acc, x)).alias("best"),
            step_cur(acc, x).alias("cur"),
            x.alias("prev"),
        ),
        lambda acc: acc["best"],
    )


def repetition_metrics(docs: DataFrame, n: int = 2, top_frac_max: float = 0.18) -> DataFrame:
    """Gopher/C4-style intra-document repetition filter signals:

    - ``dup_ngram_frac``: fraction of the document's word n-gram
      OCCURRENCES that are repeats (1 - distinct/total);
    - ``top_ngram_frac``: fraction of occurrences taken by the single
      most frequent n-gram;
    - ``repetitive``: the Gopher-style keep/drop flag
      (top fraction above ``top_frac_max``).

    Scale shape: every metric is computed INSIDE the row over the token
    array (transform/filter/aggregate higher-order functions) — a
    map-only projection with no explode, no shuffle, no UDF; the
    per-row cost is O(total log total) — the most-frequent count is a
    sort + longest-equal-run scan (:func:`top_ngram_count`). The
    DuckDB oracle replays the same list algebra.
    (Rae et al., Gopher §A.1.1 repetition filters; C4's boilerplate
    heuristics — public-paper semantics, Spark-native shape.)"""
    # materialize toks, THEN grams, each as its own aliased column:
    # ngrams_col's transform lambda indexes the token array per gram,
    # and a lambda body re-evaluates any non-column expression it
    # references — feeding tokens_col() in directly re-ran the regexp
    # split per gram (5x slower at sf0.1). The aliases are non-cheap
    # and multiply-referenced, so CollapseProject keeps the Projects
    # separate — one evaluation each, still a single stage.
    g = spread_small(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col().alias("toks"),
    ).select(
        "doc_id",
        ngrams_col(F.col("toks"), n).alias("grams"),
    )
    grams = F.col("grams")
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    dup_frac = F.when(total > 0, F.round(1.0 - distinct / total, 6)).otherwise(F.lit(0.0))
    top_frac = F.when(total > 0, F.round(top_ngram_count(grams) / total, 6)).otherwise(
        F.lit(0.0)
    )
    m = g.select(
        "doc_id",
        total.cast("long").alias("n_ngrams"),
        dup_frac.alias("dup_ngram_frac"),
        top_frac.alias("top_ngram_frac"),
    )
    # referencing the materialized column keeps the aggregate evaluated
    # once (inlining top_frac here would re-run the whole run-scan)
    return m.select("*", (F.col("top_ngram_frac") > top_frac_max).alias("repetitive"))


def corpus_stats(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, avg_chars, p50_chars, p95_chars): per-language
    length distribution — the curation dashboard numbers a pipeline
    watches while filtering. EXACT percentiles (Spark `percentile`,
    linear interpolation — the same definition as DuckDB quantile_cont,
    so the oracle replays bit-close and round(4) closes the gap); at
    100 TB the same query swaps in approx_percentile for one pass."""
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
            F.round(F.expr("percentile(n_chars, 0.95)"), 4).alias("p95_chars"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval (Robertson/Spärck Jones): the query's
    ``k`` best documents by the standard Okapi formula with
    idf = ln((N − df + 0.5)/(df + 0.5) + 1).

    Shape at scale:
    - per-doc term frequencies come from ONE explode + partial-agg
      groupBy, pre-filtered to the query's terms (a literal array —
      the filter prunes the explode output before the shuffle, so only
      matching-term rows move);
    - document lengths are a second partial agg over the same scan;
    - document frequencies for the handful of query terms are a tiny
      agg whose result BROADCASTS back (the classic tiny-dim join);
    - the final score is one groupBy(doc) sum + top-k via
      TakeOrderedAndProject. No UDFs anywhere.
    Determinism: round(6) at the score boundary, ties to lowest
    doc_id; N/avg_len enter as exact aggregates."""
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        raise ValueError("empty query")
    q_lit = F.array(*[F.lit(t) for t in q_terms])

    toks = tokens_col()
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(toks).alias("term")
    ).filter(F.array_contains(q_lit, F.col("term")))
    tf = base.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))

    lens = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("double").alias("dl"),
    )
    stats = lens.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avg_dl")
    ).collect()[0]
    n_docs, avg_dl = float(stats["n_docs"]), float(stats["avg_dl"])

    df_tbl = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)

    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .join(lens, "doc_id")
        .withColumn(
            "s",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avg_dl))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)


def unigram_nll(docs: DataFrame, smoothing: float = 0.5) -> DataFrame:
    """CCNet-style statistical quality signal: per-document mean
    negative log-likelihood under a corpus-trained UNIGRAM language
    model (CCNet buckets CommonCrawl by LM perplexity; the unigram
    model is its honest no-external-weights stand-in — the corpus
    itself is the training set).

    Model: p(t) = (count(t) + s) / (total + s·|V|), additive smoothing
    ``s``; score(d) = −(1/|d|) Σ ln p(tᵢ) over the doc's tokens.

    Shape at scale: ONE explode feeds both the model (token counts —
    partial-agg groupBy) and the scoring join; the global totals are
    two broadcast scalars; the per-doc score is one more partial-agg
    groupBy. The vocabulary table joins on the term the explode
    already shuffles on. Determinism: round(6) at the score boundary,
    exact integer counts everywhere else."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.explode(tokens_col()).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count("*").cast("double").alias("cnt"))
    g = vocab.agg(
        F.sum("cnt").alias("total"), F.count("*").cast("double").alias("v")
    ).collect()[0]
    total, v_size = float(g["total"]), float(g["v"])
    logp = F.log((F.col("cnt") + smoothing) / (total + smoothing * v_size))
    return (
        toks.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(-F.avg(logp), 6).alias("nll"),
        )
        .select("doc_id", "n_tokens", "nll")
    )
