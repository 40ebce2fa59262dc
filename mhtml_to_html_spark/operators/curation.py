"""Image–caption pair curation for multimodal training data.

The LAION-style admission filter over the input-hint table shape
(image_id, bytes, w, h, fmt, caption, phash): caption token bounds,
minimum resolution, aspect-ratio cap, allowed formats — each pair gets
a ``keep`` flag and the FIRST failing rule as ``reject_reason`` (rules
checked in a fixed, documented order so the reason is deterministic).

Scale shape: one narrow projection over the scan — every rule is a
JVM column expression (no UDF, no shuffle); a parquet reader prunes to
the metadata columns (bytes untouched unless selected downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALLOWED_FMTS = ("jpeg", "png")


def caption_pair_filter(
    images: DataFrame,
    min_caption_tokens: int = 5,
    max_caption_tokens: int = 50,
    min_side: int = 128,
    max_aspect: float = 2.0,
    fmts: tuple[str, ...] = ALLOWED_FMTS,
) -> DataFrame:
    """(image_id, w, h, fmt, caption_tokens, aspect, keep,
    reject_reason): admission decision per image–caption pair.

    Rule order (first failure wins): missing_field (NULL caption/fmt/
    dimensions — without it every NULL comparison below is NULL and a
    broken row would sail through as keep=true), caption_short,
    caption_long, too_small, bad_aspect, bad_format."""
    cap_toks = F.size(F.filter(F.split(F.lower(F.col("caption")), "\\s+"), lambda t: t != ""))
    aspect = F.round(
        F.greatest(F.col("w"), F.col("h")) / F.least(F.col("w"), F.col("h")), 6
    )
    missing = (
        F.col("caption").isNull()
        | F.col("fmt").isNull()
        | F.col("w").isNull()
        | F.col("h").isNull()
    )
    reason = (
        F.when(missing, F.lit("missing_field"))
        .when(cap_toks < min_caption_tokens, F.lit("caption_short"))
        .when(cap_toks > max_caption_tokens, F.lit("caption_long"))
        .when(F.least(F.col("w"), F.col("h")) < min_side, F.lit("too_small"))
        .when(aspect > max_aspect, F.lit("bad_aspect"))
        .when(~F.col("fmt").isin(*fmts), F.lit("bad_format"))
    )
    return images.select(
        F.col("image_id").cast("string").alias("image_id"),
        F.col("w").cast("long").alias("w"),
        F.col("h").cast("long").alias("h"),
        "fmt",
        cap_toks.cast("long").alias("caption_tokens"),
        aspect.alias("aspect"),
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def curate_documents(
    docs: DataFrame,
    min_tokens: int = 10,
    allowed_langs: tuple[str, ...] = ("de", "en", "es", "fr"),
    min_quality: float = 0.5,
    top_frac_max: float = 0.18,
    ngram_n: int = 2,
) -> DataFrame:
    """The end-to-end document admission pipeline: language ID, quality
    score, and repetition signals FUSED into one narrow projection with
    a deterministic first-failing ``reject_reason`` (rule order:
    too_short, bad_lang, low_quality, repetitive).

    Scale shape: re-deriving all three signal families inside a single
    select (instead of joining the standalone operators' outputs) keeps
    the pipeline one scan + zero shuffles — each standalone operator
    remains the unit-testable/oracle-pinned reference for its formula,
    and this composition is pinned by its own oracle replaying the
    fused SQL."""
    from .text import (
        ALNUM_WS,
        LANG_STOPWORDS,
        ngrams_col,
        spread_small,
        tokens_col,
        top_ngram_count,
    )

    # chained narrow projections, each heavy signal ALIASED so it
    # evaluates exactly once: a reference to a non-aliased expression
    # re-evaluates its whole tree, and higher-order functions run
    # outside whole-stage codegen's subexpression elimination — the
    # fused single-select form re-derived toks/grams/intersects per
    # reference (~5x slower once the bench actually measured it).
    # Catalyst still collapses this into one stage: no shuffle, no UDF.
    toks = spread_small(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        tokens_col().alias("toks"),
    )
    arrs = toks.select(
        "doc_id",
        "text",
        "toks",
        F.array_distinct("toks").alias("dtoks"),
        ngrams_col(F.col("toks"), ngram_n).alias("grams"),
    )

    langs = sorted(LANG_STOPWORDS)
    pairs = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        "dtoks", F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
                    )
                ).alias("hits"),
                F.lit(-i).alias("rank"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    n_chars = F.length("text").cast("double")
    # translate char-map == the old regexp_replace count, ~7x cheaper
    # (text.ALNUM_WS note; same integer for every input)
    n_punct = F.length(F.translate(F.col("text"), ALNUM_WS, "")).cast("double")
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    sig = arrs.select(
        "doc_id",
        F.col("text").isNull().alias("text_missing"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_max(pairs).alias("best"),  # language ID (text.language_id's formula)
        # quality components (text.quality_score's formula)
        F.round(F.least(n_chars / F.lit(500.0), F.lit(1.0)), 6).alias("len_score"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1.0)), 6).alias("punct_ratio"),
        F.round(
            F.size(F.array_intersect("dtoks", stop)).cast("double")
            / F.lit(float(len(LANG_STOPWORDS["en"]))),
            6,
        ).alias("stop_hit"),
        # repetition (text.repetition_metrics' formula — sort +
        # longest-run top count, O(n log n) per row)
        F.size("grams").alias("n_grams"),
        top_ngram_count(F.col("grams")).alias("top_cnt"),
    )
    scored = sig.select(
        "doc_id",
        "text_missing",
        "n_tokens",
        F.when(
            F.col("best")["hits"] > 0,
            F.element_at(F.array(*[F.lit(lang) for lang in langs]), -F.col("best")["rank"] + 1),
        )
        .otherwise(F.lit("und"))
        .alias("predicted_lang"),
        F.round(
            (F.col("len_score") + (F.lit(1.0) - F.col("punct_ratio")) + F.col("stop_hit"))
            / F.lit(3.0),
            6,
        ).alias("quality"),
        F.when(
            F.col("n_grams") > 0, F.round(F.col("top_cnt") / F.col("n_grams"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("top_ngram_frac"),
    )

    # missing_field first: with a NULL text every comparison below is
    # NULL, so without this rule a broken row would sail through the
    # when-chain as keep=true on the Spark side while the oracle's
    # nested CASE drifts — same pattern as caption_pair_filter
    reason = (
        F.when(F.col("text_missing"), F.lit("missing_field"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(~F.col("predicted_lang").isin(*allowed_langs), F.lit("bad_lang"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(F.col("top_ngram_frac") > top_frac_max, F.lit("repetitive"))
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "predicted_lang",
        "quality",
        "top_ngram_frac",
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )
