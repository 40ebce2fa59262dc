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
    from .text import LANG_STOPWORDS, tokens_col

    toks = tokens_col()
    dtoks = F.array_distinct(toks)
    n_tokens = F.size(toks).cast("long")

    # language ID (text.language_id's formula)
    langs = sorted(LANG_STOPWORDS)
    pairs = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(dtoks, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]]))
                ).alias("hits"),
                F.lit(-i).alias("rank"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(pairs)
    predicted = F.when(
        best["hits"] > 0,
        F.element_at(F.array(*[F.lit(lang) for lang in langs]), -best["rank"] + 1),
    ).otherwise(F.lit("und"))

    # quality (text.quality_score's formula)
    n_chars = F.length("text").cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9\\s]", ""))
    ).cast("double")
    stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1.0)), 6)
    stop_hit = F.round(
        F.size(F.array_intersect(dtoks, stop)).cast("double") / F.lit(float(len(LANG_STOPWORDS["en"]))),
        6,
    )
    len_score = F.round(F.least(n_chars / F.lit(500.0), F.lit(1.0)), 6)
    quality = F.round((len_score + (F.lit(1.0) - punct_ratio) + stop_hit) / F.lit(3.0), 6)

    # repetition (text.repetition_metrics' formula)
    grams = F.when(
        F.size(toks) >= ngram_n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (ngram_n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(ngram_n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    top_cnt = F.array_max(
        F.transform(F.array_distinct(grams), lambda g: F.size(F.filter(grams, lambda x: x == g)))
    )
    top_frac = F.when(total > 0, F.round(top_cnt / total, 6)).otherwise(F.lit(0.0))

    reason = (
        F.when(n_tokens < min_tokens, F.lit("too_short"))
        .when(~predicted.isin(*allowed_langs), F.lit("bad_lang"))
        .when(quality < min_quality, F.lit("low_quality"))
        .when(top_frac > top_frac_max, F.lit("repetitive"))
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tokens.alias("n_tokens"),
        predicted.alias("predicted_lang"),
        quality.alias("quality"),
        top_frac.alias("top_ngram_frac"),
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )
