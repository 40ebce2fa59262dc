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

    Rule order (first failure wins): caption_short, caption_long,
    too_small, bad_aspect, bad_format."""
    cap_toks = F.size(F.filter(F.split(F.lower(F.col("caption")), "\\s+"), lambda t: t != ""))
    aspect = F.round(
        F.greatest(F.col("w"), F.col("h")) / F.least(F.col("w"), F.col("h")), 6
    )
    reason = (
        F.when(cap_toks < min_caption_tokens, F.lit("caption_short"))
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
