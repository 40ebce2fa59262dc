"""Image+caption extraction: parts table → input_hint payload table.

The north-star flow: crawled MHTML archives → split → decoded image
parts + sibling caption parts → one row per image with
(image_id, bytes, w, h, fmt, caption, phash) — exactly the
BASELINE.json ``input_hint`` schema.

Spark-first shape: images and captions are two filters over the SAME
parts relation, joined on (archive_id, stem) — an equi-join Catalyst
plans as a broadcast/shuffled hash join; pixel decode + phash is the
only Pandas-UDF stage (vectorized, Arrow-batched, per-part work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IMG_SCHEMA = (
    "archive_id string, image_id string, bytes binary, w int, h int, "
    "fmt string, caption string, phash long"
)

_FMT_BY_EXT = {"ppm": "ppm", "bmp": "bmp", "raw": "raw", "lossy": "lossy"}


def _decode_batches(batches):
    import pandas as pd

    from ..images.synth import decode_bmp, decode_ppm, phash64

    for pdf in batches:
        rows = []
        for archive_id, image_id, data, ext, caption in zip(
            pdf["archive_id"], pdf["image_id"], pdf["data"], pdf["ext"], pdf["caption"]
        ):
            data = bytes(data)
            # sniff: magic outranks the extension, like the BOM outranks
            # a declared charset
            try:
                if data[:2] == b"P6":
                    pixels, fmt = decode_ppm(data), ("lossy" if ext == "lossy" else "ppm")
                elif data[:2] == b"BM":
                    pixels, fmt = decode_bmp(data), "bmp"
                elif data[:8] == b"\x89PNG\r\n\x1a\n":
                    from ..media.png import decode_png
                    from ..operators.multimodal import _to_rgb3

                    pixels, fmt = _to_rgb3(decode_png(data)), "png"
                elif data[:6] in (b"GIF87a", b"GIF89a"):
                    from ..media.gif import decode_gif

                    pixels, fmt = decode_gif(data)[0][0], "gif"
                elif data[:2] == b"\xff\xd8":
                    from ..media.jpeg import decode_jpeg
                    from ..operators.multimodal import _to_rgb3

                    pixels, fmt = _to_rgb3(decode_jpeg(data)), "jpeg"
                elif data[:4] == b"\x00\x00\x01\x00":
                    from ..media.ico import decode_ico
                    from ..operators.multimodal import _to_rgb3

                    pixels, fmt = _to_rgb3(decode_ico(data)), "ico"
                else:
                    import struct

                    import numpy as np

                    w0, h0 = struct.unpack_from("<HH", data, 0)
                    pixels = (
                        np.frombuffer(data, dtype=np.uint8, count=w0 * h0 * 3, offset=4)
                        .reshape(h0, w0, 3)
                        .copy()
                    )
                    fmt = "raw"
            except Exception:
                continue  # undecodable image: drop the row, like notFound
            h, w = pixels.shape[:2]
            rows.append(
                {
                    "archive_id": archive_id,
                    "image_id": image_id,
                    "bytes": data,
                    "w": w,
                    "h": h,
                    "fmt": fmt,
                    "caption": caption,
                    "phash": phash64(pixels),
                }
            )
        yield pd.DataFrame(
            rows,
            columns=["archive_id", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
        )


def extract_images(parts: DataFrame) -> DataFrame:
    """Parts → (image_id, bytes, w, h, fmt, caption, phash).

    Image parts are identified by content type (image/* or
    application/octet-stream with a known extension); captions are
    sibling text/plain parts sharing the location stem.
    """
    loc = F.coalesce(F.col("content_location"), F.col("part_id"))
    base = F.element_at(F.split(loc, "/"), -1)
    stem = F.regexp_extract(base, r"^(.*?)(\.[^.]+)?$", 1)
    ext = F.lower(F.regexp_extract(base, r"\.([^.]+)$", 1))
    ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))

    is_image = ct.startswith("image/") | (
        ct.startswith("application/octet-stream") & ext.isin(list(_FMT_BY_EXT))
    )
    is_caption = ct.startswith("text/plain") & (ext == "txt")

    # single pass over parts: image bytes and the sibling caption pair
    # up in ONE partial-aggregating groupBy on (archive_id, stem) — no
    # self-join, so the (expensive) parse lineage is evaluated once
    paired = (
        parts.filter(is_image | is_caption)
        .select(
            "archive_id",
            stem.alias("image_id"),
            F.when(is_image, F.col("data")).alias("img_data"),
            F.when(is_image, ext).alias("ext"),
            F.when(is_caption, F.col("text")).alias("caption"),
        )
        .groupBy("archive_id", "image_id")
        .agg(
            F.max("img_data").alias("data"),
            F.max("ext").alias("ext"),
            F.max("caption").alias("caption"),
        )
        .filter(F.col("data").isNotNull())
    )
    # caption rides through the decode UDF: one evaluation of the parse
    # lineage end-to-end, no join afterwards
    decoded = paired.select("archive_id", "image_id", "data", "ext", "caption").mapInPandas(
        _decode_batches, schema=_IMG_SCHEMA
    )
    return decoded.select(
        "archive_id", "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    )
