"""Cross-modal (caption ↔ image) training-pair audit — the LAION/DataComp
curation step applied to paired data: before a caption–image pair enters a
multimodal training set, gate it on (a) caption quality and (b) image
over-reuse (one "stock photo" paired with many unrelated captions trains
the image tower to ignore the caption; DataComp and LAION-5B both drop
high-fan-out images).

Composes two existing lanes with no new heavy machinery:
- the pHash lane (operators/phash.py) supplies the perceptual image key,
  so reuse counting collapses pixel-identical re-encodes, not just
  byte-identical blobs;
- the text-quality discipline (operators/text.py) supplies the caption
  gate (length + word count, both portable column expressions).

Pair corpus: derived deterministically from documents — every doc is a
caption; its image is the doc's OWN media row (media_id = 3·(doc_id div
3): synth_media marks doc_id % 3 = 0 rows as images) except a planted
"stock photo" rotation (doc_id % 7 = 2 pairs with image 3·(doc_id % 50)),
so both reuse classes exist at every SF.

Scale shape (100 TB): the pHash pass is the existing Arrow-batched
map-only pass; pairs→hash is ONE equi shuffle join on img_id (the image
side is corpus-sized — never broadcast); reuse counting is a window
PARTITIONED by phash (bucket-sized partitions); the verdict is a map-only
CASE.  No global windows, no cartesian products, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import read_table
from .multimodal import synth_media
from .phash import _hash_ctes, phash_images
from .registry import register

MIN_CAPTION_CHARS = 200
MIN_CAPTION_WORDS = 30
MAX_IMAGE_REUSE = 4  # pairs per perceptual image before 'image_overused'


def crossmodal_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair_id, img_id, caption_ok, image_reuse, status) per caption–image
    pair, ordered by pair_id.  status ∈ ok / caption_low_quality /
    image_overused / both; image_reuse counts pairs sharing the image's
    pHash (perceptual identity, not blob identity)."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.when(
            F.col("doc_id") % 7 == 2, (F.col("doc_id") % 50) * 3
        )
        .otherwise((F.col("doc_id") - F.col("doc_id") % 3))
        .alias("img_id"),
        (
            (F.col("n_chars") >= MIN_CAPTION_CHARS)
            & (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
                >= MIN_CAPTION_WORDS
            )
        ).alias("caption_ok"),
    )
    hashes = phash_images(synth_media(spark, sf_dir)).select(
        F.col("media_id").alias("img_id"), "phash"
    )
    w = Window.partitionBy("phash")
    audited = (
        pairs.join(hashes, "img_id")
        .withColumn("image_reuse", F.count(F.lit(1)).over(w))
        .select(
            "pair_id",
            "img_id",
            "caption_ok",
            "image_reuse",
            F.when(
                ~F.col("caption_ok") & (F.col("image_reuse") > MAX_IMAGE_REUSE),
                F.lit("both"),
            )
            .when(~F.col("caption_ok"), F.lit("caption_low_quality"))
            .when(F.col("image_reuse") > MAX_IMAGE_REUSE, F.lit("image_overused"))
            .otherwise(F.lit("ok"))
            .alias("status"),
        )
        .orderBy("pair_id")
    )
    return audited


CROSSMODAL_ORACLE = f"""
WITH {_hash_ctes()},
pairs AS (
  SELECT doc_id AS pair_id,
         CASE WHEN doc_id % 7 = 2 THEN (doc_id % 50) * 3
              ELSE doc_id - doc_id % 3 END AS img_id,
         (n_chars >= {MIN_CAPTION_CHARS}
          AND length(text) - length(replace(text, ' ', '')) + 1
              >= {MIN_CAPTION_WORDS}) AS caption_ok
  FROM documents),
joined AS (
  SELECT p.pair_id, p.img_id, p.caption_ok, h.phash
  FROM pairs p JOIN h ON p.img_id = h.media_id),
reuse AS (
  SELECT *, CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS image_reuse
  FROM joined)
SELECT pair_id, img_id, caption_ok, image_reuse,
       CASE WHEN NOT caption_ok AND image_reuse > {MAX_IMAGE_REUSE} THEN 'both'
            WHEN NOT caption_ok THEN 'caption_low_quality'
            WHEN image_reuse > {MAX_IMAGE_REUSE} THEN 'image_overused'
            ELSE 'ok' END AS status
FROM reuse ORDER BY pair_id
"""

register("crossmodal_pair_audit", crossmodal_pair_audit, CROSSMODAL_ORACLE)
