"""Contrastive-pair mining for embedding-model training — per anchor
(query) vector, the HARD NEGATIVES (nearest neighbors with a DIFFERENT
label: near in embedding space but wrong class, the pairs that carry the
gradient signal in triplet/InfoNCE training) plus the best positive
(nearest same-label neighbor).

Scale shape: identical to ann_bruteforce_topk — the anchor set is a
training BATCH (bounded, broadcast), negatives come from ONE pass over
the corpus with the per-anchor top-k taken by window on the rounded
score.  At deployment the corpus side is the (possibly int8/PQ-compressed,
see quantization.py / the PQ pipeline) embedding table; mining runs once
per batch, map-side except the top-k window shuffle on qid.

No reference counterpart (north-star extension; SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .similarity import _DOT, N_QUERIES

NEG_K = 3  # hard negatives per anchor
POS_K = 1  # best positive per anchor


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, role, rank, nid, nid_label, cos): per anchor the top-3
    different-label neighbors ('neg') and the top-1 same-label neighbor
    ('pos'), by exact cosine on the rounded score (6dp ties broken by
    nid, so ranking is identical across engines)."""
    e = (
        read_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        )
        .withColumn("nrm", F.expr("sqrt(" + _DOT.format(a="v", b="v") + ")"))
    )
    q = e.where(F.col("vec_id") < N_QUERIES)
    c = e.where(F.col("vec_id") >= N_QUERIES)
    scored = (
        F.broadcast(q)
        .alias("a")
        .crossJoin(c.alias("b"))
        .select(
            F.col("a.vec_id").alias("qid"),
            F.when(F.col("a.label") == F.col("b.label"), "pos")
            .otherwise("neg")
            .alias("role"),
            F.col("b.vec_id").alias("nid"),
            F.col("b.label").alias("nid_label"),
            F.round(
                F.expr(_DOT.format(a="a.v", b="b.v"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid", "role").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(
            F.col("rank")
            <= F.when(F.col("role") == "pos", POS_K).otherwise(NEG_K)
        )
        .select(
            "qid",
            "role",
            F.col("rank").cast("int").alias("rank"),
            "nid",
            "nid_label",
            "cos",
        )
        .orderBy("qid", "role", "rank")
    )


MINING_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), s AS (
  SELECT a.vec_id AS qid,
         CASE WHEN a.label = b.label THEN 'pos' ELSE 'neg' END AS role,
         b.vec_id AS nid, b.label AS nid_label,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
  FROM n a JOIN n b ON b.vec_id >= {N_QUERIES}
  WHERE a.vec_id < {N_QUERIES}
), r AS (
  SELECT qid, role, nid, nid_label, cos,
         row_number() OVER (PARTITION BY qid, role
                            ORDER BY cos DESC, nid) AS rank
  FROM s
)
SELECT qid, role, CAST(rank AS INTEGER) AS rank, nid, nid_label, cos
FROM r
WHERE rank <= CASE WHEN role = 'pos' THEN {POS_K} ELSE {NEG_K} END
ORDER BY qid, role, rank
"""


register("hard_negative_mining", hard_negative_mining, MINING_ORACLE)
