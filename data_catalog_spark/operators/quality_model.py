"""Model-based quality classification — the FineWeb-Edu / DCLM-style
"train a small classifier, score every document, keep the confident"
stage (Penedo et al. 2024; Li et al. 2024, DCLM), reduced to the part
that matters for the ENGINE: scoring 100 TB with a frozen model.

The model is a logistic regression over deterministic per-document
features (stopword density, log-length, type-token ratio, alphabetic
ratio) with FROZEN literal weights — the same design as the frozen
k-means coarse quantizer in ann_models.py: training happens offline
(out of scope; any sklearn fit produces these four floats), while the
engine-side contract is that scoring is a MAP-ONLY column expression
that runs at scan speed on every executor, no model server, no UDF.

Parity notes: the logit is a fixed-order linear combination of doubles
(bit-identical across engines); the probability applies ``exp`` and is
rounded to 4dp like the bigram-LM perplexity (libm last-ulp tolerance);
the keep label derives from the SIGN of the 6dp-rounded logit, so the
class boundary is exact on both engines.

No reference counterpart (north-star extension; SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .text import (
    DUCK_ALPHA_RATIO,
    DUCK_TOKENS,
    SPARK_TOKENS,
    duck_stop_count,
    spark_stop_count,
)

# Frozen model: logit = B0 + W_STOP·stop_ratio + W_LOGN·ln(1+n_tokens)
#                      + W_TTR·type_token_ratio + W_ALPHA·alpha_ratio.
# Weights chosen (offline) so the synthetic corpus splits into two
# populated classes; at deployment these four floats are the artifact a
# classifier training job publishes.
B0 = -9.3
W_STOP = 10.0
W_LOGN = 1.5
W_TTR = 2.5
W_ALPHA = 1.0

# Stopword feature list (subset shared verbatim by both renderings).
_QSTOPS = ["the", "a", "of", "to", "in", "and"]


def score_documents(docs: DataFrame) -> DataFrame:
    """Apply the frozen model to a raw documents frame — STATELESS column
    expressions only, so the identical function scores a batch scan and a
    readStream micro-batch (streaming/quality.py) with bit-identical
    results."""
    d = (
        docs.withColumn("t", F.expr(SPARK_TOKENS))
        .withColumn("n_tokens", F.expr("size(t)").cast("long"))
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "stop_ratio",
            F.expr(spark_stop_count(_QSTOPS)) / F.col("n_tokens"),
        )
        .withColumn(
            "ttr", F.expr("size(array_distinct(t))") / F.col("n_tokens")
        )
        .withColumn(
            "alpha_ratio",
            F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
            / F.length("text"),
        )
        .withColumn(
            "logit",
            F.round(
                F.lit(B0)
                + F.lit(W_STOP) * F.col("stop_ratio")
                + F.lit(W_LOGN) * F.log(F.lit(1.0) + F.col("n_tokens"))
                + F.lit(W_TTR) * F.col("ttr")
                + F.lit(W_ALPHA) * F.col("alpha_ratio"),
                6,
            ),
        )
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("ttr", 6).alias("ttr"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        "logit",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))), 4).alias(
            "prob"
        ),
        (F.col("logit") >= 0).alias("keep"),
    )


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: the four model features, the frozen-model logit
    (6dp), calibrated probability (4dp), and the keep label
    (logit ≥ 0).  One scan, zero shuffles before the final sort — the
    shape that scores a crawl at scan speed."""
    return score_documents(read_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def _logit_ctes() -> str:
    """The shared DuckDB WITH-body computing (doc_id, features, logit) —
    reused verbatim by every oracle that consumes the frozen model, so the
    logit is rendered identically everywhere."""
    return f"""
d AS (
  SELECT doc_id, text, {DUCK_TOKENS} AS t FROM documents
), f AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         {duck_stop_count(_QSTOPS)} * 1.0 / len(t) AS stop_ratio,
         len(list_distinct(t)) * 1.0 / len(t) AS ttr,
         {DUCK_ALPHA_RATIO} AS alpha_ratio
  FROM d WHERE len(t) > 0
), s AS (
  SELECT doc_id, n_tokens, stop_ratio, ttr, alpha_ratio,
         round({B0} + {W_STOP} * stop_ratio + {W_LOGN} * ln(1.0 + n_tokens)
               + {W_TTR} * ttr + {W_ALPHA} * alpha_ratio, 6) AS logit
  FROM f
)"""


def _quality_model_oracle() -> str:
    return f"""
WITH {_logit_ctes()}
SELECT doc_id, n_tokens,
       round(stop_ratio, 6) AS stop_ratio,
       round(ttr, 6) AS ttr,
       round(alpha_ratio, 6) AS alpha_ratio,
       logit,
       round(1.0 / (1.0 + exp(-logit)), 4) AS prob,
       logit >= 0 AS keep
FROM s ORDER BY doc_id
"""


register(
    "quality_classifier_score", quality_classifier_score, _quality_model_oracle()
)


# -- dedup keep-best: quality-argmax cluster representative -------------------
#
# The "apply" stage real pipelines run after near-dup clustering: instead of
# the arbitrary keep-min-doc_id, keep the HIGHEST-QUALITY member of each
# cluster (RefinedWeb/FineWeb keep-best-of-cluster).  Composes the resolved
# dup clusters with the frozen classifier — cluster frame is tiny relative
# to the corpus (only docs in near-dup pairs), so the join broadcasts under
# AQE; one window shuffle on cluster_id does rank + member count together.


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster: the member with the max frozen-model logit
    (ties → lowest doc_id), the member count, and how many docs the
    cluster's resolution drops."""
    from pyspark.sql import Window

    from .corpus import dup_clusters

    clusters = dup_clusters(spark, sf_dir)  # (doc_id, cluster_id)
    scores = quality_classifier_score(spark, sf_dir).select("doc_id", "logit")
    j = clusters.join(scores, "doc_id")
    by_cluster = Window.partitionBy("cluster_id")
    rank_w = by_cluster.orderBy(F.col("logit").desc(), F.col("doc_id"))
    return (
        j.withColumn("rk", F.row_number().over(rank_w))
        .withColumn("n_members", F.count(F.lit(1)).over(by_cluster))
        .where(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            "n_members",
            F.col("logit").alias("kept_logit"),
            (F.col("n_members") - F.lit(1)).alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


def _keep_best_oracle() -> str:
    from .corpus import DUP_CLUSTERS_CTES

    return f"""
WITH RECURSIVE {DUP_CLUSTERS_CTES},
{_logit_ctes().lstrip()},
m AS (
  SELECT c.cluster_id, c.doc_id, s.logit
  FROM clusters c JOIN s USING (doc_id)
)
SELECT cluster_id, doc_id AS kept_doc_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
       logit AS kept_logit,
       CAST(count(*) OVER (PARTITION BY cluster_id) - 1 AS BIGINT) AS n_dropped
FROM m
QUALIFY row_number() OVER (PARTITION BY cluster_id
                           ORDER BY logit DESC, doc_id) = 1
ORDER BY cluster_id
"""


register("dedup_keep_best", dedup_keep_best, _keep_best_oracle())
