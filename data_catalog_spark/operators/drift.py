"""Embedding distribution-drift monitor — the ingest health check a
vector pipeline runs before committing an index append or scheduling a
quantizer retrain.

``embedding_drift_report``: assign every vector to the FROZEN coarse
quantizer (ann_models.IVF_CENTROIDS — the same literals the IVF search
lane probes), split the corpus into the serving BASE slice and the
incoming batch (``vec_id % EMB_NEW_MOD`` — the established new-batch
convention of dedup_embedding_incremental / ann_pq_index_append), and
report per cluster: counts, occupancy shares, the share shift, and each
slice's mean squared distance to its assigned centroid.  A batch whose
share mass moves across clusters (covariate shift) or whose mean
assigned distance rises (the quantizer no longer fits the data) is the
operational signal to retrain before recall silently decays — this row
set is the artifact that decision reads.

Scale shape: one map-only assignment pass over the corpus (centroid
literals — no join, no shuffle until the |clusters|-row aggregate), one
grouped agg keyed on cluster, and a 1-row scalar collect for the share
denominators.  Means fold through DECIMAL(28,10) (the
embedding_cluster_quality convention) so they are partition-order
independent and bit-comparable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .similarity import (
    _DIM,
    EMB_NEW_MOD,
    _duck_sq,
    _emb,
    _with_centroid_dists,
)


def _dec_mean(cond: F.Column, val: str) -> F.Column:
    n = F.sum(F.when(cond, 1).otherwise(0))
    s = F.sum(F.when(cond, F.col(val)).cast("decimal(28,10)"))
    return F.when(n > 0, F.round((s / n).cast("double"), 6))


def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ann_models import IVF_CENTROIDS

    d = _with_centroid_dists(_emb(spark, sf_dir), IVF_CENTROIDS)
    assigned = d.select(
        F.expr(
            "CAST(array_position(dists, array_min(dists)) - 1 AS INT)"
        ).alias("cluster"),
        F.expr("array_min(dists)").alias("sqd"),
        (F.col("vec_id") % EMB_NEW_MOD == 0).alias("is_new"),
    )
    base, new = ~F.col("is_new"), F.col("is_new")
    agg = (
        assigned.groupBy("cluster")
        .agg(
            F.sum(F.when(base, 1).otherwise(0)).cast("long").alias("n_base"),
            F.sum(F.when(new, 1).otherwise(0)).cast("long").alias("n_new"),
            _dec_mean(base, "sqd").alias("mean_sqdist_base"),
            _dec_mean(new, "sqd").alias("mean_sqdist_new"),
        )
        .localCheckpoint(eager=False)  # feeds the scalar agg AND the report
    )
    tot = agg.agg(F.sum("n_base"), F.sum("n_new")).first()
    tb, tn = float(tot[0]), float(tot[1])
    return agg.select(
        "cluster",
        "n_base",
        "n_new",
        F.round(F.col("n_base") / F.lit(tb), 6).alias("share_base"),
        F.round(F.col("n_new") / F.lit(tn), 6).alias("share_new"),
        F.round(
            F.col("n_new") / F.lit(tn) - F.col("n_base") / F.lit(tb), 6
        ).alias("share_shift"),
        "mean_sqdist_base",
        "mean_sqdist_new",
    ).orderBy("cluster")


def _drift_oracle() -> str:
    from .ann_models import IVF_CENTROIDS

    cents = (
        "["
        + ", ".join(
            "[" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in c) + "]"
            for c in IVF_CENTROIDS
        )
        + "]"
    )
    dist = _duck_sq("v", "c", _DIM)
    m = EMB_NEW_MOD

    def dec_mean(pred: str) -> str:
        return (
            f"CASE WHEN sum(CASE WHEN {pred} THEN 1 ELSE 0 END) > 0 THEN "
            f"round(CAST(sum(CASE WHEN {pred} THEN CAST(sqd AS DECIMAL(28,10)) END) "
            f"/ sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS DOUBLE), 6) END"
        )

    return f"""
WITH ct AS (SELECT {cents} AS cents),
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
d AS (SELECT vec_id, list_transform(cents, c -> {dist}) AS dists
      FROM e, ct),
a AS (SELECT CAST(list_position(dists, list_min(dists)) - 1 AS INTEGER)
               AS cluster,
             list_min(dists) AS sqd,
             vec_id % {m} = 0 AS is_new
      FROM d),
g AS (SELECT cluster,
             CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS n_base,
             CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             {dec_mean('NOT is_new')} AS mean_sqdist_base,
             {dec_mean('is_new')} AS mean_sqdist_new
      FROM a GROUP BY cluster),
t AS (SELECT CAST(sum(n_base) AS DOUBLE) AS tb,
             CAST(sum(n_new) AS DOUBLE) AS tn FROM g)
SELECT cluster, n_base, n_new,
       round(n_base / tb, 6) AS share_base,
       round(n_new / tn, 6) AS share_new,
       round(n_new / tn - n_base / tb, 6) AS share_shift,
       mean_sqdist_base, mean_sqdist_new
FROM g CROSS JOIN t ORDER BY cluster
"""


register("embedding_drift_report", embedding_drift_report, _drift_oracle())
