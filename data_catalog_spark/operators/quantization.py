"""Embedding int8 quantization — the serving-format compression stage a
vector corpus goes through before ANN deployment (4× memory vs float32;
the row-wise symmetric scheme used by FAISS `ScalarQuantizer(QT_8bit)` and
most vector stores): per vector, scale = max|x|/127, code_i =
round(x_i/scale) ∈ [-127, 127].

Engine contract: quantization is per-row arithmetic (map-only — zero
shuffles before the final per-label rollup), and the operator reports the
fidelity stats that decide whether int8 is safe to deploy: reconstruction
RMSE, signal-to-quantization-noise ratio (dB), and the saturated-code
fraction.

Parity notes (see similarity.py for the precedents): per-element doubles
are bit-identical across engines; per-vector folds are rendered
left-to-right in BOTH engines (Spark ``aggregate`` fold ≡ DuckDB
``list_sum`` over the same element order); per-label means go through
DECIMAL so they are order/partition-independent.  The derived ``scale``
column is read through a lazy ``localCheckpoint`` barrier before lambdas
reference it — without the barrier CollapseProject inlines the absmax
scan into every lambda iteration (the interpreted-HOF re-evaluation trap;
at deployment scale the same materialization is the written codes table).

No reference counterpart (north-star extension; SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .similarity import _DIM

_ABSMAX = "array_max(transform(embedding, y -> abs(CAST(y AS DOUBLE))))"

# err fold: (x - round(x/scale)*scale)² summed left-to-right, like the
# oracle's list_sum over a comprehension in the same element order.
_ERR_SUM = (
    "aggregate(transform(embedding, x -> "
    "(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / scale) * scale) * "
    "(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / scale) * scale)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_SIG_SUM = (
    "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_N_SAT = (
    "size(filter(embedding, x -> abs(round(CAST(x AS DOUBLE) / scale)) = 127.0))"
)


def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per label: vector count, mean quantization scale, mean
    reconstruction RMSE, mean SQNR (dB), saturated-code fraction.  One
    scan; the only shuffle is the |labels|-row rollup."""
    e = (
        read_table(spark, sf_dir, "embeddings")
        # single-row-group local parquet = 1-task scan; no-op at scale
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .withColumn("scale", F.expr(_ABSMAX) / F.lit(127.0))
        .where(F.col("scale") > 0)  # zero vectors carry no quantizable signal
        .localCheckpoint(eager=False)  # barrier: lambdas read scale, not its expr
        .withColumn("err_sum", F.expr(_ERR_SUM))
        .withColumn("sig_sum", F.expr(_SIG_SUM))
        .withColumn("rmse", F.sqrt(F.col("err_sum") / F.lit(float(_DIM))))
        .withColumn(
            "sqnr_db", F.lit(10.0) * F.log10(F.col("sig_sum") / F.col("err_sum"))
        )
        .withColumn("n_sat", F.expr(_N_SAT).cast("long"))
    )

    def dmean(col: str, nd: int):
        return F.round(
            F.sum(F.col(col).cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            nd,
        )

    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            dmean("scale", 6).alias("mean_scale"),
            dmean("rmse", 6).alias("mean_rmse"),
            dmean("sqnr_db", 4).alias("mean_sqnr_db"),
            F.round(
                F.sum("n_sat").cast("double")
                / (F.count(F.lit(1)) * F.lit(float(_DIM))),
                6,
            ).alias("saturated_frac"),
        )
        .orderBy("label")
    )


def _int8_oracle() -> str:
    # list-comprehension folds (DuckDB sums comprehensions left-to-right,
    # matching Spark's aggregate fold; precedent: similarity._duck_sq).
    x = "CAST(embedding[i] AS DOUBLE)"
    err = (
        f"list_sum([({x} - round({x} / scale) * scale) * "
        f"({x} - round({x} / scale) * scale) for i in range(1, {_DIM} + 1)])"
    )
    sig = f"list_sum([{x} * {x} for i in range(1, {_DIM} + 1)])"
    nsat = (
        f"len([i for i in range(1, {_DIM} + 1) "
        f"if abs(round({x} / scale)) = 127.0])"
    )
    return f"""
WITH v AS (
  SELECT label, embedding,
         list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0
             AS scale
  FROM embeddings
), m AS (
  SELECT label, scale, {err} AS err_sum, {sig} AS sig_sum,
         CAST({nsat} AS BIGINT) AS n_sat
  FROM v WHERE scale > 0
), s AS (
  SELECT label, scale, err_sum, sig_sum, n_sat,
         sqrt(err_sum / {float(_DIM)!r}) AS rmse,
         10.0 * log10(sig_sum / err_sum) AS sqnr_db
  FROM m
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       round(CAST(SUM(CAST(scale AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
           AS mean_scale,
       round(CAST(SUM(CAST(rmse AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
           AS mean_rmse,
       round(CAST(SUM(CAST(sqnr_db AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 4)
           AS mean_sqnr_db,
       round(CAST(SUM(n_sat) AS DOUBLE) / (COUNT(*) * {float(_DIM)!r}), 6)
           AS saturated_frac
FROM s GROUP BY label ORDER BY label
"""


register("embedding_int8_quant", embedding_int8_quant, _int8_oracle())
