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


# -- ANN over the int8-quantized corpus ---------------------------------------
#
# The serving-side proof that int8 is usable, not just measured: queries
# stay full-precision, the corpus side is the DEQUANTIZED codes
# (asymmetric distance computation, the standard scalar-quantizer serving
# mode).  Same scale shape as ann_bruteforce_topk — broadcast query batch,
# one corpus pass — except the corpus vectors are what the 4×-smaller
# int8 table reconstructs to, so ranking differences vs the exact path
# are exactly the quantization error (pinned ≥0.8 recall@10 by pytest).

_RECON = "transform(embedding, x -> round(CAST(x AS DOUBLE) / scale) * scale)"


def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _DOT, TOP_K, N_QUERIES
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "embeddings")
    q = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        )
        .withColumn("nrm", F.expr("sqrt(" + _DOT.format(a="v", b="v") + ")"))
    )
    c = (
        e.where(F.col("vec_id") >= N_QUERIES)
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .withColumn("scale", F.expr(_ABSMAX) / F.lit(127.0))
        .where(F.col("scale") > 0)
        .localCheckpoint(eager=False)  # barrier (see embedding_int8_quant)
        .select("vec_id", F.expr(_RECON).alias("v"))
        .withColumn("nrm", F.expr("sqrt(" + _DOT.format(a="v", b="v") + ")"))
        .where(F.col("nrm") > 0)
    )
    scored = (
        F.broadcast(q)
        .alias("a")
        .crossJoin(c.alias("b"))
        .select(
            F.col("a.vec_id").alias("qid"),
            F.col("b.vec_id").alias("nid"),
            F.round(
                F.expr(_DOT.format(a="a.v", b="b.v"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("qid", "nid", "cos", F.col("rank").cast("int").alias("rank"))
        .orderBy("qid", "rank")
    )


def _int8_ann_oracle() -> str:
    from .similarity import TOP_K, N_QUERIES

    x = "CAST(embedding[i] AS DOUBLE)"
    recon = f"[round({x} / scale) * scale for i in range(1, {_DIM} + 1)]"
    return f"""
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < {N_QUERIES}
), qn AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM q
), cs AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0
             AS scale
  FROM embeddings WHERE vec_id >= {N_QUERIES}
), cr AS (
  SELECT vec_id, {recon} AS v FROM cs WHERE scale > 0
), cn AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
  FROM cr
), s AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
  FROM qn a, cn b WHERE b.nrm > 0
), r AS (
  SELECT qid, nid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM s
)
SELECT qid, nid, cos, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= {TOP_K} ORDER BY qid, rank
"""


register("ann_int8_topk", ann_int8_topk, _int8_ann_oracle())
