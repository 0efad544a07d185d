"""Count-min sketch heavy hitters over the corpus token stream.

The mergeable-counter primitive for cardinality-bounded frequency counting:
d independent hash rows × w buckets of counters.  Build = ONE groupBy on
(seed, bucket) — state is d×w regardless of vocabulary size, and per-seed
bucket counts merge by addition, so the same plan works as a streaming
aggregate or a per-partition partial (unlike an exact per-token groupBy,
whose state is the vocabulary).  Estimate(token) = min over seeds of its
bucket's counter — always an OVERestimate (collisions only add), within
ε·N of truth with probability 1−δ for w = e/ε, d = ln(1/δ).

Deterministic (fixed xxhash64 seeds) but not SQL-expressible in DuckDB
(no xxhash64) → rows-only driver check; pytest verifies the one-sided
error and the heavy-hitter recall against exact counts.

No reference counterpart (SURVEY §2.6) — north-star scale breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .text import SPARK_TOKENS

CMS_DEPTH = 4  # d hash rows
CMS_WIDTH = 1024  # w buckets per row  (ε ≈ e/w ≈ 0.27%)
HH_THRESHOLD_FRAC = 0.005  # report tokens with est ≥ 0.5% of the stream


def _token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return docs.select(
        F.explode(F.expr(SPARK_TOKENS)).alias("tok")
    )


def cms_build(tokens: DataFrame) -> DataFrame:
    """(seed, bucket, c) — the d×w counter table."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("seed")
    return (
        tokens.select("tok", seeds)
        .select(
            "seed",
            F.pmod(F.xxhash64("seed", "tok"), F.lit(CMS_WIDTH)).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def corpus_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens whose CMS estimate ≥ HH_THRESHOLD_FRAC of the stream, with
    estimates.  The sketch (d×w rows) BROADCASTs to the vocabulary probe —
    at 100 TB the sketch is still 4×1024 counters while an exact
    heavy-hitter groupBy would shuffle the full vocabulary."""
    tokens = _token_stream(spark, sf_dir)
    sketch = cms_build(tokens).localCheckpoint(eager=False)
    total = tokens.count()  # scalar; one lightweight count job
    vocab = tokens.distinct()
    probes = vocab.select(
        "tok", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("seed")
    ).withColumn("bucket", F.pmod(F.xxhash64("seed", "tok"), F.lit(CMS_WIDTH)))
    est = (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("est_count"))
        .where(F.col("est_count") >= int(total * HH_THRESHOLD_FRAC))
        .orderBy(F.desc("est_count"), "tok")
    )
    return est


register("corpus_heavy_hitters_cms", corpus_heavy_hitters_cms, None)  # rows-only: hash sketch


# -- mergeable HLL (Datasketches) ---------------------------------------------


def users_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type AND overall — the overall estimate
    computed by UNIONING the per-type HLL sketches, never rescanning:
    the same mergeable-state contract as the CMS (per-partition /
    per-partition-of-time sketches union into rollups at any grain).
    Estimates carry Datasketches' ~1-2% relative error at lgK=12; the
    pytest pins the error bound against exact counts."""
    ev = read_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    typed = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    overall = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return typed.unionByName(overall).orderBy("event_type")


register("users_hll_mergeable", users_hll_mergeable, None)  # rows-only: sketch estimate
