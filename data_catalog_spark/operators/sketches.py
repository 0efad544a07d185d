"""Count-min sketch heavy hitters over the corpus token stream.

The mergeable-counter primitive for cardinality-bounded frequency counting:
d independent hash rows × w buckets of counters.  Build = ONE groupBy on
(seed, bucket) — state is d×w regardless of vocabulary size, and per-seed
bucket counts merge by addition, so the same plan works as a streaming
aggregate or a per-partition partial (unlike an exact per-token groupBy,
whose state is the vocabulary).  Estimate(token) = min over seeds of its
bucket's counter — always an OVERestimate (collisions only add), within
ε·N of truth with probability 1−δ for w = e/ε, d = ln(1/δ).

Hashing uses the portable md5 universal family (see operators/dedup.py:
one md5 digest → 32-bit base hash, row i's bucket = ((a_i·h + b_i) mod p)
mod w with p just above 2^32), so the ENTIRE sketch — counters, probes,
min-estimates, threshold — renders to DuckDB SQL and is exact-oracle
checked; pytest additionally verifies the one-sided error and the
heavy-hitter recall against exact counts.

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

# Portable hash family (same construction & rationale as dedup.py).
_CMS_P = 4294967311
_CMS_H32 = "cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)"


def _cms_coeffs(d: int = CMS_DEPTH) -> list[tuple[int, int]]:
    import random

    rng = random.Random(0xC0FFEE)
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, _CMS_P)) for _ in range(d)]


CMS_COEFFS = _cms_coeffs()


def _seed_buckets() -> "F.Column":
    """array<struct<seed,bucket>> for one token's d bucket coordinates."""
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                (((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_CMS_P)) % F.lit(CMS_WIDTH)).alias(
                    "bucket"
                ),
            )
            for s, (a, b) in enumerate(CMS_COEFFS)
        ]
    )


def cms_probes(tokens_distinct: DataFrame) -> DataFrame:
    """(tok, seed, bucket) probe coordinates for a vocabulary frame."""
    return (
        tokens_distinct.select("tok", F.expr(_CMS_H32).alias("h"))
        .select("tok", F.explode(_seed_buckets()).alias("sb"))
        .select("tok", F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    )


def _token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return docs.select(
        F.explode(F.expr(SPARK_TOKENS)).alias("tok")
    )


def cms_build(tokens: DataFrame) -> DataFrame:
    """(seed, bucket, c) — the d×w counter table."""
    return (
        tokens.select(F.expr(_CMS_H32).alias("h"))
        .select(F.explode(_seed_buckets()).alias("sb"))
        .select(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_build_weighted(counts: DataFrame) -> DataFrame:
    """(seed, bucket, c) from a (tok, cnt) exact-count table — per-cell
    sum of token counts ≡ per-cell count of the raw stream (each stream
    occurrence contributes exactly 1 to each of its d cells), so the
    sketch is bit-identical to cms_build over the exploded stream."""
    return (
        counts.select(F.expr(_CMS_H32).alias("h"), "cnt")
        .select(F.explode(_seed_buckets()).alias("sb"), "cnt")
        .select(
            F.col("sb.seed").alias("seed"),
            F.col("sb.bucket").alias("bucket"),
            "cnt",
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("c"))
    )


def hh_probe(counts: DataFrame, sketch: DataFrame, total: int) -> DataFrame:
    """Heavy-hitter estimate page shared by the batch and streaming CMS:
    probe every vocabulary token against the broadcast sketch, threshold
    at int(total · HH_THRESHOLD_FRAC)."""
    probes = cms_probes(counts.select("tok"))
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("est_count"))
        .where(F.col("est_count") >= int(total * HH_THRESHOLD_FRAC))
        .orderBy(F.desc("est_count"), "tok")
    )


def corpus_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens whose CMS estimate ≥ HH_THRESHOLD_FRAC of the stream, with
    estimates.  The sketch (d×w rows) BROADCASTs to the vocabulary probe —
    at 100 TB the sketch is still 4×1024 counters while an exact
    heavy-hitter groupBy would shuffle the full vocabulary.

    The corpus is tokenized ONCE: the exact (tok, cnt) table — state the
    probe side already carries via its vocabulary scan — feeds the sketch
    (weighted build, bit-identical to counting the raw stream), the
    stream total (sum of counts), and the probe vocabulary; the earlier
    shape paid three full tokenize scans (build, count, distinct)."""
    tokens = _token_stream(spark, sf_dir)
    counts = (
        tokens.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # scalar total; this job also materializes the checkpointed counts
    total = counts.agg(F.sum("cnt")).first()[0] or 0
    return hh_probe(counts, cms_build_weighted(counts), total)


def cms_oracle() -> str:
    """DuckDB rendering of the identical sketch: a VALUES table carries the
    (seed, a, b) family; build and probe share it."""
    seed_rows = ", ".join(f"({s}, {a}, {b})" for s, (a, b) in enumerate(CMS_COEFFS))
    from .text import DUCK_TOKENS

    return f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
stream AS (SELECT unnest(t) AS tok FROM toks),
hashed AS (SELECT tok, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM stream),
seeds(seed, a, b) AS (VALUES {seed_rows}),
cells AS (SELECT seed, ((a * h + b) % {_CMS_P}) % {CMS_WIDTH} AS bucket
          FROM hashed CROSS JOIN seeds),
sketch AS (SELECT seed, bucket, CAST(count(*) AS BIGINT) AS c
           FROM cells GROUP BY 1, 2),
total AS (SELECT count(*) AS n FROM stream),
vocab AS (SELECT DISTINCT tok, h FROM hashed),
probes AS (SELECT tok, seed, ((a * h + b) % {_CMS_P}) % {CMS_WIDTH} AS bucket
           FROM vocab CROSS JOIN seeds),
est AS (SELECT tok, min(c) AS est_count
        FROM probes JOIN sketch USING (seed, bucket) GROUP BY tok)
SELECT tok, est_count
FROM est, total
WHERE est_count >= floor(n * {HH_THRESHOLD_FRAC})
ORDER BY est_count DESC, tok
"""


register("corpus_heavy_hitters_cms", corpus_heavy_hitters_cms, cms_oracle())


# -- mergeable HLL (Datasketches) ---------------------------------------------


def users_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type AND overall — the overall estimate
    computed by UNIONING the per-type HLL sketches, never rescanning:
    the same mergeable-state contract as the CMS (per-partition /
    per-partition-of-time sketches union into rollups at any grain).

    Datasketches estimates aren't cross-engine hashable, so the hashed
    output is the accuracy contract: the EXACT distinct count per row
    plus ``within_tol`` = |estimate − exact| ≤ max(10% · exact, 5)
    (lgK=12 ⇒ rsd ≈ 1.6%, so 10% is a ≥6σ bound; the 'ALL' row checks the
    merged-union estimate specifically, which is the property that makes
    the sketch usable for rollups).  Oracle = exact counts + literal TRUE."""
    return (
        _users_hll_estimates(spark, sf_dir)
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("est") - F.col("n_users"))
                <= F.greatest(F.col("n_users") * 0.1, F.lit(5.0))
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


def _users_hll_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_users exact, est sketch-estimate) incl. the 'ALL'
    union row — the raw estimates, kept separate so pytest can pin
    sketch-level properties the hashed contract view doesn't expose."""
    ev = read_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.count_distinct("user_id").alias("n_users"),
    )
    typed = per_type.select(
        "event_type", "n_users", F.hll_sketch_estimate("sk").alias("est")
    )
    # merged-union estimate vs a true global distinct: 1-row × 1-row
    # equi-join on a literal key (broadcast hash join, not a cartesian)
    union_est = (
        per_type.agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .withColumn("k", F.lit(1))
    )
    exact_all = ev.agg(F.count_distinct("user_id").alias("n_users")).withColumn(
        "k", F.lit(1)
    )
    overall = exact_all.join(union_est, "k").select(
        F.lit("ALL").alias("event_type"), "n_users", "est"
    )
    return typed.unionByName(overall)


USERS_HLL_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS within_tol
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
ORDER BY event_type
"""


register("users_hll_mergeable", users_hll_mergeable, USERS_HLL_ORACLE)
