"""Corpus n-gram language-model scoring — per-document bigram log-likelihood
and perplexity under an add-one-smoothed LM trained on the corpus itself.

The canonical model-free quality signal of an LLM-data pipeline (boilerplate
and gibberish both score poorly against the corpus LM; cf. CCNet-style
perplexity filtering): train unigram/bigram counts over all documents, then
score each document by the average log-probability of its bigrams.

Scale design (100 TB):
- Training is two hash aggregations over the exploded bigram/unigram stream
  (map-side partial counts; the model tables are |vocab| and |bigram vocab|
  rows — tiny next to the corpus).
- Scoring joins each doc's bigrams to the model tables: shuffle joins keyed
  on the n-gram — co-partitioned, no broadcast of the corpus, and the model
  side is reusable across scoring runs (write it once, score many).
- All math is column expressions; the only subtlety is float determinism:
  per-bigram ln() is truncated to DECIMAL(20,12) BEFORE the sum so the
  aggregate is order-independent and engine-portable (a raw double sum
  would differ in the last ulp between Spark's and DuckDB's reduction
  orders).

No reference counterpart (north-star extension; SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .text import DUCK_TOKENS, SPARK_TOKENS

# Bigrams as (w1, w2) from consecutive tokens; rendered identically in both
# engines from the shared token expression.
SPARK_BIGRAMS = (
    "arrays_zip(slice(t, 1, greatest(size(t) - 1, 0)),"
    " slice(t, 2, greatest(size(t) - 1, 0)))"
)


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per consecutive token pair."""
    return (
        docs.withColumn("t", F.expr(SPARK_TOKENS))
        .select("doc_id", F.explode(F.expr(SPARK_BIGRAMS)).alias("bg"))
        .select(
            "doc_id",
            F.col("bg")["0"].alias("w1"),
            F.col("bg")["1"].alias("w2"),
        )
    )


def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: bigram count, average bigram log-probability, and
    perplexity exp(-avg_logp), under the corpus add-one bigram LM:

        p(w2 | w1) = (c(w1, w2) + 1) / (c(w1·) + V)

    with V = |unigram vocabulary| and c(w1·) = count of w1 as a bigram
    LEFT context (so the distribution sums to 1 over the vocabulary).
    """
    docs = read_table(spark, sf_dir, "documents")
    # bg feeds both training aggregations AND the scoring join — three
    # consumers; materialize the exploded stream once instead of three
    # tokenize+zip+explode corpus passes (at 100 TB this is the "write the
    # postings once" rule; locally, localCheckpoint is its stand-in).
    bg = _doc_bigrams(docs).localCheckpoint(eager=False)

    bigram_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    context_counts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.withColumn("t", F.expr(SPARK_TOKENS))
        .select(F.explode("t").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )

    # ln p per (w1,w2), truncated to decimal for order-independent summing.
    model = (
        bigram_counts.join(context_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v")))
            .cast("decimal(20,12)")
            .alias("logp"),
        )
    )

    return (
        bg.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("logp").cast("double") / F.count(F.lit(1))).alias("avg_raw"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("avg_raw", 6).alias("avg_logp"),
            F.round(F.exp(-F.col("avg_raw")), 4).alias("ppl"),
        )
        .orderBy("doc_id")
    )


DUCK_BIGRAMS_BODY = f"""
toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)
)
"""

BIGRAM_LM_ORACLE = f"""
WITH {DUCK_BIGRAMS_BODY},
bigram_counts AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
context_counts AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
vocab AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(t) AS w FROM toks)
),
model AS (
  SELECT w1, w2,
         CAST(ln((c12 + 1) / (c1 + v)) AS DECIMAL(20,12)) AS logp
  FROM bigram_counts JOIN context_counts USING (w1) CROSS JOIN vocab
),
scored AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(logp) AS DOUBLE) / count(*) AS avg_raw
  FROM bg JOIN model USING (w1, w2)
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       round(avg_raw, 6) AS avg_logp,
       round(exp(-avg_raw), 4) AS ppl
FROM scored ORDER BY doc_id
"""


register("bigram_lm_perplexity", bigram_lm_perplexity, BIGRAM_LM_ORACLE)


# -- DoReMi-style domain reweighting ------------------------------------------
#
# DoReMi (Xie et al. 2023): upweight the domains a proxy model finds HARD
# relative to a reference — excess loss per domain → exponential-boost
# weights → mix with uniform.  The model-free rendering here uses the
# corpus bigram LM above as the shared reference: a source's NLL under
# the corpus-wide model measures how far its text sits from the corpus
# average, so excess_j = max(0, nll_j − nll_corpus) is the domain-
# hardness signal, boost_j = exp(excess_j / τ) (τ = 1), and the published
# weight mixes the normalized boosts with uniform at smoothing c = 0.1
# (the paper's uniform-smoothing step).
#
# Scale shape: corpus-scale work is exactly the bigram-LM pipeline (one
# exploded-bigram stream behind a checkpoint, two model aggregations, one
# gram-keyed scoring join); everything after the per-source aggregation
# is |sources|-row model-sized arithmetic with two 1-row broadcast
# totals (the scalar-broadcast idiom — adjudicated ×2 in the plan lint).
#
# Cross-engine determinism: per-bigram ln() is DECIMAL-pinned before the
# per-source sums (order-independent, exact); boosts go through the
# round(x·1e12) integer-microunit quantization (round is half-away-from-
# zero in BOTH engines, unlike a double→DECIMAL cast whose tie rule
# differs — the kmeans fixed-point discipline) so the normalizing sum is
# exact and order-independent; the published weights round at 6dp.

DOREMI_SMOOTH = 0.1  # uniform-mixing coefficient (paper's smoothing)


def doremi_source_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_bigrams, nll, excess_nll, doremi_weight) per
    corpus source, ordered by source — the training-mixture weights a
    DoReMi-style reweighting run publishes.  n_docs counts docs with ≥1
    bigram (shorter docs carry no LM signal)."""
    docs = read_table(spark, sf_dir, "documents")
    bg = (
        docs.withColumn("t", F.expr(SPARK_TOKENS))
        .select("doc_id", "source", F.explode(F.expr(SPARK_BIGRAMS)).alias("bg"))
        .select(
            "doc_id",
            "source",
            F.col("bg")["0"].alias("w1"),
            F.col("bg")["1"].alias("w2"),
        )
        .localCheckpoint(eager=False)  # 3 consumers: 2 model aggs + scoring
    )
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    context_counts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.withColumn("t", F.expr(SPARK_TOKENS))
        .select(F.explode("t").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    model = (
        bigram_counts.join(context_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v")))
            .cast("decimal(20,12)")
            .alias("logp"),
        )
    )
    # per_src is |sources| rows but sits on top of the corpus-scale
    # scoring join — checkpoint it (and staged below) or every one of
    # the four downstream references re-runs that join (first executed
    # plan: 7 broadcast-nested-loop instances, per_src derived 4×).
    # Two-level aggregation instead of count_distinct: the per-doc
    # partial folds map-side, so no distinct-expand of the full scored
    # stream ever shuffles (sums of the DECIMAL partials are exact, so
    # the value is identical).
    per_src = (
        bg.join(model, ["w1", "w2"])
        .groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("nb"), F.sum("logp").alias("sl"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nb").alias("n_bigrams"),
            F.sum("sl").alias("sum_logp"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_src.agg(
        F.sum("n_bigrams").alias("tb"),
        F.sum("sum_logp").alias("tl"),
        F.count(F.lit(1)).alias("k"),
    )
    staged = (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_bigrams",
            "k",
            (-F.col("sum_logp").cast("double") / F.col("n_bigrams")).alias("nll"),
            (-F.col("tl").cast("double") / F.col("tb")).alias("corpus_nll"),
        )
        .withColumn(
            "excess", F.greatest(F.lit(0.0), F.col("nll") - F.col("corpus_nll"))
        )
        .withColumn(
            "micro",
            F.expr("CAST(round(exp(excess) * 1e12) AS DECIMAL(38,0))"),
        )
        .localCheckpoint(eager=False)  # feeds the norm total AND the output
    )
    totm = staged.agg(F.sum("micro").alias("tm"))
    return (
        staged.crossJoin(F.broadcast(totm))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round("nll", 6).alias("nll"),
            F.round("excess", 6).alias("excess_nll"),
            F.round(
                F.lit(1.0 - DOREMI_SMOOTH)
                * (F.col("micro").cast("double") / F.col("tm").cast("double"))
                + F.lit(DOREMI_SMOOTH) / F.col("k"),
                6,
            ).alias("doremi_weight"),
        )
        .orderBy("source")
    )


DOREMI_ORACLE = f"""
WITH toks AS (SELECT doc_id, source, {DUCK_TOKENS} AS t FROM documents),
bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)
),
bigram_counts AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
context_counts AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
vocab AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(t) AS w FROM toks)
),
model AS (
  SELECT w1, w2,
         CAST(ln((c12 + 1) / (c1 + v)) AS DECIMAL(20,12)) AS logp
  FROM bigram_counts JOIN context_counts USING (w1) CROSS JOIN vocab
),
per_src AS (
  SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         sum(logp) AS sum_logp
  FROM bg JOIN model USING (w1, w2)
  GROUP BY source
),
tot AS (SELECT CAST(sum(n_bigrams) AS DOUBLE) AS tb,
               CAST(sum(sum_logp) AS DOUBLE) AS tl,
               count(*) AS k
        FROM per_src),
staged AS (
  SELECT source, n_docs, n_bigrams, k,
         -CAST(sum_logp AS DOUBLE) / n_bigrams AS nll,
         greatest(0.0, -CAST(sum_logp AS DOUBLE) / n_bigrams - (-tl / tb))
           AS excess
  FROM per_src CROSS JOIN tot
),
st2 AS (
  SELECT *, CAST(round(exp(excess) * 1e12) AS DECIMAL(38,0)) AS micro
  FROM staged
),
totm AS (SELECT CAST(sum(micro) AS DOUBLE) AS tm FROM st2)
SELECT source, n_docs, n_bigrams,
       round(nll, 6) AS nll,
       round(excess, 6) AS excess_nll,
       round({1.0 - DOREMI_SMOOTH} * (CAST(micro AS DOUBLE) / tm)
             + {DOREMI_SMOOTH} / k, 6) AS doremi_weight
FROM st2 CROSS JOIN totm
ORDER BY source
"""


register("doremi_source_weights", doremi_source_weights, DOREMI_ORACLE)


# -- CCNet-style perplexity bucketing ----------------------------------------


def ppl_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020, "CCNet:
    Extracting high-quality monolingual datasets from web crawl data"):
    rank every document by LM perplexity and cut the corpus into
    terciles — 'head' (lowest ppl = most fluent) is what the paper keeps
    for LM training, 'tail' is the noise bucket.  Report per bucket:
    document count, bigram volume, and the rounded perplexity range.

    The LM is the corpus add-one bigram model above (oracle-shared); the
    tercile cut is the engine's eq-depth boundary pattern
    (``events_value_deciles_eqdepth``): compute the exact boundary
    perplexities at the ntile cut ranks k1 = |head|, k2 = |head|+|middle|
    with ONE tiny aggregate, broadcast the two scalars back, and assign
    buckets by comparison — NO global window, so the per-doc score table
    never funnels through a single partition (``ntile(3) OVER ()`` would
    move every scored doc to one task at 100 TB).

    Boundary determinism without a per-row tiebreak: ppl is rounded to
    4dp, so realized values sit on a 1e-4 grid; ``percentile(ppl, p)``
    at the mid-rank p = (k - 0.5)/(n - 1) interpolates STRICTLY between
    the k-th and (k+1)-th order statistics (fraction ≈ 0.5), hence
    ``ppl <= bound`` selects exactly the k lowest rows — and when the
    boundary value ties across docs, ALL tied docs fall in the lower
    bucket (ties-to-lower; CCNet cuts by perplexity value, so equal-ppl
    docs land in the same bucket by construction).  The oracle computes
    the identical membership from the explicit rank-k order statistic."""
    scored = bigram_lm_perplexity(spark, sf_dir).localCheckpoint(eager=False)
    n = scored.count()  # scalar; scored is checkpointed so this is one pass
    q, r = divmod(n, 3)
    k1 = q + (1 if r >= 1 else 0)
    k2 = k1 + q + (1 if r >= 2 else 0)

    def _p(k: int) -> float:
        return 1.0 if n <= 1 or k >= n else (k - 0.5) / (n - 1)

    bounds = scored.agg(
        F.expr(f"percentile(ppl, {_p(k1)!r})").alias("b1"),
        F.expr(f"percentile(ppl, {_p(k2)!r})").alias("b2"),
    )
    bucketed = scored.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.when(F.col("ppl") <= F.col("b1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("b2"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("total_bigrams"),
            F.min("ppl").alias("min_ppl"),
            F.max("ppl").alias("max_ppl"),
        )
        .orderBy("bucket")
    )


PPL_BUCKET_ORACLE = f"""
WITH {DUCK_BIGRAMS_BODY},
bigram_counts AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
context_counts AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
vocab AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(t) AS w FROM toks)
),
model AS (
  SELECT w1, w2,
         CAST(ln((c12 + 1) / (c1 + v)) AS DECIMAL(20,12)) AS logp
  FROM bigram_counts JOIN context_counts USING (w1) CROSS JOIN vocab
),
scored AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         round(exp(-(CAST(sum(logp) AS DOUBLE) / count(*))), 4) AS ppl
  FROM bg JOIN model USING (w1, w2)
  GROUP BY doc_id
),
params AS (
  SELECT count(*) AS n,
         count(*) // 3
           + CASE WHEN count(*) % 3 >= 1 THEN 1 ELSE 0 END AS k1,
         (count(*) // 3) * 2
           + CASE WHEN count(*) % 3 >= 1 THEN 1 ELSE 0 END
           + CASE WHEN count(*) % 3 >= 2 THEN 1 ELSE 0 END AS k2
  FROM scored
),
ranked AS (
  SELECT ppl, row_number() OVER (ORDER BY ppl, doc_id) AS rn FROM scored
),
-- boundary order statistics at the ntile cut ranks; assignment is
-- ppl <= boundary, so equal-ppl docs all land in the lower bucket
-- (ties-to-lower), matching the Spark side's mid-rank percentile bound
bounds AS (
  SELECT max(CASE WHEN rn <= k1 THEN ppl END) AS b1,
         max(CASE WHEN rn <= k2 THEN ppl END) AS b2
  FROM ranked CROSS JOIN params
),
bucketed AS (
  SELECT s.*, CASE WHEN s.ppl <= b.b1 THEN 'head'
                   WHEN s.ppl <= b.b2 THEN 'middle'
                   ELSE 'tail' END AS bucket
  FROM scored s CROSS JOIN bounds b
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
       min(ppl) AS min_ppl, max(ppl) AS max_ppl
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


register("ppl_bucket_profile", ppl_bucket_profile, PPL_BUCKET_ORACLE)
