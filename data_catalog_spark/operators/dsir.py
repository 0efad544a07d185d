"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Score every raw document by how much more likely its HASHED-BIGRAM
features are under a target distribution than under the raw-corpus
distribution, then select the top-N by that log importance weight — the
published recipe for picking web data that "looks like" a high-quality
target corpus, reduced to bag-of-hashed-ngrams models exactly as the
paper does (their §3: hashed n-gram features make both distributions
estimable with two counting passes).

Implementation, Spark-first:
- features: word bigrams from the SHARED token expression, md5-hashed
  into ``DSIR_BUCKETS`` buckets with the portable 32-bit scheme the
  dedup module established (Spark ``conv(hex,16,10)`` ≡ DuckDB
  ``('0x'||hex)::BIGINT``) — so both engines bucket identically.
- target = documents with ``lang = 'en'`` (the pipeline's quality
  proxy here; any predicate works), raw = the whole corpus.
- per-bucket add-one smoothed log-likelihood ratio
  ``ln((ct+1)/(Tt+B)) − ln((cr+1)/(Tr+B))``, truncated to
  DECIMAL(20,12) BEFORE the per-document sum so the aggregation is
  order-independent (the langmodel module's float-parity rule).
- weight(d) = Σ over d's bigram OCCURRENCES of its bucket's ratio —
  occurrences, not distinct features, matching the paper's bag model.
- deterministic selection: top ``DSIR_TOP_N`` by (rounded weight desc,
  doc_id).

Scale (100 TB): two counting aggregations over the exploded feature
stream (one shuffle each, map-side combinable), a ≤B-row ratio table
that BROADCASTS to the scoring join, and one groupBy(doc_id) — the
whole pipeline is linear in the token stream with no self-joins.  The
top-N is a TakeOrderedAndProject, not a full sort.  The feature stream
feeds three consumers, so it is materialized once (localCheckpoint
locally; "write the postings once" at deployment scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .text import DUCK_TOKENS, SPARK_TOKENS

DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"
DSIR_TOP_N = 200

# bigram string "w1 w2" → bucket, portable across engines
_SPARK_BUCKET = (
    f"cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) % {DSIR_BUCKETS}"
)
_DUCK_BUCKET = f"('0x' || substr(md5(g), 1, 8))::BIGINT % {DSIR_BUCKETS}"

_SPARK_GRAMS = (
    "zip_with(slice(t, 1, greatest(size(t) - 1, 0)), "
    "slice(t, 2, greatest(size(t) - 1, 0)), (a, b) -> concat(a, ' ', b))"
)


def dsir_select_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``DSIR_TOP_N`` documents by hashed-bigram importance weight
    against the ``lang = 'en'`` target (module docstring has the model).
    Output: (doc_id, lang, n_bigrams, dsir_logweight, rank)."""
    docs = read_table(spark, sf_dir, "documents")
    feats = (
        docs.withColumn("t", F.expr(SPARK_TOKENS))
        .select("doc_id", "lang", F.explode(F.expr(_SPARK_GRAMS)).alias("g"))
        .select("doc_id", "lang", F.expr(_SPARK_BUCKET).alias("b"))
        .localCheckpoint(eager=False)  # 3 consumers: count ×2 + score join
    )
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        feats.where(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = feats.agg(
        F.count(F.lit(1)).alias("tr"),
        F.sum((F.col("lang") == DSIR_TARGET_LANG).cast("bigint")).alias("tt"),
    )
    ratio = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tt") + F.lit(DSIR_BUCKETS))
                )
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(DSIR_BUCKETS)))
            )
            .cast("decimal(20,12)")
            .alias("lr"),
        )
    )
    scored = (
        feats.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("lr").cast("double"), 6).alias("dsir_logweight"),
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-N,
    # merged on the driver) — the rank window then runs over ≤N rows, so no
    # global single-partition sort of the full corpus ever happens
    top = scored.orderBy(
        F.col("dsir_logweight").desc(), F.col("doc_id")
    ).limit(DSIR_TOP_N)
    w = Window.orderBy(F.col("dsir_logweight").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "lang", "n_bigrams", "dsir_logweight", "rank")
        .orderBy("rank")
    )


DSIR_ORACLE = f"""
WITH toks AS (SELECT doc_id, lang, {DUCK_TOKENS} AS t FROM documents),
gr AS (
  SELECT doc_id, lang, t[i] || ' ' || t[i + 1] AS g
  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)
),
feats AS (SELECT doc_id, lang, {_DUCK_BUCKET} AS b FROM gr),
raw AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
tgt AS (SELECT b, count(*) AS ct
        FROM feats WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT count(*) AS tr,
               sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS tt
        FROM feats),
ratio AS (
  SELECT raw.b,
         CAST(ln((coalesce(ct, 0) + 1.0) / (tt + {DSIR_BUCKETS}))
              - ln((cr + 1.0) / (tr + {DSIR_BUCKETS})) AS DECIMAL(20,12)) AS lr
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
),
scored AS (
  SELECT doc_id, any_value(lang) AS lang,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         round(CAST(sum(lr) AS DOUBLE), 6) AS dsir_logweight
  FROM feats JOIN ratio USING (b)
  GROUP BY doc_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY dsir_logweight DESC, doc_id)
                 AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, lang, n_bigrams, dsir_logweight, rank
FROM ranked WHERE rank <= {DSIR_TOP_N} ORDER BY rank
"""


register("dsir_select_topk", dsir_select_topk, DSIR_ORACLE)
