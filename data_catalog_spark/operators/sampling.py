"""Deterministic content-hash sampling.

`df.sample()` is seed- and partitioning-dependent — useless when the
sample must be reproducible across runs, engines, and cluster sizes (the
usual requirement for training-data ablations and debug subsets).  The
scalable design: bucket every row by a hash of its stable key and keep
buckets below the rate threshold.  Map-only, no shuffle, no state; the
same row is in the sample on 1 executor or 1000, in Spark or DuckDB —
which is exactly what lets the oracle check it.

Bucket = first 8 hex chars of md5(key) as an integer, mod 100 (md5 because
both engines have it; 32 bits is plenty for percent-level rates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

SAMPLE_PCT = 10
# per-language rates: downsample the dominant language hardest; languages
# not listed fall through to DEFAULT_PCT (50%), NOT 100%
STRATA_PCT = {"en": 5, "de": 20, "es": 20, "fr": 20}
DEFAULT_PCT = 50

_SPARK_BUCKET = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
_DUCK_BUCKET = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 100"


def sample_documents_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat deterministic ~10% sample of documents."""
    return (
        read_table(spark, sf_dir, "documents")
        .where(F.expr(_SPARK_BUCKET) < SAMPLE_PCT)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_DUCK_BUCKET} < {SAMPLE_PCT}
ORDER BY doc_id
"""


def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates (downsample the dominant stratum) — the
    rebalancing step of corpus construction; still map-only and
    deterministic."""
    rate = F.lit(DEFAULT_PCT)
    for lang, pct in STRATA_PCT.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    return (
        read_table(spark, sf_dir, "documents")
        .where(F.expr(_SPARK_BUCKET) < rate)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


_STRATA_CASE = (
    "CASE "
    + " ".join(f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in STRATA_PCT.items())
    + f" ELSE {DEFAULT_PCT} END"
)

STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_DUCK_BUCKET} < {_STRATA_CASE}
ORDER BY doc_id
"""


register("sample_documents_hash", sample_documents_hash, SAMPLE_ORACLE)
register("stratified_sample_documents", stratified_sample_documents, STRATIFIED_ORACLE)


# -- per-source document caps -------------------------------------------------

SOURCE_CAP = 15  # max documents kept per source (bites from sf0.01 up)


def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source at SOURCE_CAP documents, keeping the LONGEST ones
    (length as the quality proxy; deterministic doc_id tie-break) — the
    over-represented-domain downsampling step every web-scale corpus
    build runs (a handful of crawl hosts otherwise dominate training
    mixture weights).

    One window over the source partition — a single shuffle on the
    source key; at 100 TB a skewed mega-source is exactly one partition,
    so the standard salting/two-phase top-k applies if a host exceeds
    executor memory (same playbook as salted_returnflag_stats)."""
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        read_table(spark, sf_dir, "documents")
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= SOURCE_CAP)
        .select("doc_id", "source", "n_chars", F.col("r").cast("int").alias("rank_in_source"))
        .orderBy("doc_id")
    )


SOURCE_CAP_ORACLE = f"""
SELECT doc_id, source, n_chars, CAST(r AS INTEGER) AS rank_in_source
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS r
  FROM documents
)
WHERE r <= {SOURCE_CAP}
ORDER BY doc_id
"""


register("cap_docs_per_source", cap_docs_per_source, SOURCE_CAP_ORACLE)


# -- weighted sampling without replacement (A-Res) ---------------------------

WEIGHTED_K = 50

# Deterministic uniform in (0,1): first 8 md5 hex digits of the key, scaled.
# The +0.5 keeps u strictly inside (0,1) so ln(u) is finite and nonzero.
_SPARK_U = (
    "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS DOUBLE)"
    " + 0.5) / 4294967296.0"
)
_DUCK_U = (
    "((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " + 0.5) / 4294967296.0)"
)


def weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``WEIGHTED_K`` weighted sample without replacement, weight =
    ``n_chars`` (Efraimidis–Spirakis A-Res: key = -ln(u)/w, keep the K
    smallest keys ⇔ inclusion probability ∝ weight).

    Distributed shape: the key is a map-only expression; the selection is a
    global top-k (``TakeOrderedAndProject`` — per-partition heaps, driver
    merges K rows, no sort shuffle).  Deterministic u (md5 of doc_id) makes
    the 'random' sample reproducible at any parallelism — the property that
    lets a 100 TB corpus job be resumed or audited."""
    return (
        read_table(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(-F.log(F.expr(_SPARK_U)) / F.col("n_chars"), 10).alias("res_key"),
        )
        .orderBy("res_key", "doc_id")
        .limit(WEIGHTED_K)
    )


WEIGHTED_ORACLE = f"""
SELECT doc_id, lang, n_chars,
       round(-ln({_DUCK_U}) / n_chars, 10) AS res_key
FROM documents
WHERE n_chars > 0
ORDER BY res_key, doc_id
LIMIT {WEIGHTED_K}
"""


register("weighted_sample_documents", weighted_sample_documents, WEIGHTED_ORACLE)
