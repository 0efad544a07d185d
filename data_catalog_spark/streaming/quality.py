"""Streaming twin of the frozen-weights quality classifier — the ingest-
time scoring stage: as crawled documents land, every micro-batch is scored
by the IDENTICAL stateless column expressions the batch operator uses
(operators/quality_model.score_documents — shared code, not a re-render),
and the running keep/drop profile aggregates in complete mode.

Because scoring is stateless map work, stream output ≡ batch output
bit-for-bit; the registered query therefore carries a FULL value-hash
oracle (the batch SQL), not a rows-only check — the same twin discipline
as hourly_rollup_stream / stream_dedup_type_stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.quality_model import _logit_ctes, score_documents
from ..operators.registry import register

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (symlink staging dir,
    same layout trick as events.read_events_stream — production points
    this at the crawl landing directory)."""
    import os
    import tempfile

    stage = tempfile.mkdtemp(prefix="docs-stream-")
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(stage, "documents.parquet"),
    )
    return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(stage)


def quality_profile_stream(docs: DataFrame) -> DataFrame:
    """Running keep/drop profile: count and mean calibrated probability
    per class.  The mean goes through DECIMAL so micro-batch arrival
    order can't change the result (the property that makes the batch
    oracle exact)."""
    return (
        score_documents(docs)
        .groupBy("keep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("prob").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_prob_raw"),
        )
        .select("keep", "n_docs", F.round("mean_prob_raw", 6).alias("mean_prob"))
    )


def stream_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the scoring stream over all currently-available files
    (availableNow backfill) into a memory sink; returns the profile."""
    import uuid

    name = f"quality_profile_{uuid.uuid4().hex[:8]}"
    q = (
        quality_profile_stream(read_documents_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("keep")


STREAM_QUALITY_ORACLE = f"""
WITH {_logit_ctes()},
p AS (
  SELECT doc_id, logit >= 0 AS keep,
         round(1.0 / (1.0 + exp(-logit)), 4) AS prob
  FROM s
)
SELECT keep, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(prob AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           AS mean_prob
FROM p GROUP BY keep ORDER BY keep
"""


register("stream_quality_profile", stream_quality_profile, STREAM_QUALITY_ORACLE)
