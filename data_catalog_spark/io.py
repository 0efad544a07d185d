"""Table readers for the driver's parquet tables.

The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects.  With ``spark.sql.legacy.parquet.nanosAsLong``
the column arrives as LongType nanoseconds; we convert with integer division
(``div`` — a double division would lose precision at 1e18) to microsecond
timestamps, matching what DuckDB produces when it truncates ns → µs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-layout partitioned parquet sink — the deployment layout for the
    catalog table (SURVEY §1.3: partition by low-cardinality security
    columns so the injected tenant/visibility predicate becomes partition
    PRUNING, i.e. untouched directories, not filtered rows).

    Partition columns must be low-cardinality (isPublic, format, orgUUID
    bucketed); high-cardinality partitioning creates the many-small-files
    problem this layout exists to avoid."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; filters on partition columns prune at
    planning time (visible as PartitionFilters in the scan node)."""
    return spark.read.parquet(path)
