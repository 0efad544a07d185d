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
