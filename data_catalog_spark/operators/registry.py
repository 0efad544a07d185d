"""Registry of data-pipeline operator queries + oracles.

Operator modules append entries here as they land; keeps
``__spark_entry__.queries()`` a single import away.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str | None):
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def _load_all() -> None:
    # Import for side effect: each module registers its entries.
    from . import (  # noqa: F401
        agg_extras,
        analytics,
        ann_contract,
        bloom,
        bpe,
        cdc,
        corpus,
        dedup_contract,
        drift,
        crossmodal,
        dedup,
        dsir,
        events_analytics,
        joins,
        kmeans,
        langmodel,
        mining,
        multimodal,
        pandas_ops,
        phash,
        profiling,
        quality_model,
        quantization,
        redaction,
        sampling,
        scd2,
        sessionize,
        sketches,
        similarity,
        skew,
        temporal,
        text,
        tfidf,
        tpch_extra,
        tpch_final,
        traindata,
        udtf_ops,
        urls,
        windows,
    )
    from ..streaming import ann as streaming_ann  # noqa: F401
    from ..streaming import clusters as streaming_clusters  # noqa: F401
    from ..streaming import cms as streaming_cms  # noqa: F401
    from ..streaming import quality as streaming_quality  # noqa: F401
    from ..streaming import dedup as streaming_dedup  # noqa: F401
    from ..streaming import ingest as streaming_ingest  # noqa: F401
    from ..streaming import joins as streaming_joins  # noqa: F401
    from ..streaming import sessions as streaming_sessions  # noqa: F401
    from ..streaming import sink as streaming_sink  # noqa: F401
    from ..streaming import twstate as streaming_twstate  # noqa: F401
