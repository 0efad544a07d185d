"""Language-mix entropy + day-of-week seasonality: oracle parity +
semantic invariants."""

from __future__ import annotations

import math

import pytest

from data_catalog_spark.operators import analytics as an
from data_catalog_spark.operators import profiling as pf

from conftest import assert_same

PARITY = [
    (pf.source_lang_entropy, pf.LANG_ENTROPY_ORACLE),
    (an.orders_dow_seasonality, an.DOW_SEASONALITY_ORACLE),
]


@pytest.mark.parametrize("fn,oracle", PARITY, ids=[f.__name__ for f, _ in PARITY])
def test_parity(spark, sf_dir, ddb, fn, oracle):
    assert_same(fn(spark, sf_dir), ddb, oracle)


def test_entropy_bounds(spark, sf_dir):
    """0 ≤ H ≤ ln(n_langs), with H = 0 iff monolingual."""
    for r in pf.source_lang_entropy(spark, sf_dir).collect():
        assert 0.0 <= r.lang_entropy <= math.log(r.n_langs) + 1e-9
        if r.n_langs == 1:
            assert r.lang_entropy == 0.0


def test_seasonality_index_averages_to_one(spark, sf_dir):
    """Σ index·share = 7·Σ share² ... simpler: the revenue-weighted mean of
    index/7 is 1 by construction — check Σ(sum_revenue) reproduces the
    index definition and every day name matches its day number."""
    rows = an.orders_dow_seasonality(spark, sf_dir).collect()
    assert len(rows) == 7
    total = sum(r.sum_revenue for r in rows)
    for r in rows:
        assert abs(r.seasonal_index - r.sum_revenue / total * 7) < 1e-4
    names = {r.dow_num: r.dow_name for r in rows}
    assert names[0] == "Sunday" and names[1] == "Monday" and names[6] == "Saturday"
