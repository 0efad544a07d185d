"""KWIC UDTF: oracle parity + lateral-join semantics."""

from __future__ import annotations

from data_catalog_spark.operators import udtf_ops

from conftest import assert_same


def test_kwic_parity(spark, sf_dir, ddb):
    assert_same(udtf_ops.docs_kwic(spark, sf_dir), ddb, udtf_ops.KWIC_ORACLE)


def test_kwic_contexts_contain_term(spark, sf_dir):
    rows = udtf_ops.docs_kwic(spark, sf_dir).collect()
    assert rows, "term must occur in the corpus"
    for r in rows[:50]:
        assert udtf_ops.KWIC_TERM in r.context.split()
        assert len(r.context.split()) <= 2 * udtf_ops.KWIC_WINDOW + 1
        assert r.pos >= 1
