"""Embedding int8 quantization fidelity stats."""

from __future__ import annotations

from data_catalog_spark.operators import quantization as qz

from conftest import assert_same


def test_int8_quant_parity(spark, sf_dir, ddb):
    assert_same(qz.embedding_int8_quant(spark, sf_dir), ddb, qz._int8_oracle())


def test_int8_quant_invariants(spark, sf_dir):
    rows = qz.embedding_int8_quant(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_vectors > 0
        assert r.mean_scale > 0
        # per-element |err| <= scale/2, so per-vector rmse <= scale/2
        assert r.mean_rmse <= r.mean_scale / 2 + 1e-6
        assert r.mean_sqnr_db > 0  # int8 must beat 0 dB or it's useless
        # the max-|x| element of every vector quantizes to exactly +-127
        assert r.saturated_frac >= 1.0 / 64 - 1e-6
        assert r.saturated_frac <= 1.0


def test_int8_quant_no_python_eval(spark, sf_dir):
    plan = (
        qz.embedding_int8_quant(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
