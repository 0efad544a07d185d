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


def test_int8_ann_parity(spark, sf_dir, ddb):
    assert_same(qz.ann_int8_topk(spark, sf_dir), ddb, qz._int8_ann_oracle())


def test_int8_ann_recall_vs_exact(spark, sf_dir):
    """Quantization may reorder near-ties but must keep recall@k high —
    the deploy-or-not gate for the 4x-smaller serving table."""
    from data_catalog_spark.operators.similarity import ann_bruteforce_topk

    exact = {}
    for r in ann_bruteforce_topk(spark, sf_dir).collect():
        exact.setdefault(r.qid, set()).add(r.nid)
    got = {}
    for r in qz.ann_int8_topk(spark, sf_dir).collect():
        got.setdefault(r.qid, set()).add(r.nid)
    assert set(got) == set(exact)
    recalls = [len(got[q] & exact[q]) / len(exact[q]) for q in exact]
    assert min(recalls) >= 0.8, recalls


def test_int8_quant_no_python_eval(spark, sf_dir):
    plan = (
        qz.embedding_int8_quant(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
