"""Hard-negative / positive contrastive-pair mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_catalog_spark.operators import mining
from data_catalog_spark.operators.similarity import N_QUERIES

from conftest import assert_same


def test_mining_parity(spark, sf_dir, ddb):
    assert_same(mining.hard_negative_mining(spark, sf_dir), ddb, mining.MINING_ORACLE)


def test_mining_semantics(spark, sf_dir):
    """Negatives differ in label from their anchor, positives match; counts
    per (anchor, role) respect NEG_K/POS_K; scores descend within a role."""
    from data_catalog_spark.io import read_table

    labels = {
        r.vec_id: r.label
        for r in read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = mining.hard_negative_mining(spark, sf_dir).collect()
    assert rows
    per = {}
    for r in rows:
        assert r.nid >= N_QUERIES  # anchors never mine themselves
        assert r.nid_label == labels[r.nid]
        if r.role == "neg":
            assert r.nid_label != labels[r.qid]
        else:
            assert r.nid_label == labels[r.qid]
        per.setdefault((r.qid, r.role), []).append((r.rank, r.cos))
    for (qid, role), got in per.items():
        got.sort()
        cap = mining.POS_K if role == "pos" else mining.NEG_K
        assert len(got) <= cap
        assert [rk for rk, _ in got] == list(range(1, len(got) + 1))
        sims = [c for _, c in got]
        assert sims == sorted(sims, reverse=True)


def test_mining_broadcasts_the_anchor_batch(spark, sf_dir):
    """The corpus side must stream: the only join is a broadcast NL join
    of the bounded anchor batch — no shuffle of the corpus before top-k."""
    plan = (
        mining.hard_negative_mining(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
