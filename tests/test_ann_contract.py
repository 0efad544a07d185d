"""ANN recall contract entry: oracle parity + the contract actually binds."""

from __future__ import annotations

from data_catalog_spark.operators import ann_contract

from conftest import assert_same


def test_recall_contract_parity(spark, sf_dir, ddb):
    assert_same(
        ann_contract.ann_recall_contract(spark, sf_dir),
        ddb,
        ann_contract._recall_contract_oracle(),
    )


def test_recall_contract_all_lanes_pass(spark, sf_dir):
    rows = ann_contract.ann_recall_contract(spark, sf_dir).collect()
    assert {r.lane for r in rows} == set(ann_contract.LANE_FLOORS)
    for r in rows:
        floor, stat = ann_contract.LANE_FLOORS[r.lane]
        assert r.floor_recall == floor and r.floor_on == stat
        assert r.n_queries == 8
        assert 0.0 <= r.min_recall_at_10 <= r.mean_recall_at_10 <= 1.0
        assert r.meets_floor, (r.lane, r.mean_recall_at_10, r.min_recall_at_10)
        bound = r.min_recall_at_10 if stat == "min" else r.mean_recall_at_10
        assert bound >= floor


def test_recall_contract_binds_on_the_declared_stat(spark, sf_dir, monkeypatch):
    """A floor above the achieved recall must flip meets_floor to False —
    the row IS the contract, so this is the 'would a silent degradation
    turn the gate red' property, exercised by raising the bar instead of
    degrading the lane."""
    strict = {lane: (1.01, stat) for lane, (floor, stat) in
              ann_contract.LANE_FLOORS.items()}
    monkeypatch.setattr(ann_contract, "LANE_FLOORS", strict)
    rows = ann_contract.ann_recall_contract(spark, sf_dir).collect()
    assert rows and all(not r.meets_floor for r in rows)
