"""Catalog CDC diff + dirty-batch ingest (operators/cdc.py,
streaming/ingest.py stream_ingest_rejects)."""

from __future__ import annotations


def test_cdc_diff_oracle_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import cdc

    assert_same(cdc.catalog_cdc_diff(spark, sf_dir), ddb, cdc._cdc_oracle())


def test_cdc_noop_reupsert_invisible(spark, sf_dir):
    """The byte-identical re-upsert (CDC_NOOP) commits but must not show
    in the diff — fingerprint equality, the sharp edge of CDC."""
    from data_catalog_spark.operators import cdc

    rows = {r["id"]: r["change"] for r in cdc.catalog_cdc_diff(spark, sf_dir).collect()}
    assert cdc.CDC_NOOP not in rows
    assert rows[cdc.CDC_DEL] == "delete"
    assert all(rows[i] == "insert" for i in cdc.CDC_INS)


def test_ingest_rejects_oracle_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.streaming import ingest

    assert_same(
        ingest.stream_ingest_rejects(spark, sf_dir), ddb, ingest._rejects_oracle()
    )


def test_ingest_rejects_never_reach_the_table(spark, sf_dir):
    """Disposition is read back from the committed table, so a 'rejected'
    status proves the row is absent post-merge — and the planted batch
    must actually exercise both lanes."""
    from data_catalog_spark.streaming import ingest

    rows = ingest.stream_ingest_rejects(spark, sf_dir).collect()
    statuses = {r["status"] for r in rows}
    assert statuses == {"merged", "rejected"}
    n_rej = sum(r["status"] == "rejected" for r in rows)
    # every other rotating-reason row + the NULL-id and http-params pins
    assert n_rej == ingest.BATCH_N // 2 + 2


def test_time_travel_search_oracle_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import cdc

    assert_same(
        cdc.catalog_time_travel_search(spark, sf_dir), ddb, cdc._tt_oracle()
    )


def test_time_travel_page_ignores_the_batch(spark, sf_dir):
    """The as-of-v0 page must contain the later-deleted id and none of
    the planted inserts — snapshot isolation observable through search."""
    from data_catalog_spark.operators import cdc

    ids = [r["id"] for r in cdc.catalog_time_travel_search(spark, sf_dir).collect()]
    assert cdc.CDC_DEL in ids
    assert not any(i.startswith("cdc-") for i in ids)
