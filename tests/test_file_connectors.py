"""JSON / CSV connectors: declared-schema ingest, rejects capture, and
round-trip fidelity (S6 bulk-load semantics — elastic_admin.py:54-83 skips
invalid rows; our rejects frame preserves them)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from data_catalog_spark import io as dio

VALID = {
    "id": "1",
    "title": "cold widget",
    "category": "brand#13",
    "dataSample": "id,name",
    "format": "csv",
    "recordCount": 100,
    "size": 2048,
    "sourceUri": "http://www.catalog.com/cold/widget",
    "targetUri": "hdfs://namenode:8200/warehouse/brand%2313/1/000000_1",
    "storeType": "hdfs",
    "isPublic": True,
    "orgUUID": "org01",
    "creationTime": "2014-05-01T10:00:00",
}


def test_json_ingest_splits_good_and_rejects(spark, tmp_path):
    p = tmp_path / "entries.jsonl"
    rows = [
        json.dumps(VALID),
        json.dumps({**VALID, "id": "2", "recordCount": 200}),
        '{"id": "3", "recordCount": "not-a-number"}',  # type clash -> corrupt
        "{broken json",  # parse failure -> corrupt
    ]
    p.write_text("\n".join(rows) + "\n")
    good, rejects = dio.read_json_entries(spark, str(p))
    assert sorted(r.id for r in good.collect()) == ["1", "2"]
    rej = [r._corrupt_record for r in rejects.collect()]
    assert len(rej) == 2
    assert any("broken" in r for r in rej)


def test_json_roundtrip(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text(json.dumps(VALID) + "\n")
    good, _ = dio.read_json_entries(spark, str(src))
    out = tmp_path / "out"
    dio.write_json_entries(good, str(out))
    back, rejects = dio.read_json_entries(spark, str(out))
    assert rejects.count() == 0
    a = {k: v for k, v in back.collect()[0].asDict().items()}
    assert a == VALID


def test_csv_ingest_schema_and_rejects(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    p = tmp_path / "t.csv"
    p.write_text("k,name,score\n1,alpha,0.5\n2,beta,0.75\nxx,gamma,oops\n")
    good, rejects = dio.read_csv_table(spark, str(p), schema)
    assert sorted((r.k, r.name) for r in good.collect()) == [(1, "alpha"), (2, "beta")]
    assert rejects.count() == 1


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    p = tmp_path / "t.csv"
    p.write_text("k,name,score\n1,alpha,0.5\n2,beta,0.75\n")
    good, _ = dio.read_csv_table(spark, str(p), schema)
    out = tmp_path / "out"
    dio.write_csv_table(good, str(out))
    back, rejects = dio.read_csv_table(spark, str(out), schema)
    assert rejects.count() == 0
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, good.collect()))


def test_json_ingest_feeds_bulk_upsert(spark, tmp_path):
    """The S6 path end-to-end: JSONL file → declared-schema read → catalog
    bulk merge; invalid line skipped, valid rows land under their ids."""
    from data_catalog_spark.catalog import DatasetsCatalog

    p = tmp_path / "bulk.jsonl"
    p.write_text(
        json.dumps(VALID)
        + "\n"
        + json.dumps({**VALID, "id": "9", "title": "blue rod"})
        + "\n{nope\n"
    )
    good, rejects = dio.read_json_entries(spark, str(p))
    cat = DatasetsCatalog(spark, os.path.join(str(tmp_path), "catalog"))
    cat.create_if_not_exists()
    # storeType is physical-mapping-only (not Cerberus-writable —
    # SURVEY §1.2), so strip it before the PUT-path validation.
    created, bad = cat.bulk_upsert(
        [
            (r["id"], {k: v for k, v in r.asDict().items() if k not in ("id", "storeType")})
            for r in good.collect()
        ],
        skip_invalid=True,
    )
    assert created == {"1", "9"}
    assert rejects.count() == 1
    assert cat.count() == 2


def test_orc_roundtrip_lineitem_sample(spark, sf_dir, tmp_path):
    """ORC sink/source round-trip preserves values and schema exactly."""
    src = dio.read_table(spark, sf_dir, "nation")
    out = tmp_path / "nation_orc"
    dio.write_orc_table(src, str(out))
    back = dio.read_orc_table(spark, str(out))
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Hive-partitioned ORC layout: a filter on the partition column shows
    up as a partition filter (pruned directories), not a row filter."""
    src = dio.read_table(spark, sf_dir, "orders")
    out = tmp_path / "orders_orc"
    dio.write_orc_table(src, str(out), partition_cols=["o_orderpriority"])
    back = dio.read_orc_table(spark, str(out))
    q = back.where(back.o_orderpriority == "1-URGENT")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    want = src.where(src.o_orderpriority == "1-URGENT").count()
    assert q.count() == want


def test_orc_predicate_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    """Non-partition predicates land in the ORC reader as PushedFilters."""
    src = dio.read_table(spark, sf_dir, "orders")
    out = tmp_path / "orders_orc_flat"
    dio.write_orc_table(src, str(out))
    back = dio.read_orc_table(spark, str(out))
    q = back.where(back.o_totalprice > 100000.0).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1].split("]")[0] if "PushedFilters" in plan else ""
    assert "o_totalprice" in pushed


def test_observed_write_metrics_match_separate_agg(spark, sf_dir, tmp_path):
    """Observation metrics collected during the write equal a standalone
    aggregation over the same input."""
    from pyspark.sql import functions as F

    src = dio.read_table(spark, sf_dir, "orders")
    got = dio.write_parquet_observed(
        src,
        str(tmp_path / "orders_observed"),
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_price": F.sum(F.col("o_totalprice").isNull().cast("long")),
            "max_price": F.max("o_totalprice"),
        },
    )
    want = src.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("n_null_price"),
        F.max("o_totalprice").alias("max_price"),
    ).collect()[0]
    assert got["n_rows"] == want.n_rows
    assert got["n_null_price"] == want.n_null_price
    assert got["max_price"] == want.max_price
    # and the write really landed
    assert spark.read.parquet(str(tmp_path / "orders_observed")).count() == want.n_rows


def test_schema_evolution_merge_read(spark, tmp_path):
    """Batches written before a column existed surface it as NULL under
    the mergeSchema read."""
    from pyspark.sql import types as T2

    old = spark.createDataFrame(
        [(1, "a"), (2, "b")],
        T2.StructType(
            [T2.StructField("k", T2.LongType()), T2.StructField("name", T2.StringType())]
        ),
    )
    new = spark.createDataFrame(
        [(3, "c", 0.5)],
        T2.StructType(
            [
                T2.StructField("k", T2.LongType()),
                T2.StructField("name", T2.StringType()),
                T2.StructField("score", T2.DoubleType()),
            ]
        ),
    )
    path = str(tmp_path / "evolving")
    old.write.mode("overwrite").parquet(path)
    new.write.mode("append").parquet(path)
    merged = dio.read_parquet_evolved(spark, path)
    assert set(merged.columns) == {"k", "name", "score"}
    got = {r.k: r.score for r in merged.collect()}
    assert got[3] == 0.5 and got[1] is None and got[2] is None


# -- XML (Spark 4 native source) ----------------------------------------------


def test_xml_ingest_schema_and_rejects(spark, tmp_path):
    """Declared schema, PERMISSIVE parse: schema-valid rows split from
    rejects — the JSONL/CSV connector contract on the XML source."""
    from pyspark.sql import types as T

    p = tmp_path / "in.xml"
    p.write_text(
        "<rows>"
        "<row><id>1</id><name>alpha</name><size>10</size></row>"
        "<row><id>not-a-number</id><name>bad</name><size>1</size></row>"
        "<row><id>2</id><name>beta</name><size>20</size></row>"
        "</rows>"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("size", T.LongType()),
        ]
    )
    good, rejects = dio.read_xml_table(spark, str(p), schema)
    rows = {r.id: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].name == "alpha" and rows[2].size == 20
    assert rejects.count() == 1


def test_xml_roundtrip_preserves_values(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema)
    out = tmp_path / "out-xml"
    dio.write_xml_table(df, str(out))
    back, rejects = dio.read_xml_table(spark, str(out), schema)
    assert sorted((r.id, r.name) for r in back.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    assert rejects.count() == 0
