"""Partitioned sink + partition-pruning reads — the catalog's deployment
layout (security predicates become pruned directories)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_catalog_spark.datasets_source import datasets_df
from data_catalog_spark.io import read_partitioned, write_partitioned


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ds = datasets_df(spark, sf_dir)
    path = str(tmp_path / "datasets_part")
    write_partitioned(ds, path, ["isPublic", "format"])

    back = read_partitioned(spark, path)
    assert back.count() == ds.count()

    pruned = back.where((F.col("isPublic") == True) & (F.col("format") == "json"))  # noqa: E712
    want = ds.where((F.col("isPublic") == True) & (F.col("format") == "json")).count()  # noqa: E712
    assert pruned.count() == want > 0

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the security/format predicate must prune partitions, not filter rows
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "isPublic" in seg and "format" in seg


def test_security_predicate_becomes_partition_pruning(spark, sf_dir, tmp_path):
    """The deployment claim, pinned end-to-end: the COMPILED cat_only_public
    security predicate, applied through the real search path over the
    isPublic-partitioned layout, must land in the scan's PartitionFilters
    (directories skipped at planning time) — not in a row filter."""
    from data_catalog_spark import search
    from data_catalog_spark.query import DataSetFiltering, compile_query

    ds = datasets_df(spark, sf_dir)
    path = str(tmp_path / "datasets_sec")
    write_partitioned(ds, path, ["isPublic"])

    cq = compile_query({"size": 50}, [], DataSetFiltering.ONLY_PUBLIC, False)
    result = search.hits(read_partitioned(spark, path), cq)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "isPublic" in seg
    # and the pruned result equals the unpartitioned reference
    want = sorted(r.id for r in search.hits(ds, cq).collect())
    assert sorted(r.id for r in result.collect()) == want


def test_catalog_manifest_read_prunes_private_branch(spark, tmp_path):
    """The catalog's manifest-union read: a security filter on isPublic must
    collapse the non-matching partition branch at OPTIMIZATION time (the
    private snapshot directory never appears in the optimized plan)."""
    from data_catalog_spark.catalog import DatasetsCatalog
    from test_catalog import ENTRY

    c = DatasetsCatalog(spark, str(tmp_path / "cat"))
    c.create_if_not_exists()
    c.bulk_upsert(
        [
            ("pub", {**ENTRY, "isPublic": True}),
            ("priv", {**ENTRY, "isPublic": False, "title": "private"}),
        ]
    )
    q = c.df().where(F.col("isPublic") == True)  # noqa: E712
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    # the Union over partition branches must collapse to the single matching
    # scan (the false branch's filter folds to an empty relation)
    assert "Union" not in plan
    assert plan.count("parquet") == 1
    assert [r.id for r in q.collect()] == ["pub"]


def test_pruned_scan_reads_fewer_files(spark, sf_dir, tmp_path):
    ds = datasets_df(spark, sf_dir)
    path = str(tmp_path / "datasets_part2")
    write_partitioned(ds, path, ["format"])
    back = read_partitioned(spark, path)
    full_rows = back.count()
    one_fmt = back.where(F.col("format") == "csv")
    assert 0 < one_fmt.count() < full_rows


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    import os

    from data_catalog_spark.io import compact_parquet, read_table

    path = str(tmp_path / "events_many")
    ev = read_table(spark, sf_dir, "events")
    ev.repartition(24).write.parquet(path)  # simulate micro-batch droppings
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before >= 20

    checksum = ev.selectExpr("sum(event_id) s", "count(*) n").collect()[0]
    n_files = compact_parquet(spark, path, target_files=4, sort_by="ts")
    assert n_files <= 4
    after = spark.read.parquet(path).selectExpr("sum(event_id) s", "count(*) n").collect()[0]
    assert (after.s, after.n) == (checksum.s, checksum.n)


def test_clustered_write_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """After write_clustered on o_custkey, per-file [min,max] key ranges
    must not overlap — the property footer-based data skipping needs."""
    import os

    import pyarrow.parquet as pq

    from data_catalog_spark.io import read_table, write_clustered

    src = read_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_clustered")
    write_clustered(src, out, ["o_custkey"], n_files=8)

    ranges = []
    for fname in os.listdir(out):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, fname)).metadata
        idx = md.schema.names.index("o_custkey")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # disjoint (boundary equality allowed)

    # and the layout round-trips all rows
    assert spark.read.parquet(out).count() == src.count()


def test_clustered_read_prunes_with_pushed_filter(spark, sf_dir, tmp_path):
    """A selective predicate on the cluster key reaches the scan as a
    pushed filter (row-group skipping applies it against footer stats)."""
    from data_catalog_spark.io import read_table, write_clustered

    src = read_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_clustered2")
    write_clustered(src, out, ["o_custkey"], n_files=8)
    q = spark.read.parquet(out).where("o_custkey = 7").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1].split("]")[0] if "PushedFilters" in plan else ""
    assert "o_custkey" in pushed
    want = src.where("o_custkey = 7").count()
    assert q.count() == want


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime bloom-filter pruning (the shuffle-join sibling of DPP): a
    selective filter on the dim side must inject a might_contain() filter
    on the fact scan, so non-qualifying fact rows drop BEFORE the shuffle —
    at 100 TB this is what keeps a filtered fact-fact join from shuffling
    the whole fact table.  Local datasets sit below the default size
    heuristics (10 GB application-side scan), so the thresholds are lowered
    for the test; the plan shape is what's being pinned."""
    from data_catalog_spark.io import read_table

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        ord_ = read_table(spark, sf_dir, "orders").where("o_orderpriority = '1-URGENT'")
        li = read_table(spark, sf_dir, "lineitem")
        j = li.join(ord_, li.l_orderkey == ord_.o_orderkey).groupBy("l_returnflag").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        got = {(r.l_returnflag, r["count"]) for r in j.collect()}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    want = {
        (r.l_returnflag, r["count"])
        for r in read_table(spark, sf_dir, "lineitem")
        .join(
            read_table(spark, sf_dir, "orders").where("o_orderpriority = '1-URGENT'"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .count()
        .collect()
    }
    assert got == want and got


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: joining a date-partitioned fact to a FILTERED dim must prune
    fact partitions at RUNTIME from the dim's filter results (a
    dynamicpruning subquery on the fact scan), so the fact never reads
    non-qualifying dates even though the date set is only known after the
    dim filter runs — at 100 TB this keeps star-join scans proportional to
    the selected slice.  Note the predicate must be a real comparison
    (a bare boolean attribute does not count as 'selective' to the DPP
    rule), and the tiny local tables need useStats=false or the benefit
    heuristic rejects pruning."""
    from pyspark.sql import functions as F

    from data_catalog_spark.io import read_table

    ev = read_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    fact = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(fact)

    days = ev.select("day").distinct().withColumn(
        "region", F.when(F.col("day") <= "2024-01-03", "hot").otherwise("cold")
    )
    dim = str(tmp_path / "day_dim")
    days.write.parquet(dim)

    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try:
        f = spark.read.parquet(fact)
        d = spark.read.parquet(dim).where(F.col("region") == "hot")
        joined = (
            f.join(F.broadcast(d), "day")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]

        got = {(r.event_type, r.n) for r in joined.collect()}
    finally:
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    want = {
        (r.event_type, r.n)
        for r in ev.where(F.col("day") <= "2024-01-03")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_registered_partitioned_query_prunes_and_matches(spark, sf_dir, ddb):
    """The REGISTERED cat_partitioned_only_public entry: PartitionFilters in
    its executed plan AND oracle-identical results to cat_only_public."""
    from conftest import assert_same
    from data_catalog_spark.entries import (
        _partitioned_only_public,
        catalog_oracles,
    )

    q = _partitioned_only_public(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "isPublic" in seg
    assert_same(q, ddb, catalog_oracles()["cat_partitioned_only_public"])


def test_link_tree_matches_copy_and_isolates_mutation(tmp_path):
    """link_tree: byte-identical scratch tree via hardlinks, and the
    append-only write discipline it relies on (write-temp + atomic
    rename) leaves the source bytes untouched even when the scratch copy
    'rewrites' a manifest."""
    import json
    import os

    from data_catalog_spark.io import link_tree

    src = tmp_path / "seed"
    (src / "seg").mkdir(parents=True)
    (src / "seg" / "part-0.parquet").write_bytes(b"immutable-bytes")
    (src / "MANIFEST.json").write_text(json.dumps({"segments": ["seg"]}))

    dst = tmp_path / "scratch"
    dst.mkdir()
    link_tree(str(src), str(dst))
    assert (dst / "seg" / "part-0.parquet").read_bytes() == b"immutable-bytes"
    assert (dst / "MANIFEST.json").read_text() == (src / "MANIFEST.json").read_text()
    # same filesystem in CI: the data file must be a hardlink, not a copy
    assert os.stat(dst / "seg" / "part-0.parquet").st_nlink >= 2

    # the engine's only mutable-file protocol: write a temp, os.replace it
    tmp = dst / "MANIFEST.json.tmp"
    tmp.write_text(json.dumps({"segments": ["seg", "seg2"]}))
    os.replace(tmp, dst / "MANIFEST.json")
    # scratch diverged; the linked source manifest is untouched
    assert json.loads((src / "MANIFEST.json").read_text()) == {"segments": ["seg"]}
    # deletes in scratch only unlink — source survives
    os.unlink(dst / "seg" / "part-0.parquet")
    assert (src / "seg" / "part-0.parquet").read_bytes() == b"immutable-bytes"
