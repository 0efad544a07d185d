"""Custom Python DataSource: paginated catalog export + pruned read-back."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_catalog_spark.datasets_source import datasets_df
from data_catalog_spark.paged_source import (
    export_paged_json,
    read_paged_catalog,
)


def _export(spark, sf_dir, tmp_path, page_size=64):
    out = str(tmp_path / "pages")
    n_pages = export_paged_json(datasets_df(spark, sf_dir), out, page_size)
    return out, n_pages


def test_roundtrip_identity(spark, sf_dir, tmp_path):
    src = datasets_df(spark, sf_dir)
    out, n_pages = _export(spark, sf_dir, tmp_path)
    back = read_paged_catalog(spark, out)
    assert n_pages > 1  # multiple partitions exercised
    assert back.count() == src.count()
    want = {tuple(r) for r in src.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_org_filter_pushdown_prunes_and_matches(spark, sf_dir, tmp_path):
    # page_size=3 with the org01/org02/org03 cycle ⇒ most pages hold all
    # three orgs, but correctness must hold regardless; use a 1-row page to
    # force real pruning.
    out, _ = _export(spark, sf_dir, tmp_path, page_size=1)
    back = read_paged_catalog(spark, out)
    got = back.where(F.col("orgUUID") == "org02").count()
    want = (
        datasets_df(spark, sf_dir).where(F.col("orgUUID") == "org02").count()
    )
    assert got == want > 0


def test_isin_pushdown(spark, sf_dir, tmp_path):
    out, _ = _export(spark, sf_dir, tmp_path, page_size=1)
    back = read_paged_catalog(spark, out)
    got = back.where(F.col("orgUUID").isin("org01", "org03")).count()
    want = (
        datasets_df(spark, sf_dir)
        .where(F.col("orgUUID").isin("org01", "org03"))
        .count()
    )
    assert got == want > 0


def test_residual_filters_still_applied(spark, sf_dir, tmp_path):
    """Filters the source does NOT claim (format equality) must still be
    applied by Spark on top of the source output."""
    out, _ = _export(spark, sf_dir, tmp_path)
    back = read_paged_catalog(spark, out)
    got = back.where(
        (F.col("orgUUID") == "org01") & (F.col("format") == "csv")
    ).count()
    want = (
        datasets_df(spark, sf_dir)
        .where((F.col("orgUUID") == "org01") & (F.col("format") == "csv"))
        .count()
    )
    assert got == want > 0


def test_stream_change_feed_incremental(spark, sf_dir, tmp_path):
    """Two exports into the same page log; two availableNow passes must
    deliver exactly the old pages then exactly the new ones."""
    from data_catalog_spark.paged_source import (
        FORMAT_NAME,
        register_paged_source,
        export_paged_json,
    )

    src = datasets_df(spark, sf_dir)
    half = src.where(F.col("isPublic"))
    out = str(tmp_path / "feed")
    export_paged_json(half, out, page_size=32)
    register_paged_source(spark)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_pass():
        q = (
            spark.readStream.format(FORMAT_NAME)
            .option("path", out)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_pass()
    n1 = spark.read.parquet(sink).count()
    assert n1 == half.count()

    # append the private half as new pages (continue the page numbering)
    import json as _json, os as _os

    with open(_os.path.join(out, "_manifest.json")) as f:
        manifest = _json.load(f)
    rest = src.where(~F.col("isPublic"))
    tmp2 = str(tmp_path / "feed2")
    export_paged_json(rest, tmp2, page_size=32)
    with open(_os.path.join(tmp2, "_manifest.json")) as f:
        manifest2 = _json.load(f)
    for e in manifest2:
        new_name = f"page-{len(manifest):05d}.json"
        _os.rename(_os.path.join(tmp2, e["file"]), _os.path.join(out, new_name))
        manifest.append({**e, "file": new_name})
    with open(_os.path.join(out, "_manifest.json"), "w") as f:
        _json.dump(manifest, f)

    run_pass()
    n2 = spark.read.parquet(sink).count()
    assert n2 == src.count()  # exactly the delta was appended, no replay


def test_conjunct_org_filters_intersect(spark, sf_dir, tmp_path):
    """Two AND-ed orgUUID constraints must intersect — a source that keeps
    only the last claimed filter silently widens the result."""
    out, _ = _export(spark, sf_dir, tmp_path)
    back = read_paged_catalog(spark, out)
    got = back.where(
        F.col("orgUUID").isin("org01", "org02")
        & F.col("orgUUID").isin("org02", "org03")
    ).count()
    want = (
        datasets_df(spark, sf_dir)
        .where(
            F.col("orgUUID").isin("org01", "org02")
            & F.col("orgUUID").isin("org02", "org03")
        )
        .count()
    )
    assert got == want > 0
