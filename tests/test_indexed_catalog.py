"""Catalog + index sync: every mutation is immediately searchable through
the postings probe, and indexed search equals the scan path at every step."""

from __future__ import annotations

from data_catalog_spark import search
from data_catalog_spark.catalog import DatasetsCatalog
from data_catalog_spark.indexed_catalog import IndexedCatalog
from data_catalog_spark.query import DataSetFiltering, compile_query

ENTRY = {
    "orgUUID": "org02",
    "category": "health",
    "dataSample": "alpha,beta",
    "format": "csv",
    "recordCount": 2,
    "size": 10,
    "sourceUri": "http://example.com/widget.csv",
    "targetUri": "hdfs://h:8200/broker/x/abc/000000_1",
    "title": "shiny widget metrics",
    "isPublic": True,
    "creationTime": "2015-02-13T13:00:00",
}


def _q(text):
    return compile_query(
        {"query": text, "size": 25}, [], DataSetFiltering.ONLY_PUBLIC, False
    )


def _ids(df):
    return {r.id for r in df.collect()}


def test_mutations_are_immediately_searchable(spark, tmp_path):
    cat = DatasetsCatalog(spark, str(tmp_path / "tbl"))
    ic = IndexedCatalog(cat, str(tmp_path / "idx"))
    ic.resync()  # empty build

    ic.upsert("a", ENTRY)
    ic.upsert(
        "b",
        {
            **ENTRY,
            "title": "plain gizmo report",
            "sourceUri": "http://example.com/gizmo.csv",
        },
    )
    assert _ids(ic.hits(_q("widget"))) == {"a"}
    assert _ids(ic.hits(_q("gizmo"))) == {"b"}

    # update: title change is visible at once; 'widget' still matches a's
    # unchanged sourceUri clause, but the new title term matches too
    ic.partial_update("a", {"title": "renamed sprocket metrics"})
    assert _ids(ic.hits(_q("sprocket"))) == {"a"}
    assert _ids(ic.hits(_q("renamed"))) == {"a"}

    # delete drops it from search
    ic.delete("b")
    assert _ids(ic.hits(_q("gizmo"))) == set()

    # bulk load is indexed too (rejects are not)
    created, rejects = ic.bulk_upsert(
        [
            (
                "c",
                {
                    **ENTRY,
                    "title": "bulk carburetor data",
                    "sourceUri": "http://example.com/carb.csv",
                },
            ),
            ("d", {**ENTRY, "recordCount": "not-a-number"}),
        ],
        skip_invalid=True,
    )
    assert "c" in created and [r[0] for r in rejects] == ["d"]
    assert _ids(ic.hits(_q("carburetor"))) == {"c"}

    # invariant at every step: indexed hits == scan hits on current state
    for text in ("sprocket", "carburetor", "metrics"):
        cq = _q(text)
        want = [tuple(r) for r in search.hits(cat.df(), cq).collect()]
        got = [tuple(r) for r in ic.hits(cq).collect()]
        assert got == want


def test_resync_recovers_a_stale_index(spark, tmp_path):
    """Crash model: a catalog write that never reached the index leaves
    search stale-but-never-wrong; resync() restores full parity."""
    cat = DatasetsCatalog(spark, str(tmp_path / "tbl"))
    ic = IndexedCatalog(cat, str(tmp_path / "idx"))
    ic.upsert("a", ENTRY)
    # write behind the index's back (the crash window)
    cat.upsert("ghost", {**ENTRY, "title": "phantom widget"})
    hits = _ids(ic.hits(_q("widget")))
    assert "a" in hits and "ghost" not in hits  # stale: misses, never wrong
    ic.resync()
    assert _ids(ic.hits(_q("widget"))) == {"a", "ghost"}


def test_streaming_ingest_keeps_search_in_sync(spark, tmp_path):
    """ES's streaming-ingest contract end-to-end: entries arriving on a
    stream land in the catalog AND the postings index via foreachBatch,
    and are searchable as soon as their micro-batch commits."""
    import json as _json
    import os

    cat = DatasetsCatalog(spark, str(tmp_path / "tbl"))
    ic = IndexedCatalog(cat, str(tmp_path / "idx"))
    ic.resync()

    # JSONL drop directory as the stream source (the ingest shape a
    # catalog actually sees: files of entry payloads)
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    schema = "id string, title string, payload string"

    def write_file(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_file(
        "b0.jsonl",
        [
            {"id": "s1", "title": "streamed turbine stats", "payload": ""},
            {"id": "s2", "title": "streamed anemometer log", "payload": ""},
        ],
    )

    def ingest(batch_df, batch_id):
        for row in batch_df.collect():  # tiny control-plane batch
            ic.upsert(row.id, {**ENTRY, "title": row.title})

    stream = (
        spark.readStream.schema(schema).json(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert stream.awaitTermination(300)
    assert _ids(ic.hits(_q("turbine"))) == {"s1"}
    assert _ids(ic.hits(_q("anemometer"))) == {"s2"}

    # a second file = a later micro-batch; restart processes ONLY it
    write_file("b1.jsonl", [{"id": "s3", "title": "late gearbox report", "payload": ""}])
    stream = (
        spark.readStream.schema(schema).json(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert stream.awaitTermination(300)
    assert _ids(ic.hits(_q("gearbox"))) == {"s3"}
    # earlier docs still present and indexed exactly once
    assert cat.count() == 3
    cq = _q("streamed")
    assert [tuple(r) for r in ic.hits(cq).collect()] == [
        tuple(r) for r in search.hits(cat.df(), cq).collect()
    ]


def test_injected_crash_between_commit_and_index(spark, tmp_path, monkeypatch):
    """VERDICT r5 #5: inject a failure in the window between the catalog
    commit and the index update (indexed_catalog upsert/partial_update/
    delete all order catalog-first) and assert the documented contract —
    the index goes STALE (may miss the new doc) but never WRONG (no hit
    that the current table state doesn't satisfy); resync() recovers."""
    import pytest

    from data_catalog_spark.text_index import SegmentedTextIndex

    cat = DatasetsCatalog(spark, str(tmp_path / "tbl"))
    ic = IndexedCatalog(cat, str(tmp_path / "idx"))
    ic.resync()
    ic.upsert("a", ENTRY)  # title: shiny widget metrics
    assert _ids(ic.hits(_q("widget"))) == {"a"}

    def crash(*a, **k):
        raise OSError("simulated crash after catalog commit, before index write")

    # -- crash during upsert of a NEW doc: committed but not yet indexed --
    with monkeypatch.context() as m:
        m.setattr(SegmentedTextIndex, "upsert", crash)
        with pytest.raises(OSError):
            ic.upsert("b", {**ENTRY, "title": "phantom gyroscope data",
                            "sourceUri": "http://example.com/gyro.csv"})
    assert cat.count() == 2  # the catalog commit stands
    stale = _ids(ic.hits(_q("gyroscope")))
    assert stale == set()  # stale: the new doc is missing from search

    # -- crash during UPDATE: old postings linger as candidates ----------
    with monkeypatch.context() as m:
        m.setattr(SegmentedTextIndex, "upsert", crash)
        with pytest.raises(OSError):
            ic.partial_update("a", {"title": "renamed flux capacitor",
                                    "sourceUri": "http://example.com/flux.csv"})
    # never wrong: the stale 'widget' postings still nominate doc a as a
    # candidate, but re-verification against the CURRENT table rejects it
    assert _ids(ic.hits(_q("widget"))) == set()
    # and stale: the new title term is not yet searchable
    assert _ids(ic.hits(_q("capacitor"))) == set()

    # -- crash during DELETE: postings outlive the row -------------------
    with monkeypatch.context() as m:
        m.setattr(SegmentedTextIndex, "delete", crash)
        with pytest.raises(OSError):
            ic.delete("b")
    # never wrong: the deleted row's candidates can't survive the
    # semi-join into the current (row-less) table
    assert _ids(ic.hits(_q("gyroscope"))) == set()

    # -- resync(): full recovery to scan parity ---------------------------
    ic.resync()
    for text in ("widget", "gyroscope", "capacitor", "metrics"):
        cq = _q(text)
        assert [tuple(r) for r in ic.hits(cq).collect()] == [
            tuple(r) for r in search.hits(cat.df(), cq).collect()
        ]
    assert _ids(ic.hits(_q("capacitor"))) == {"a"}


def test_point_in_time_search(spark, tmp_path):
    """hits_at replays a search against a historical snapshot: results
    reflect the table AS OF that version while current hits move on."""
    cat = DatasetsCatalog(spark, str(tmp_path / "tbl"))
    ic = IndexedCatalog(cat, str(tmp_path / "idx"))
    ic.resync()

    ic.upsert("a", ENTRY)  # v: widget titled 'a'
    v1 = max(cat.versions())
    ic.partial_update("a", {"title": "renamed sprocket metrics"})
    ic.upsert("b", {**ENTRY, "title": "widget two"})
    v2 = max(cat.versions())
    assert v2 > v1

    # current search: 'a' matches only via sourceUri; 'b' via title+uri
    assert _ids(ic.hits(_q("widget"))) == {"a", "b"}
    assert _ids(ic.hits(_q("sprocket"))) == {"a"}
    # as of v1: only 'a', under its ORIGINAL title; sprocket unknown
    at1 = ic.hits_at(_q("widget"), v1).collect()
    assert {r.id for r in at1} == {"a"}
    assert at1[0].title == "shiny widget metrics"
    assert _ids(ic.hits_at(_q("sprocket"), v1)) == set()
    # as of v2 == current
    assert _ids(ic.hits_at(_q("widget"), v2)) == {"a", "b"}
