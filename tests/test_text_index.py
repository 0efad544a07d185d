"""Inverted text index: exact equivalence to the scan-based search path on
every text-bearing catalog case, candidate-superset property, short-query
fallback, and the posting-probe plan shape."""

from __future__ import annotations

import pytest

from data_catalog_spark import search, text_index
from data_catalog_spark.datasets_source import datasets_df
from data_catalog_spark.entries import CATALOG_CASES
from data_catalog_spark.query import DataSetFiltering, compile_query

from conftest import assert_same

TEXT_CASES = [n for n, c in CATALOG_CASES.items() if c[0].get("query")]


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    ds = datasets_df(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("tix") / "postings")
    text_index.build_text_index(ds, path)
    return path


@pytest.mark.parametrize("case", TEXT_CASES)
def test_indexed_hits_equal_scan_hits(spark, sf_dir, index_path, case):
    """The index accelerates, never decides: bit-identical hits pages to
    the full-scan path on every text-bearing golden case (multi-clause,
    filtered, paginated)."""
    ds = datasets_df(spark, sf_dir)
    cq = compile_query(*CATALOG_CASES[case])
    want = [tuple(r) for r in search.hits(ds, cq).collect()]
    got = [tuple(r) for r in text_index.indexed_hits(spark, ds, index_path, cq).collect()]
    assert got == want


@pytest.mark.parametrize("case", TEXT_CASES)
def test_candidates_are_a_superset_of_matches(spark, sf_dir, index_path, case):
    """Losslessness: every doc the scan path's text disjunction matches is
    in the index's candidate set (the property that makes re-verification
    on candidates exact)."""
    from pyspark.sql import functions as F

    ds = datasets_df(spark, sf_dir)
    cq = compile_query(*CATALOG_CASES[case])
    disj = None
    for pred, _ in search.text_clause_columns(cq.text):
        disj = pred if disj is None else (disj | pred)
    matches = {r.id for r in ds.where(disj).select("id").collect()}
    cand = {
        r.id
        for r in text_index.text_candidates(spark, index_path, cq.text, ds).collect()
    }
    assert matches <= cand
    assert matches  # the golden cases all match something


def test_short_query_falls_back_to_scan_for_title(spark, sf_dir, index_path):
    """A sub-trigram probe can't use the title postings — the documented
    scan fallback keeps results identical anyway."""
    ds = datasets_df(spark, sf_dir)
    cq = compile_query({"query": "ro", "size": 25}, [], DataSetFiltering.ONLY_PUBLIC, False)
    want = [tuple(r) for r in search.hits(ds, cq).collect()]
    got = [tuple(r) for r in text_index.indexed_hits(spark, ds, index_path, cq).collect()]
    assert got == want
    assert want  # 'ro' appears inside 'rod' titles


def test_indexed_entry_matches_oracle(spark, sf_dir, ddb):
    from data_catalog_spark.entries import _indexed_text_search, catalog_oracles

    assert_same(
        _indexed_text_search(spark, sf_dir), ddb, catalog_oracles()["cat_text_search_indexed"]
    )


def test_stem_candidates_are_lossless(spark, sf_dir, index_path):
    """The title_stem family stores exactly the stemmed standard tokens,
    so the any-overlap posting probe returns precisely the stemmed-match
    answer set (unlike the trigram family's superset)."""
    from data_catalog_spark.entries import _stem_probe_terms, _stemmed_title_match_on

    ds = datasets_df(spark, sf_dir)
    matches = {r.id for r in _stemmed_title_match_on(spark, ds).select("id").collect()}
    cand = {
        r.id
        for r in text_index.stem_candidates(
            spark, index_path, _stem_probe_terms()
        ).collect()
    }
    assert matches == cand
    assert matches  # the plural probe matches singular corpus titles


def test_indexed_stemmed_title_equals_scan_and_oracle(spark, sf_dir, ddb):
    """Write-time stemming changes where the Porter chain is paid, never
    the result: identical rows to the scan path and to the shared DuckDB
    oracle."""
    from data_catalog_spark.entries import (
        _indexed_stemmed_title,
        _stemmed_title_match,
        catalog_oracles,
    )

    want = [tuple(r) for r in _stemmed_title_match(spark, sf_dir).collect()]
    got = [tuple(r) for r in _indexed_stemmed_title(spark, sf_dir).collect()]
    assert got == want
    assert want
    assert_same(
        _indexed_stemmed_title(spark, sf_dir),
        ddb,
        catalog_oracles()["cat_stemmed_title_indexed"],
    )


def test_stem_index_plan_probes_postings(spark, sf_dir):
    """Scale claim for the stem path, pinned on the plan: candidates reach
    the datasets scan as a LeftSemi join, and the postings scan carries
    the stemmed-term IN-list as a pushed data filter (plus partition
    pruning to the title_stem family dir)."""
    from data_catalog_spark.entries import _indexed_stemmed_title

    plan = (
        _indexed_stemmed_title(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan
    assert "gram" in plan and (" IN (" in plan or "EqualTo(gram" in plan or "In(gram" in plan)


def test_indexed_plan_probes_postings(spark, sf_dir, index_path):
    """Plan shape: candidates reach the datasets scan as a LeftSemi join,
    and the postings scan carries the gram IN-list as a pushed filter plus
    the field partition filter — the probe touches posting lists, not the
    corpus."""
    ds = datasets_df(spark, sf_dir)
    cq = compile_query(*CATALOG_CASES["cat_text_search"])
    plan = (
        text_index.indexed_hits(spark, ds, index_path, cq)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan
    # the gram probe reaches the postings scan as a pushed filter
    assert "EqualTo(gram," in plan or "In(gram," in plan
    assert "PartitionFilters" in plan


def test_randomized_corpus_equivalence(spark, tmp_path):
    """Seeded-random corpus + adversarial query mix (present tokens, absent
    tokens, substrings spanning token boundaries, punctuation, sub-trigram
    probes): the indexed path must equal the scan path on every one."""
    import random

    from pyspark.sql import Row

    from data_catalog_spark.schema import COLUMN_ORDER

    rng = random.Random(0xD1CE)
    words = ["amber", "bolt", "crate", "delta", "ember", "flux", "gear",
             "hinge", "ion", "jolt", "karst", "lumen", "widget", "rod"]
    rows = []
    for i in range(120):
        title = " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        sample = ",".join(rng.choice(words) for _ in range(rng.randint(1, 5)))
        uri = "http://www." + rng.choice(words) + ".com/" + rng.choice(words)
        base = {c: None for c in COLUMN_ORDER}
        base.update(
            id=str(i), title=title, dataSample=sample, sourceUri=uri,
            category="c", format="csv", recordCount=1, size=1,
            targetUri="hdfs://h:1/a/b/c", storeType="hdfs",
            isPublic=True, orgUUID="org01", creationTime="2014-01-01T00:00:00",
        )
        rows.append(Row(**{c: base[c] for c in COLUMN_ORDER}))
    from data_catalog_spark.schema import DATASETS_SCHEMA

    ds = spark.createDataFrame(rows, DATASETS_SCHEMA)
    path = str(tmp_path / "fuzz_postings")
    text_index.build_text_index(ds, path)
    queries = [
        "widget", "rod bolt", "zzz", "er", "flux.gear", "amber ember ion",
        "WIDGET", "lt", "ber cra", "om/wi", "ion jolt karst lumen widget",
    ]
    for q in queries:
        cq = compile_query({"query": q, "size": 50}, [], DataSetFiltering.ONLY_PUBLIC, False)
        want = [tuple(r) for r in search.hits(ds, cq).collect()]
        got = [tuple(r) for r in text_index.indexed_hits(spark, ds, path, cq).collect()]
        assert got == want, q


def test_short_titles_emit_no_junk_grams(spark, tmp_path):
    """Titles shorter than one trigram contribute NOTHING to the title
    postings (Spark's sequence(1, 0) is descending — unguarded it emits
    sub-length grams)."""
    from pyspark.sql import Row

    from data_catalog_spark.schema import COLUMN_ORDER, DATASETS_SCHEMA

    base = {c: None for c in COLUMN_ORDER}
    base.update(
        category="c", format="csv", recordCount=1, size=1,
        targetUri="hdfs://h:1/a/b/c", storeType="hdfs", isPublic=True,
        orgUUID="org01", creationTime="2014-01-01T00:00:00",
        dataSample="x", sourceUri="http://www.x.com/y",
    )
    rows = [
        Row(**{**base, "id": "1", "title": "ab"}),
        Row(**{**base, "id": "2", "title": ""}),
        Row(**{**base, "id": "3", "title": "abc"}),
    ]
    ds = spark.createDataFrame(
        [Row(**{c: r[c] for c in COLUMN_ORDER}) for r in rows], DATASETS_SCHEMA
    )
    path = str(tmp_path / "short_postings")
    text_index.build_text_index(ds, path)
    title_grams = (
        spark.read.parquet(path).where("field = 'title'").select("gram", "id").collect()
    )
    assert {(r.gram, r.id) for r in title_grams} == {("abc", "3")}


def test_materialization_path_tracks_source_content(tmp_path):
    """The write-once cache key must change when the source data is
    regenerated (mtime/size), not just when the path changes."""
    import os
    import time

    from data_catalog_spark.io import materialization_path

    src = tmp_path / "part.parquet"
    src.write_bytes(b"v1")
    p1 = materialization_path(str(tmp_path), "t", "part.parquet")
    assert materialization_path(str(tmp_path), "t", "part.parquet") == p1
    os.utime(src, (time.time() + 10, time.time() + 10))
    p2 = materialization_path(str(tmp_path), "t", "part.parquet")
    assert p2 != p1


def test_ensure_materialized_losing_builder_discards(tmp_path):
    import os

    from data_catalog_spark.io import ensure_materialized

    target = str(tmp_path / "mat")

    def build_v1(p):
        os.makedirs(p)
        open(os.path.join(p, "_SUCCESS"), "w").close()
        open(os.path.join(p, "v1"), "w").close()

    def build_v2(p):
        os.makedirs(p)
        open(os.path.join(p, "_SUCCESS"), "w").close()
        open(os.path.join(p, "v2"), "w").close()

    assert ensure_materialized(target, build_v1) == target
    assert os.path.exists(os.path.join(target, "v1"))
    # second build is a no-op (cached), not a rebuild
    assert ensure_materialized(target, build_v2) == target
    assert not os.path.exists(os.path.join(target, "v2"))
    # a builder racing an already-completed target discards its build dir
    # (simulated: target exists without having been seen at entry is the
    # same rename-fails path)
    def build_then_lose(p):
        build_v2(p)
        os.makedirs(target2)  # winner appears before our rename
        open(os.path.join(target2, "_SUCCESS"), "w").close()

    target2 = str(tmp_path / "mat2")
    assert ensure_materialized(target2, build_then_lose) == target2
    assert not os.path.exists(os.path.join(target2, "v2"))  # loser discarded
    leftovers = [d for d in os.listdir(tmp_path) if ".build-" in d]
    assert leftovers == []


def test_ensure_materialized_build_failure_cleans_and_raises(tmp_path):
    import os

    from data_catalog_spark.io import ensure_materialized

    target = str(tmp_path / "failmat")

    def bad_build(p):
        os.makedirs(p)
        raise RuntimeError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        ensure_materialized(target, bad_build)
    assert not os.path.exists(target)
    assert [d for d in os.listdir(tmp_path) if ".build-" in d] == []


# -- incremental (segmented) index --------------------------------------------


def _postings_set(df):
    return {(r.field, r.gram, r.id) for r in df.collect()}


def test_segmented_index_upsert_delete_compact(spark, sf_dir, tmp_path):
    """Lucene-style incremental maintenance: an upsert batch becomes a new
    segment and tombstones the old postings; reads see every write
    immediately; compaction folds to one segment with identical content;
    the final state equals a from-scratch rebuild."""
    from pyspark.sql import functions as F

    from data_catalog_spark.text_index import SegmentedTextIndex

    ds = datasets_df(spark, sf_dir)
    idx = SegmentedTextIndex(spark, str(tmp_path / "segidx"))
    idx.rebuild(ds)
    assert len(idx._segments()) == 1

    # upsert: change one doc's title to a unique token
    victim = ds.orderBy("id").limit(1).collect()[0]
    changed = ds.where(F.col("id") == victim.id).withColumn(
        "title", F.lit("zzzuniquetoken alpha")
    )
    idx.upsert(changed)
    assert len(idx._segments()) == 2

    live = idx.postings()
    stem_hits = {
        r.id
        for r in live.where(
            (F.col("field") == "title_stem") & (F.col("gram") == "zzzuniquetoken")
        ).collect()
    }
    assert stem_hits == {victim.id}
    # the victim's OLD title postings are gone from the live view
    old_first_token = victim.title.lower().split()[0]
    old_ids = {
        r.id
        for r in live.where(
            (F.col("field") == "title_stem") & F.col("id").isin([victim.id])
        ).collect()
    }
    assert old_ids == {victim.id}  # only via the new segment's grams
    # equivalence with a full rebuild over the updated corpus
    updated = ds.where(F.col("id") != victim.id).unionByName(changed)
    fresh = SegmentedTextIndex(spark, str(tmp_path / "fresh"))
    fresh.rebuild(updated)
    assert _postings_set(live) == _postings_set(fresh.postings())

    # delete tombstones without rewriting data
    idx.delete([victim.id])
    assert victim.id not in {r.id for r in idx.postings().collect()}

    # compact folds to one live-only segment, content unchanged
    before = _postings_set(idx.postings())
    assert idx.compact() == 1
    assert _postings_set(idx.postings()) == before


def test_segmented_index_serves_search(spark, sf_dir, tmp_path):
    """indexed_hits over the live segmented view equals the scan path
    AFTER a write — the ES contract (search is read-your-writes)."""
    from pyspark.sql import functions as F

    from data_catalog_spark import text_index as ti
    from data_catalog_spark.query import DataSetFiltering, compile_query

    ds = datasets_df(spark, sf_dir)
    idx = ti.SegmentedTextIndex(spark, str(tmp_path / "live"))
    idx.rebuild(ds)
    victim = ds.orderBy("id").limit(1).collect()[0]
    changed = ds.where(F.col("id") == victim.id).withColumn(
        "title", F.lit("freshly indexed widget")
    )
    idx.upsert(changed)
    updated = ds.where(F.col("id") != victim.id).unionByName(changed)
    cq = compile_query(
        {"query": "widget", "size": 25}, [], DataSetFiltering.ONLY_PUBLIC, False
    )
    want = [tuple(r) for r in search.hits(updated, cq).collect()]
    got = [
        tuple(r)
        for r in ti.indexed_hits_df(spark, updated, idx.postings(), cq).collect()
    ]
    assert got == want


def test_segmented_index_random_ops_equal_rebuild(spark, tmp_path):
    """Property: after ANY sequence of upsert/delete batches, the live
    postings equal a from-scratch rebuild over the logically-current
    corpus — segments + tombstones are pure physical layout."""
    import random

    from data_catalog_spark.text_index import SegmentedTextIndex

    rng = random.Random(7)
    words = ["amber", "bolt", "crate", "delta", "ember", "flux", "widget"]

    def phrase():
        return " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))

    state = {}

    def df_of(ids):
        rows = [(i, *state[i]) for i in ids]
        return spark.createDataFrame(
            rows, "id string, title string, dataSample string, sourceUri string"
        )

    idx = SegmentedTextIndex(spark, str(tmp_path / "rnd"))
    idx.rebuild(df_of([]))
    for step in range(6):
        if state and rng.random() < 0.4:
            victims = rng.sample(sorted(state), k=min(2, len(state)))
            for i in victims:
                state.pop(i)
            idx.delete(victims)
        else:
            ids = sorted({str(rng.randrange(10)) for _ in range(rng.randint(1, 3))})
            for i in ids:
                w = rng.choice(words)
                state[i] = (phrase(), phrase(), f"http://www.{w}.com/{w}")
            idx.upsert(df_of(ids))
        fresh = SegmentedTextIndex(spark, str(tmp_path / f"fresh{step}"))
        fresh.rebuild(df_of(sorted(state)))
        assert _postings_set(idx.postings()) == _postings_set(fresh.postings()), step


def _mini_corpus(spark, rows):
    return spark.createDataFrame(
        rows, "id string, title string, dataSample string, sourceUri string"
    )


def test_rebuild_and_compact_never_collect(spark, tmp_path, monkeypatch):
    """The 100×-catalog claim, pinned: rebuild() and compact() must not
    materialize ANY rows on the driver (r5 collected every id of a
    rebuilt/merged segment).  DataFrame.collect is forbidden for the
    duration of both calls."""
    from pyspark.sql import DataFrame

    from data_catalog_spark.text_index import SegmentedTextIndex

    idx = SegmentedTextIndex(spark, str(tmp_path / "nocollect"))
    corpus = _mini_corpus(
        spark,
        [(str(i), f"widget {i}", f"sample {i}", f"http://x.com/{i}") for i in range(20)],
    )

    def _boom(self, *a, **k):
        raise AssertionError("driver-side collect during rebuild/compact")

    with monkeypatch.context() as m:
        m.setattr(DataFrame, "collect", _boom)
        idx.rebuild(corpus)
    idx.upsert(_mini_corpus(spark, [("3", "renamed gadget", "s", "http://x.com/3")]))
    idx.delete(["5"])
    with monkeypatch.context() as m:
        m.setattr(DataFrame, "collect", _boom)
        assert idx.compact() == 1
    live = {r.id for r in idx.postings().select("id").distinct().collect()}
    assert "5" not in live and "3" in live and len(live) == 19


def test_tombstone_spill_applies_by_anti_join(spark, tmp_path, monkeypatch):
    """Past TS_INLINE_MAX, per-segment tombstones live in parquet and are
    applied by LEFT-ANTI JOIN — no isin literal list, no driver copy."""
    from data_catalog_spark import text_index as ti

    monkeypatch.setattr(ti, "TS_INLINE_MAX", 2)
    idx = ti.SegmentedTextIndex(spark, str(tmp_path / "spill"))
    idx.rebuild(
        _mini_corpus(
            spark,
            [(str(i), f"doc {i}", "s", f"http://x.com/{i}") for i in range(10)],
        )
    )
    idx.delete(["0", "1", "2", "3"])  # 4 > TS_INLINE_MAX=2 → spill
    (rec,) = idx._manifest()
    assert rec["ts_dir"] is not None and rec["ts_inline"] == []
    live = idx.postings()
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    ids = {r.id for r in live.select("id").distinct().collect()}
    assert ids == {str(i) for i in range(4, 10)}
    # a later delete unions into the spilled set (new immutable snapshot)
    old_ts = rec["ts_dir"]
    idx.delete(["4"])
    (rec2,) = idx._manifest()
    assert rec2["ts_dir"] is not None and rec2["ts_dir"] != old_ts
    ids = {r.id for r in idx.postings().select("id").distinct().collect()}
    assert ids == {str(i) for i in range(5, 10)}


def test_concurrent_upserts_do_not_collide(spark, tmp_path):
    """ADVICE r5: uuid segment names + the mutation lock mean concurrent
    writers can never mint the same segment or lose a tombstone — the
    final index equals a rebuild over the logical end state."""
    from concurrent.futures import ThreadPoolExecutor

    from data_catalog_spark.text_index import SegmentedTextIndex

    idx = SegmentedTextIndex(spark, str(tmp_path / "conc"))
    idx.rebuild(
        _mini_corpus(
            spark, [(str(i), f"base {i}", "s", f"http://x.com/{i}") for i in range(8)]
        )
    )

    def writer(k):
        # each thread rewrites its own doc AND doc k+4 (overlap across threads)
        rows = [
            (str(k), f"thread {k} fresh", "s", f"http://t.com/{k}"),
            (str(k + 4), f"thread {k} also", "s", f"http://t.com/{k + 4}"),
        ]
        SegmentedTextIndex(spark.newSession(), str(tmp_path / "conc")).upsert(
            _mini_corpus(spark, rows)
        )

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(writer, range(4)))

    segs = idx._segments()
    assert len(segs) == 5 and len(set(segs)) == 5  # no name collision
    # every id appears in the live view exactly once per (field, gram):
    # the overlapping upserts tombstoned each other in commit order, so
    # each doc's postings come from exactly one segment
    live = idx.postings().select("id", "field", "gram").collect()
    assert len(live) == len(set(live))
    assert {r.id for r in live} == {str(i) for i in range(8)}


def test_crash_before_manifest_swap_leaves_index_readable(spark, tmp_path, monkeypatch):
    """Every mutation commits via ONE atomic manifest replace: a crash
    after the data writes but before the swap leaves the previous
    generation fully readable (stale, never broken), and the next
    mutation succeeds normally.  Covers ADVICE r5's non-atomic-compact
    finding — there is no window where the index dir is missing."""
    from data_catalog_spark.text_index import SegmentedTextIndex

    idx = SegmentedTextIndex(spark, str(tmp_path / "crash"))
    idx.rebuild(
        _mini_corpus(
            spark, [(str(i), f"doc {i}", "s", f"http://x.com/{i}") for i in range(6)]
        )
    )
    idx.delete(["0"])
    before = {
        (r.field, r.gram, r.id) for r in idx.postings().collect()
    }

    def crash(self, segments):
        raise OSError("simulated crash before manifest swap")

    with monkeypatch.context() as m:
        m.setattr(SegmentedTextIndex, "_write_manifest", crash)
        import pytest as _pytest

        with _pytest.raises(OSError):
            idx.compact()
        with _pytest.raises(OSError):
            idx.upsert(_mini_corpus(spark, [("9", "new", "s", "http://x.com/9")]))
    # previous generation intact — including on a FRESH handle (constructor
    # must not resurrect an empty index)
    again = SegmentedTextIndex(spark, str(tmp_path / "crash"))
    assert {(r.field, r.gram, r.id) for r in again.postings().collect()} == before
    # and the chain is not wedged: the next compact commits and sweeps orphans
    assert again.compact() == 1
    assert {(r.field, r.gram, r.id) for r in again.postings().collect()} == before
    import os

    leftover = [d for d in os.listdir(tmp_path / "crash") if d.startswith("seg-")]
    assert len(leftover) == 1


def test_lock_heartbeat_and_assert_held(spark, tmp_path):
    """A live holder can refresh the lock mtime mid-section; a holder
    whose lock was broken (token replaced) aborts before the manifest
    swap instead of clobbering the successor."""
    import os
    import time

    import pytest

    from data_catalog_spark.text_index import IndexLockError, SegmentedTextIndex

    idx = SegmentedTextIndex(spark, str(tmp_path / "ix"))
    lock = os.path.join(idx.path, ".INDEX_LOCK")
    with idx._mutation_lock() as lk:
        lk.assert_held()  # fresh lock is ours
        old = os.path.getmtime(lock)
        time.sleep(0.05)
        lk.heartbeat()
        assert os.path.getmtime(lock) >= old
        # simulate a waiter breaking the stale lock and reacquiring
        with open(lock, "w") as f:
            f.write("someone-else")
        with pytest.raises(IndexLockError):
            lk.assert_held()
        lk.heartbeat()  # must NOT touch the successor's lock
        with open(lock) as f:
            assert f.read() == "someone-else"
    # release must leave the successor's lock in place
    assert os.path.exists(lock)
    os.unlink(lock)


def test_pre_manifest_layout_raises_not_empty(spark, tmp_path):
    """seg-* dirs without MANIFEST.json (older on-disk layout or torn
    state) must surface, not read as an empty index whose next mutation
    sweeps the old segments away."""
    import os

    import pytest

    from data_catalog_spark.text_index import IndexCorruptError, SegmentedTextIndex

    path = str(tmp_path / "oldix")
    os.makedirs(os.path.join(path, "seg-000"))
    idx = SegmentedTextIndex(spark, path)
    with pytest.raises(IndexCorruptError):
        idx.postings()


def test_reader_racing_first_build_sees_empty_not_corrupt(spark, tmp_path):
    """Construction seeds an empty manifest, so stray seg dirs from an
    in-progress (or crashed) FIRST build read as an empty index — the
    corrupt guard is reserved for true pre-manifest legacy layouts."""
    import os

    from data_catalog_spark.text_index import SegmentedTextIndex

    idx = SegmentedTextIndex(spark, str(tmp_path / "ix"))
    os.makedirs(os.path.join(idx.path, "seg-inprogress"))
    assert idx.postings().count() == 0  # readable empty, no raise


def test_lock_ticker_keeps_live_holder_fresh(spark, tmp_path, monkeypatch):
    """A holder mid-way through one long job (no heartbeat() call sites)
    must never go stale: the daemon ticker refreshes the lock mtime."""
    import os
    import time

    from data_catalog_spark import text_index as ti

    monkeypatch.setattr(ti, "LOCK_STALE_AFTER", 0.4)
    idx = ti.SegmentedTextIndex(spark, str(tmp_path / "ix"))
    lock = os.path.join(idx.path, ".INDEX_LOCK")
    with idx._mutation_lock() as lk:
        time.sleep(1.2)  # 3x the stale threshold, no explicit heartbeat
        assert time.time() - os.path.getmtime(lock) < 0.4
        lk.assert_held()  # still ours
    assert not os.path.exists(lock)
