"""Training-corpus prep operators: oracle parity + invariants + the
broadcast-shape assertion that pins the decontamination scale design."""

from __future__ import annotations

import pytest

from data_catalog_spark.operators import traindata as td

from conftest import assert_same

PARITY = [
    ("docs_chunk_tokens", td.CHUNK_ORACLE),
    ("docs_train_split", td.SPLIT_ORACLE),
    ("docs_intra_dedup", td.INTRA_DEDUP_ORACLE),
    ("docs_decontaminate", td.DECONTAMINATE_ORACLE),
]


@pytest.mark.parametrize("name,oracle", PARITY, ids=[n for n, _ in PARITY])
def test_parity(spark, sf_dir, ddb, name, oracle):
    assert_same(getattr(td, name)(spark, sf_dir), ddb, oracle)


def test_chunk_coverage(spark, sf_dir):
    """Chunks tile every document: per doc, chunk token counts sum to
    n_tokens + overlap·(n_chunks−1), and every chunk except possibly the
    last is full-width."""
    rows = td.docs_chunk_tokens(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        # Reconstruct n_tokens from the final chunk, then every chunk must
        # hold exactly min(CHUNK, n_tokens - STRIDE·k) tokens — i.e. the
        # windows tile the doc with no token skipped or duplicated beyond
        # the declared overlap.
        n_tokens = (len(chunks) - 1) * td.STRIDE + chunks[-1].chunk_tokens
        for k, c in enumerate(chunks):
            assert c.chunk_tokens == min(td.CHUNK, n_tokens - td.STRIDE * k)
            assert len(c.chunk_text.split(" ")) == c.chunk_tokens


def test_split_is_deterministic_and_complete(spark, sf_dir):
    a = td.docs_train_split(spark, sf_dir).collect()
    b = td.docs_train_split(spark, sf_dir).collect()
    assert a == b
    frac = sum(1 for r in a if r.split == "train") / len(a)
    assert 0.7 < frac < 0.9  # 80% ± sampling noise at small N


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    plan = (
        td.docs_decontaminate(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_benchmark_docs_flag_themselves_if_included(spark, sf_dir):
    """Sanity: every flagged doc is a non-benchmark doc with ≥1 hit."""
    rows = td.docs_decontaminate(spark, sf_dir).collect()
    assert all(r.doc_id % 50 != 0 and r.n_hits >= 1 for r in rows)


def test_split_scan_prunes_text_column(spark, sf_dir):
    """docs_train_split needs only doc_id+lang — the parquet scan must NOT
    read the (dominant) text column."""
    from data_catalog_spark.operators.traindata import docs_train_split

    plan = (
        docs_train_split(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema


def test_pack_shards_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import traindata as td

    assert_same(td.docs_pack_shards(spark, sf_dir), ddb, td._pack_oracle())


def test_pack_shards_greedy_invariants(spark, sf_dir):
    """Shards are contiguous in doc order, offsets are the exact running
    sum, and every shard's preceding-offset span stays within one budget."""
    from data_catalog_spark.operators import traindata as td

    rows = td.docs_pack_shards(spark, sf_dir).collect()
    running = 0
    prev_shard = 0
    for r in rows:
        assert r.offset_tokens == running
        assert r.shard == running // td.SHARD_TOKEN_BUDGET
        assert r.shard >= prev_shard  # monotone shard ids in doc order
        prev_shard = r.shard
        running += r.n_tokens


def test_pack_shards_no_single_partition_window(spark, sf_dir):
    """The scale property itself: no WindowExec with an empty partition
    spec over the DOCUMENT-scale frame (the bucket-offset window runs on
    the tiny aggregated frame only, which is the design)."""
    from data_catalog_spark.operators import traindata as td

    import re

    plan = td.docs_pack_shards(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    windows = re.findall(r"Window \[.*?\]", plan)
    doc_scale = [w for w in windows if "n_tokens" in w and "bucket" not in w]
    assert not doc_scale, f"doc-scale global window found: {doc_scale}"


def test_split_leakage_audit_counts_and_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import traindata
    from data_catalog_spark.operators.dedup import dedup_ngram_jaccard

    df = traindata.split_leakage_audit(spark, sf_dir)
    rows = df.collect()
    assert rows, "the synthetic corpus has near-dup pairs"
    total = sum(r.n_pairs for r in rows)
    assert total == dedup_ngram_jaccard(spark, sf_dir).count()
    for r in rows:
        assert 0 <= r.n_leaking <= r.n_pairs
        if r.split_a == r.split_b:
            assert r.n_leaking == 0
        else:
            assert r.n_leaking == r.n_pairs
    assert_same(df, ddb, traindata._leakage_oracle())


def test_contamination_report_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import traindata

    assert_same(
        traindata.benchmark_contamination_report(spark, sf_dir),
        ddb,
        traindata.CONTAMINATION_ORACLE.format(
            values=traindata._eval_values_sql()
        ),
    )


def test_contamination_report_fixture_and_verdicts(spark, sf_dir):
    """The frozen eval fixture is part of the contract (editing it
    silently changes every report), and the mixed design must exercise
    both verdicts: in-vocabulary items collide with the synthetic corpus,
    out-of-vocabulary items come back clean with rate 0."""
    import hashlib

    from data_catalog_spark.operators import traindata

    fixture = "|".join(f"{i}:{t}" for i, t in traindata.EVAL_SET)
    assert (
        hashlib.md5(fixture.encode()).hexdigest()
        == "464331139141fd5877d51383e12cf75b"
    ), "EVAL_SET changed — the contamination report is no longer comparable"
    rows = {
        r.item_id: r
        for r in traindata.benchmark_contamination_report(spark, sf_dir).collect()
    }
    assert set(rows) == {i for i, _ in traindata.EVAL_SET}
    # item 5 is fully out-of-vocabulary: must be clean at any SF
    assert rows[5].dirty is False and rows[5].contamination_rate == 0.0
    assert rows[5].n_docs_hit == 0
    # at least one in-vocab item must collide (else the report tests nothing)
    assert any(r.dirty for r in rows.values())
    for r in rows.values():
        assert 0.0 <= r.contamination_rate <= 1.0
        assert r.n_dirty_grams <= r.n_grams
        assert (r.n_dirty_grams > 0) == r.dirty == (r.n_docs_hit > 0)


def test_contamination_report_broadcasts_the_eval_side(spark, sf_dir):
    """Scale shape: the corpus gram stream must join against a BROADCAST
    eval-gram set — a shuffled corpus-gram exchange is the plan that dies
    at 100 TB (grams ≈ 8× corpus bytes)."""
    from data_catalog_spark.operators import traindata

    plan = (
        traindata.benchmark_contamination_report(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
