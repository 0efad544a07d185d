"""BPE merge training (operators/bpe.py)."""

from __future__ import annotations


def test_bpe_oracle_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import bpe

    assert_same(bpe.bpe_train_merges(spark, sf_dir), ddb, bpe.BPE_ORACLE)


def test_bpe_merge_table_shape(spark, sf_dir):
    from data_catalog_spark.operators import bpe

    rows = bpe.bpe_train_merges(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == bpe.N_MERGES  # sf0.001 corpus has plenty of pairs
    # merges are distinct pairs; merged symbol is the concatenation
    pairs = [(r.first, r.second) for r in rows]
    assert len(set(pairs)) == len(pairs)
    for r in rows:
        assert r.merged == r.first + r.second
        assert r.cnt > 0
    # counts are non-increasing only within equal-state rounds is NOT
    # guaranteed by BPE (a merge can create a more frequent pair), but the
    # first merge must be the globally most frequent pair — spot-check it
    # is at least as frequent as the second.
    if len(rows) >= 2:
        assert rows[0].cnt >= rows[1].cnt or (
            rows[1].first + rows[1].second
        ).find(rows[0].merged) >= 0


def test_framed_replace_reproduces_greedy_bpe_tiling(spark):
    """The '__'-framed replace must tile greedily left-to-right without
    overlap: 'a a a' -> 'aa a', 'a b a b' -> 'ab ab'."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("__a__a__a__",), ("__a__b__a__b__",), ("__a__",)], ["w"]
    )
    got = {
        r.w: (r.m_aa, r.m_ab)
        for r in df.select(
            "w",
            F.expr("replace(w, '_a__a_', '_aa_')").alias("m_aa"),
            F.expr("replace(w, '_a__b_', '_ab_')").alias("m_ab"),
        ).collect()
    }
    assert got["__a__a__a__"][0] == "__aa__a__"
    assert got["__a__b__a__b__"][1] == "__ab__ab__"
    assert got["__a__"] == ("__a__", "__a__")


def test_bpe_merges_apply_like_reference_bpe(spark, sf_dir):
    """Replay the learned merge list over a few vocab words in pure python
    (the textbook merge procedure) and verify the engine's framed-string
    states would produce the same final segmentation."""
    from pyspark.sql import functions as F
    from data_catalog_spark.operators import bpe

    merges = [
        (r.first, r.second)
        for r in bpe.bpe_train_merges(spark, sf_dir).collect()
    ]
    words = [
        r.word
        for r in bpe._vocab(spark, sf_dir).orderBy(
            F.col("cnt").desc(), "word"
        ).limit(10).collect()
    ]

    def apply_merges(word: str) -> list[str]:
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    # engine-side: apply the same framed replaces
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    df = df.select(
        "word",
        F.concat(
            F.lit("__"), F.expr("regexp_replace(word, '(.)', '$1__')")
        ).alias("w"),
    )
    for a, b in merges:
        df = df.withColumn("w", F.expr(f"replace(w, '_{a}__{b}_', '_{a}{b}_')"))
    got = {
        r.word: [s for s in r.w.split("_") if s] for r in df.collect()
    }
    for w in words:
        assert got[w] == apply_merges(w), w


def test_bpe_encode_corpus_parity_and_compression(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import bpe

    df = bpe.bpe_encode_corpus(spark, sf_dir)
    rows = df.collect()
    assert rows, "per-source stats must be non-empty"
    for r in rows:
        # merges only ever fuse adjacent symbols: 1 <= subwords/word <= chars
        assert r.n_subwords >= r.n_words
        assert r.avg_per_word >= 1.0
    # the learned merges must compress vs character-level segmentation
    total_sub = sum(r.n_subwords for r in rows)
    from pyspark.sql import functions as F
    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators.text import SPARK_TOKENS

    total_chars = (
        read_table(spark, sf_dir, "documents")
        .select(
            F.expr(
                f"aggregate({SPARK_TOKENS}, 0L, (a, x) -> a + length(x))"
            ).alias("c")
        )
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert total_sub < total_chars
    assert_same(df, ddb, bpe.BPE_ENCODE_ORACLE)


def test_tokenizer_fertility_parity_and_bounds(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import bpe

    df = bpe.tokenizer_fertility(spark, sf_dir)
    rows = df.collect()
    assert rows, "per-(source, lang) cells must be non-empty"
    assert len({(r.source, r.lang) for r in rows}) == len(rows)
    for r in rows:
        assert r.fertility >= 1.0  # merges only fuse; never below 1 piece
        assert r.n_subwords >= r.n_words
        assert 0.0 <= r.oov_rate <= 1.0
        # bytes/token ∈ (0, max-word-bytes]; with fertility>1 it sits near
        # the per-piece average — just pin positivity + a sane ceiling
        assert 0.0 < r.bytes_per_token <= 64.0
    assert_same(df, ddb, bpe._fertility_oracle())


def test_tokenizer_fertility_consistent_with_encode_corpus(spark, sf_dir):
    """Marginalizing the per-(source, lang) cells over lang must reproduce
    bpe_encode_corpus's per-source totals — same merges, same stream."""
    from collections import defaultdict

    from data_catalog_spark.operators import bpe

    cells = bpe.tokenizer_fertility(spark, sf_dir).collect()
    per_source = defaultdict(lambda: [0, 0])
    for r in cells:
        per_source[r.source][0] += r.n_words
        per_source[r.source][1] += r.n_subwords
    for e in bpe.bpe_encode_corpus(spark, sf_dir).collect():
        assert per_source[e.source][0] == e.n_words
        assert per_source[e.source][1] == e.n_subwords
