"""TF-IDF ranked retrieval."""

from __future__ import annotations

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import tfidf

from conftest import assert_same


def test_tfidf_parity(spark, sf_dir, ddb):
    assert_same(tfidf.tfidf_search_topk(spark, sf_dir), ddb, tfidf._tfidf_oracle())


def test_tfidf_topk_semantics(spark, sf_dir):
    rows = tfidf.tfidf_search_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= tfidf.TOP_K
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # top hit must actually contain at least one query term
    top_doc = rows[0].doc_id
    text = (
        read_table(spark, sf_dir, "documents")
        .where(f"doc_id = {top_doc}")
        .collect()[0]
        .text.lower()
    )
    assert any(t in text for t in tfidf.QUERY_TERMS)


def test_rarer_terms_weigh_more(spark, sf_dir):
    """IDF must order inversely to document frequency."""
    import math

    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    postings = tfidf.doc_postings(docs)
    dfs = {
        r.term: r.df
        for r in postings.where(postings.term.isin(tfidf.QUERY_TERMS))
        .groupBy("term")
        .count()
        .withColumnRenamed("count", "df")
        .collect()
    }
    assert len(dfs) >= 2
    idf = {t: math.log((n + 1) / (d + 1)) for t, d in dfs.items()}
    ordered = sorted(dfs, key=dfs.get)
    assert all(idf[a] >= idf[b] for a, b in zip(ordered, ordered[1:]))


def test_bm25_parity(spark, sf_dir, ddb):
    assert_same(tfidf.bm25_search_topk(spark, sf_dir), ddb, tfidf._bm25_oracle())


def test_bm25_semantics(spark, sf_dir):
    """BM25 invariants vs raw tf·idf: scores positive and ranked; tf
    SATURATES — a doc's per-term contribution is bounded by idf·(k1+1),
    so no score can exceed Σ_t idf(t)·(k1+1)."""
    import math

    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    rows = tfidf.bm25_search_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= tfidf.TOP_K
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    from pyspark.sql import functions as F

    postings = tfidf.doc_postings(docs)
    dfs = {
        r.term: r.df
        for r in postings.where(postings.term.isin(tfidf.QUERY_TERMS))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    }
    bound = sum(
        math.log(1 + (n - d + 0.5) / (d + 0.5)) * (tfidf.BM25_K1 + 1)
        for d in dfs.values()
    )
    assert all(s <= bound + 1e-6 for s in scores)


def test_hybrid_bm25_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import similarity as sim

    assert_same(
        sim.hybrid_search_rrf_bm25(spark, sf_dir), ddb, sim._hybrid_bm25_oracle()
    )


def test_top_bigrams_parity(spark, sf_dir, ddb):
    assert_same(
        tfidf.corpus_top_bigrams(spark, sf_dir), ddb, tfidf.TOP_BIGRAMS_ORACLE
    )


def test_bigram_df_bounded_by_occurrences(spark, sf_dir):
    for r in tfidf.corpus_top_bigrams(spark, sf_dir).collect():
        assert 1 <= r.n_docs <= r.n_occurrences


def test_keywords_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import tfidf as ti

    assert_same(ti.docs_tfidf_keywords(spark, sf_dir), ddb, ti.KEYWORDS_ORACLE)


def test_keywords_per_doc_shape(spark, sf_dir):
    from collections import Counter

    from data_catalog_spark.operators import tfidf as ti

    rows = ti.docs_tfidf_keywords(spark, sf_dir).collect()
    per_doc = Counter(r.doc_id for r in rows)
    assert all(n <= ti.KEYWORDS_PER_DOC for n in per_doc.values())
    for r in rows:
        assert 1 <= r.rank <= ti.KEYWORDS_PER_DOC
        assert r.tfidf >= 0.0


def test_cosine_pairs_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import tfidf as ti

    assert_same(
        ti.docs_tfidf_cosine_pairs(spark, sf_dir), ddb, ti._cosine_pairs_oracle()
    )


def test_cosine_pairs_agree_with_jaccard_dups(spark, sf_dir):
    """Planted near-dup pairs (n-gram Jaccard ground truth) must overlap
    heavily with high tf-idf cosine pairs — the two similarity signals see
    the same duplicates."""
    from data_catalog_spark.operators import dedup
    from data_catalog_spark.operators import tfidf as ti

    jac = {(r.da, r.db) for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()}
    cos = {(r.da, r.db) for r in ti.docs_tfidf_cosine_pairs(spark, sf_dir).collect()}
    assert jac and cos
    assert len(jac & cos) / len(jac) >= 0.9


# -- RAG passage retrieval ------------------------------------------------------


def test_rag_passage_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import tfidf as tf
    from conftest import assert_same

    assert_same(tf.rag_passage_topk(spark, sf_dir), ddb, tf._rag_oracle())


def test_rag_passages_tile_documents(spark, sf_dir):
    """Chunker invariants: every passage is a contiguous token window of
    its source doc at stride S; retrieved chunk indices are in range."""
    from pyspark.sql import functions as F

    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import tfidf as tf
    from data_catalog_spark.operators.text import SPARK_TOKENS

    toks = {
        r.doc_id: r.t
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(SPARK_TOKENS).alias("t"))
        .collect()
    }
    rows = tf.rag_passage_topk(spark, sf_dir).collect()
    assert rows
    # scores descend, and each (doc, chunk) points at a real window
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        t = toks[r.doc_id]
        start = r.chunk_idx * tf.PASSAGE_S
        assert 0 <= start < len(t)
        window = t[start : start + tf.PASSAGE_W]
        # the retrieved passage must contain at least one query term
        assert set(window) & set(tf.QUERY_TERMS)
