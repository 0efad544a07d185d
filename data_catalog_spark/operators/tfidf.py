"""TF-IDF ranked retrieval over the documents table.

The reference delegates relevance to ElasticSearch's TF/IDF (SURVEY §2.3:
its exact numerics are ES-internal and not required); this operator is the
Spark-first version of what ES does under the hood, with DEFINED,
engine-portable numerics so it is fully oracle-checkable:

    tf(t, d)  = occurrences of t in d
    idf(t)    = ln((N + 1) / (df(t) + 1))        (smoothed)
    score(q,d)= Σ_{t ∈ q∩d} tf(t,d) · idf(t)

Shape = the classic distributed inverted index, as dataframes:
postings (doc, term, tf) via explode+groupBy; df(t) from postings;
query terms broadcast-joined against postings; one agg per doc; top-k via
TakeOrderedAndProject.  At 100 TB the postings table is the materialized
artifact (bucketed by term); queries touch only their terms' postings —
the same access pattern an inverted index gives ES.

ln() on both engines is IEEE double `log` of an exactly-agreed rational
(counts are integers), so scores match to the comparison's 6dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .text import DUCK_TOKENS, SPARK_TOKENS

# 'dup' is rare in the synthetic corpus (df ≈ 5% of docs) — high idf;
# the others are common — the query exercises the weighting spread.
QUERY_TERMS = ["dup", "spark", "vector", "scan"]
TOP_K = 20


def doc_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — the inverted-index postings list."""
    return (
        docs.select("doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_scores(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, score): Σ tf·idf of QUERY_TERMS over ``docs`` — the ONE
    definition of the scoring pipeline (smoothed idf, 6dp rounding);
    ranked retrieval and the hybrid RRF fusion both consume it."""
    n_docs = docs.count()  # 1-scalar driver value, like any planner stat
    postings = doc_postings(docs)
    q = spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")
    matched = postings.join(F.broadcast(q), "term")
    df_t = matched.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    return (
        matched.join(F.broadcast(df_t), "term")
        .withColumn(
            "w",
            F.col("tf") * F.log((F.lit(n_docs) + 1) / (F.col("df") + 1)),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )


def tfidf_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents for QUERY_TERMS by Σ tf·idf, deterministic ties on
    doc_id."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        tfidf_scores(spark, docs)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(TOP_K)
    )


def _tfidf_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in QUERY_TERMS)
    return f"""
WITH postings AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM postings GROUP BY doc_id, term
), q(term) AS (VALUES {terms}),
matched AS (SELECT tf.* FROM tf JOIN q USING (term)),
df_t AS (SELECT term, count(DISTINCT doc_id) AS df FROM matched GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id,
       round(SUM(tf * ln((n_docs + 1) / (df + 1))), 6) AS score
FROM matched JOIN df_t USING (term) CROSS JOIN n
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {TOP_K}
"""


# -- corpus n-gram stats -----------------------------------------------------

NGRAM_TOP_K = 25


def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k bigrams corpus-wide with document frequency — the corpus
    analysis pass feeding vocabulary/stopword decisions.  explode + one
    agg + TakeOrderedAndProject; no driver-side text."""
    docs = read_table(spark, sf_dir, "documents")
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty array
    bigram_arr = (
        f"CASE WHEN size({SPARK_TOKENS}) >= 2 THEN "
        f"transform(sequence(1, size({SPARK_TOKENS}) - 1), "
        f"i -> concat(element_at({SPARK_TOKENS}, i), ' ', "
        f"element_at({SPARK_TOKENS}, i + 1))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    bigrams = docs.select("doc_id", F.explode(F.expr(bigram_arr)).alias("bigram"))
    return (
        bigrams.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram"))
        .limit(NGRAM_TOP_K)
    )


TOP_BIGRAMS_ORACLE = f"""
WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
b AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM b GROUP BY bigram
ORDER BY n_occurrences DESC, bigram
LIMIT {NGRAM_TOP_K}
"""


register("tfidf_search_topk", tfidf_search_topk, _tfidf_oracle())
register("corpus_top_bigrams", corpus_top_bigrams, TOP_BIGRAMS_ORACLE)


# -- BM25 ranked retrieval ---------------------------------------------------
#
# The ranking the reference's ES lineage converged to (ES 5+ default,
# Lucene's Okapi BM25 with k1=1.2, b=0.75):
#
#   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))       (always > 0)
#   score(q,d) = Σ idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
#
# vs tf·idf above, tf saturates (a 50-occurrence doc isn't 50× better) and
# long documents are normalized by length.  Same postings shape — the only
# extra input is the doc-length table and the corpus stats (N, avgdl),
# which at 100 TB are planner-style scalars refreshed with the postings.

BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_weight_sql(n_docs: str, total_tokens: str) -> str:
    """One BM25 term weight as engine-portable SQL (identical text runs on
    Spark and DuckDB; every constant is CAST to DOUBLE so neither engine's
    decimal-literal rules enter the arithmetic).  Expects columns
    ``df`` (term document frequency), ``tf``, ``dl`` (doc token count) in
    scope; ``n_docs``/``total_tokens`` are rendered expressions (literals
    on the Spark side, CTE columns in the oracle)."""
    k1 = f"CAST({BM25_K1!r} AS DOUBLE)"
    k1p1 = f"CAST({BM25_K1 + 1!r} AS DOUBLE)"
    b = f"CAST({BM25_B!r} AS DOUBLE)"
    avgdl = f"(CAST({total_tokens} AS DOUBLE) / {n_docs})"
    idf = (
        f"ln(CAST(1.0 AS DOUBLE) + (CAST({n_docs} AS DOUBLE) - df "
        f"+ CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))"
    )
    return (
        f"{idf} * (tf * {k1p1}) / "
        f"(tf + {k1} * (CAST(1.0 AS DOUBLE) - {b} + {b} * dl / {avgdl}))"
    )


def bm25_scores(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, score): BM25 of QUERY_TERMS over ``docs`` — same postings
    pipeline as tfidf_scores plus the doc-length join; N and total token
    count are driver scalars (planner stats), embedded as literals so the
    weight expression is identical text on both engines."""
    # ONE scalar job for both planner stats (count ≡ rows of dl_df since
    # size() is never null): the split form paid an extra driver-blocking
    # job + an extra pass per invocation, and this fn-phase cost rides
    # every BM25 consumer (bm25_search_topk, rag_passage_topk,
    # hybrid_search_rrf_bm25).
    dl_df = docs.select("doc_id", F.size(F.expr(SPARK_TOKENS)).alias("dl"))
    stats = dl_df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tt")
    ).first()
    n_docs, total_tokens = stats.n, stats.tt
    postings = doc_postings(docs)
    q = spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")
    matched = postings.join(F.broadcast(q), "term")
    df_t = matched.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    w = _bm25_weight_sql(str(n_docs), str(total_tokens))
    return (
        matched.join(F.broadcast(df_t), "term")
        .join(dl_df, "doc_id")
        .withColumn("w", F.expr(w))
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )


def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents for QUERY_TERMS by BM25, deterministic ties on
    doc_id."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        bm25_scores(spark, docs)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(TOP_K)
    )


def _bm25_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in QUERY_TERMS)
    w = _bm25_weight_sql("n_docs", "total_tokens")
    return f"""
WITH postings AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM postings GROUP BY doc_id, term
), q(term) AS (VALUES {terms}),
matched AS (SELECT tf.* FROM tf JOIN q USING (term)),
df_t AS (SELECT term, count(DISTINCT doc_id) AS df FROM matched GROUP BY term),
dl AS (SELECT doc_id, len({DUCK_TOKENS}) AS dl FROM documents),
n AS (SELECT count(*) AS n_docs, (SELECT SUM(dl) FROM dl) AS total_tokens
      FROM documents)
SELECT doc_id, round(SUM({w}), 6) AS score
FROM matched JOIN df_t USING (term) JOIN dl USING (doc_id) CROSS JOIN n
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {TOP_K}
"""


register("bm25_search_topk", bm25_search_topk, _bm25_oracle())


# -- subword vocabulary build + coverage -------------------------------------

# Small enough that the synthetic corpus (~60 distinct words) has genuine
# OOV mass — coverage below 100% is what makes the operator's math visible.
VOCAB_SIZE = 32


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a top-``VOCAB_SIZE`` subword vocabulary (BPE-ish pretokens, by
    corpus frequency, ties broken by token text) and report per-language
    coverage: total subword tokens, OOV tokens, OOV rate.

    The tokenizer-training shape every LLM data pipeline runs: phase 1 is a
    corpus-frequency aggregate + top-k (map-side combined, one shuffle on
    token); phase 2 broadcasts the tiny vocab back over the token stream —
    no second wide shuffle.  Determinism: (freq DESC, token ASC) makes the
    vocabulary unique, so coverage is reproducible at any parallelism."""
    from .text import BPE_PATTERN

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.expr(f'regexp_extract_all(text, "{BPE_PATTERN}", 0)')
        ).alias("token"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(VOCAB_SIZE)
        .select("token")
    )
    return (
        toks.join(F.broadcast(vocab).withColumn("in_vocab", F.lit(1)), "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_subwords"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.round(F.col("n_oov") / F.col("n_subwords"), 6)
        )
        .orderBy("lang")
    )


def _vocab_oracle() -> str:
    from .text import _BPE_SQL

    return f"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(text, '{_BPE_SQL}')) AS token
  FROM documents
), vocab AS (
  SELECT token FROM toks GROUP BY token
  ORDER BY count(*) DESC, token LIMIT {VOCAB_SIZE}
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_subwords,
       CAST(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS oov_rate
FROM toks LEFT JOIN vocab USING (token)
GROUP BY lang ORDER BY lang
"""


register("vocab_coverage", vocab_coverage, _vocab_oracle())


# -- per-document keyword extraction ------------------------------------------

KEYWORDS_PER_DOC = 3


def docs_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf·idf — document tagging,
    the inverse access pattern of ranked retrieval (all terms of one doc
    instead of one term across all docs).

    Same postings + df tables as the search path; the per-doc top-k is a
    row_number window PARTITIONED by doc_id (never global), keyed ordering
    (w desc, term) so the tag set is deterministic.  At 100 TB the df table
    is |vocab|-sized (broadcastable); postings shuffle once on doc_id for
    the window."""
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    postings = doc_postings(docs)
    df_t = postings.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("w").desc(), F.col("term")
    )
    return (
        postings.join(F.broadcast(df_t), "term")
        .withColumn(
            "w",
            F.round(
                F.col("tf") * F.log((F.lit(n_docs) + 1) / (F.col("df") + 1)), 6
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KEYWORDS_PER_DOC)
        .select(
            "doc_id", "term", F.col("w").alias("tfidf"), F.col("rank").cast("int").alias("rank")
        )
        .orderBy("doc_id", "rank")
    )


KEYWORDS_ORACLE = f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
postings AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2
),
df_t AS (SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * ln((n_docs + 1) / (df + 1)), 6) AS tfidf
  FROM postings JOIN df_t USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= {KEYWORDS_PER_DOC}
ORDER BY doc_id, rank
"""


register("docs_tfidf_keywords", docs_tfidf_keywords, KEYWORDS_ORACLE)


# -- sparse tf-idf cosine document pairs --------------------------------------

COSINE_PAIR_THRESHOLD = 0.5


def docs_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with BIGRAM tf·idf cosine ≥ threshold — the SPARSE
    similarity twin of the dense embedding pairs: similarity comes from the
    postings self-join (docs only meet on shared terms; no O(n²) scan).

    Terms are word BIGRAMS, not unigrams: on a shared-vocabulary corpus a
    bag-of-words cosine saturates (every doc contains every word; measured
    dup-pair mean 0.70 vs background 0.59 — no separation), while the
    order-sensitive bigram space separates cleanly (dup pairs ≥ 0.85,
    background ≤ 0.31 here).  Scale shape: join keyed on bigram; df=1
    terms can't pair and are dropped before the join.  The honest scale
    caveat: when the term space SATURATES (this synthetic corpus at sf0.1:
    ~930 bigrams, median df = 285/5000), Σdf² blows up and ALL sparse
    all-pairs joins degrade — measured here, a 10%-df prefix filter makes
    it WORSE (10M candidates) because the cap sits above the median.  The
    production answer for saturated spaces is not a smarter cosine join
    but a different operator class: MinHash/LSH banding (dedup.py), whose
    cost is O(n·k) regardless of df.  This operator is the exact tool for
    the long-tailed term spaces real corpora have.  Per-term products
    truncate to DECIMAL before the pair-sum so the dot product is
    associative-order-independent and engine-portable."""
    from .langmodel import _doc_bigrams

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # bigram construction is owned by langmodel._doc_bigrams — one
    # definition serves the LM and this operator (no drift)
    postings = (
        _doc_bigrams(docs)
        .select("doc_id", F.concat_ws(" ", "w1", "w2").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = (
        postings.join(F.broadcast(df_t), "term")
        .where(F.col("df") > 1)
        .select(
            "term",
            "doc_id",
            (F.col("tf") * F.log((F.lit(n_docs) + 1) / (F.col("df") + 1))).alias("w"),
        )
        .localCheckpoint(eager=False)  # feeds norms AND both join sides
    )
    # NOTE: norms use the PRUNED vectors (df>1) on both engines — the
    # definition is cosine in the pruned space, consistently.
    norms = weighted.groupBy("doc_id").agg(
        F.sqrt(F.sum((F.col("w") * F.col("w")).cast("decimal(28,12)")).cast("double")).alias("nrm")
    )
    a = weighted.alias("a")
    b = weighted.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.sum((F.col("a.w") * F.col("b.w")).cast("decimal(28,12)")).cast("double").alias("dot"))
    )
    na = norms.alias("na")
    nb = norms.alias("nb")
    cos = F.round(F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm")), 6)
    return (
        dots.join(na, F.col("da") == F.col("na.doc_id"))
        .join(nb, F.col("db") == F.col("nb.doc_id"))
        .select("da", "db", cos.alias("cos"))
        .where(F.col("cos") >= COSINE_PAIR_THRESHOLD)
        .orderBy("da", "db")
    )


def _cosine_pairs_oracle() -> str:
    from .langmodel import DUCK_BIGRAMS_BODY

    return f"""
WITH {DUCK_BIGRAMS_BODY},
postings AS (
  SELECT doc_id, w1 || ' ' || w2 AS term, CAST(count(*) AS BIGINT) AS tf
  FROM bg GROUP BY 1, 2
),
n AS (SELECT count(*) AS n_docs FROM documents),
df_t AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
weighted AS (
  SELECT term, doc_id, tf * ln((n_docs + 1) / (df + 1)) AS w
  FROM postings JOIN df_t USING (term) CROSS JOIN n
  WHERE df > 1
),
norms AS (
  SELECT doc_id,
         sqrt(CAST(sum(CAST(w * w AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
  FROM weighted GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(sum(CAST(a.w * b.w AS DECIMAL(28,12))) AS DOUBLE) AS dot
  FROM weighted a JOIN weighted b
    ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da, db, round(dot / (na.nrm * nb.nrm), 6) AS cos
FROM dots JOIN norms na ON da = na.doc_id JOIN norms nb ON db = nb.doc_id
WHERE round(dot / (na.nrm * nb.nrm), 6) >= {COSINE_PAIR_THRESHOLD}
ORDER BY da, db
"""


register("docs_tfidf_cosine_pairs", docs_tfidf_cosine_pairs, _cosine_pairs_oracle())


# -- RAG passage retrieval (chunk ∘ BM25) --------------------------------------
#
# The retrieval-augmented-generation indexing shape: documents are split
# into overlapping fixed-token-window PASSAGES (what actually goes in a
# context window), and ranked retrieval runs over passages, not whole
# docs.  Pure composition: the chunker is the traindata token-window
# shape, the ranker is bm25_scores reused VERBATIM over the passage frame
# (passage surrogate key = doc_id·PASSAGE_KEY_BASE + chunk_idx, split
# back on output).  One extra explode vs doc-level BM25; everything else
# identical, which is the point — passages are just a smaller document.

PASSAGE_W = 32  # window tokens
PASSAGE_S = 24  # stride (8-token overlap)
# Surrogate-key radix: pid = doc_id · BASE + chunk_idx.  At 1e9 the key
# overflows signed BIGINT only past ~9.2e9 documents, and the chunk field
# only past a 24-BILLION-token single document — both beyond any real
# corpus, unlike the 100k radix this started with (whose chunk field a
# ~10 MB document could genuinely overflow into the next doc's key
# space).  Decode uses integer DIV/%, exact at any magnitude.
PASSAGE_KEY_BASE = 1_000_000_000


def _passages(docs: DataFrame) -> DataFrame:
    """(doc_id = surrogate pid, text = chunk text): overlapping token
    windows; the final short tail window is kept (BM25's length
    normalization handles it).  Deliberately NOT shared with
    traindata.docs_chunk_tokens (CHUNK=16/STRIDE=12, start-token output):
    that chunker's formulation is pinned by its own committed oracle —
    cross-reference instead of a helper whose change would ripple into
    both.  The empty-doc filter is a cheap rlike on lower(text) —
    EXACTLY "size(tokens) > 0" for the [^a-z0-9]+ tokenizer, since a
    token exists iff lower(text) contains an ASCII alnum — so the regex
    split is not evaluated a second time inside a Filter.  Matching on
    lower() (not `(?i)` on raw text) matters on non-ASCII corpora:
    Java's (?i) folds ASCII only, while lower() maps e.g. the Kelvin
    sign U+212A to 'k', which DOES tokenize."""
    chunks = (
        f"transform(sequence(1, size(t), {PASSAGE_S}), "
        f"s -> struct(CAST((s - 1) DIV {PASSAGE_S} AS BIGINT) AS idx, "
        f"array_join(slice(t, s, {PASSAGE_W}), ' ') AS chunk))"
    )
    return (
        docs.where(F.lower(F.col("text")).rlike("[a-z0-9]"))
        .withColumn("t", F.expr(SPARK_TOKENS))
        .select("doc_id", F.explode(F.expr(chunks)).alias("c"))
        .select(
            (F.col("doc_id") * PASSAGE_KEY_BASE + F.col("c.idx")).alias("doc_id"),
            F.col("c.chunk").alias("text"),
        )
    )


def rag_passage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k PASSAGES for QUERY_TERMS by BM25 over the chunked corpus:
    (doc_id, chunk_idx, score), ties broken by passage key.  The passage
    frame is materialized behind a lazy localCheckpoint — bm25_scores
    reads it four ways (count, length sum, postings, dl join), and
    without the barrier each pass re-runs the tokenize+window explode
    (dsir.py's multi-consumer rule)."""
    docs = read_table(spark, sf_dir, "documents")
    scored = bm25_scores(spark, _passages(docs).localCheckpoint(eager=False))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(TOP_K)
        .select(
            F.expr(f"CAST(doc_id DIV {PASSAGE_KEY_BASE} AS BIGINT)").alias(
                "doc_id"
            ),
            (F.col("doc_id") % PASSAGE_KEY_BASE).cast("int").alias("chunk_idx"),
            "score",
        )
    )


def _rag_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in QUERY_TERMS)
    w = _bm25_weight_sql("n_docs", "total_tokens")
    return f"""
WITH base AS (
  SELECT doc_id, {DUCK_TOKENS} AS t FROM documents
), p AS (
  SELECT doc_id * {PASSAGE_KEY_BASE} + (s - 1) // {PASSAGE_S} AS doc_id,
         array_to_string(t[s : s + {PASSAGE_W} - 1], ' ') AS text
  FROM base, LATERAL unnest(range(1, len(t) + 1, {PASSAGE_S})) AS r(s)
  WHERE len(t) > 0
), postings AS (
  SELECT doc_id, unnest({DUCK_TOKENS}) AS term FROM p
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM postings GROUP BY doc_id, term
), q(term) AS (VALUES {terms}),
matched AS (SELECT tf.* FROM tf JOIN q USING (term)),
df_t AS (SELECT term, count(DISTINCT doc_id) AS df FROM matched GROUP BY term),
dl AS (SELECT doc_id, len({DUCK_TOKENS}) AS dl FROM p),
n AS (SELECT count(*) AS n_docs, (SELECT SUM(dl) FROM dl) AS total_tokens
      FROM p),
top AS (
  SELECT doc_id, round(SUM({w}), 6) AS score
  FROM matched JOIN df_t USING (term) JOIN dl USING (doc_id) CROSS JOIN n
  GROUP BY doc_id
  ORDER BY score DESC, doc_id
  LIMIT {TOP_K}
)
SELECT CAST(doc_id // {PASSAGE_KEY_BASE} AS BIGINT) AS doc_id,
       CAST(doc_id % {PASSAGE_KEY_BASE} AS INTEGER) AS chunk_idx,
       score
FROM top
"""


register("rag_passage_topk", rag_passage_topk, _rag_oracle())
