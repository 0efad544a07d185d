"""Bloom-filter benchmark decontamination — the sketch-based scale path
for ``docs_decontaminate`` (traindata.py).

The join-based decontaminator broadcasts the benchmark's DISTINCT 8-gram
strings; at a real eval suite (millions of grams × ~60 bytes each) that
broadcast is hundreds of MB per executor.  The production alternative
every crawl pipeline ships is a Bloom filter: hash each benchmark gram
into K bit positions of an M-bit array, OR the bits together, and probe
corpus grams against the 8 KiB array instead of the gram set — no false
negatives, a bounded false-positive rate (~(1-e^{-kn/m})^k), and a
membership structure whose size is INDEPENDENT of the benchmark's text.

Spark-first construction, fully distributed:
- build: explode benchmark grams → K md5-derived bit positions →
  ``groupBy(word) . agg(bit_or(mask))`` — the bit array is built by a
  map-side-combinable aggregation (each executor ORs its partition's
  bits; the shuffle moves ≤ M/32 rows), never on the driver.
- probe: DISTINCT (doc, gram) pairs → the same K positions →
  broadcast-join the ≤ M/32-row bloom table on the word index → a gram
  is a member iff ALL K probed bits are set (count of passing probe rows
  == K; duplicate positions self-consistently count twice on both
  sides).  The pre-probe distinct is load-bearing: probing per gram
  OCCURRENCE would make a twice-repeated member gram count 2K ≠ K rows
  (a false negative) and let a thrice-repeated non-member with one set
  bit count K (a false positive).  It also bounds probe volume by the
  doc's UNIQUE gram count.
- the report joins the EXACT matcher's result back on (per doc) so the
  row also states the realized false-positive count: at 100 TB the same
  query is the monitor that says when M needs to grow.

Hashing is the repo's portable md5 scheme (Spark ``conv(hex,16,10)`` ≡
DuckDB ``('0x'||hex)::BIGINT``) over three disjoint md5 substrings, so
both engines build bit-identical filters; masks use 32-bit words inside
BIGINTs so ``1 << bit`` never touches the sign bit on either engine.

No reference counterpart (north-star extension; SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .traindata import NGRAM, _docs, _grams

BLOOM_M_BITS = 1 << 16  # filter size: 65536 bits = 8 KiB
BLOOM_WORD_BITS = 32  # bits packed per BIGINT word (sign-safe shifts)
BLOOM_K = 3  # hash functions: disjoint md5 hex slices

# md5 hex-slice offsets for the K hash functions (1-based, 8 hex chars
# = 32 bits each; md5 has 32 hex chars so 3 disjoint slices fit)
_HASH_OFFSETS = (1, 9, 17)


def _spark_positions(col: str) -> str:
    """Array of the K bit positions for a gram column (Spark SQL)."""
    parts = ", ".join(
        f"cast(conv(substring(md5({col}), {off}, 8), 16, 10) as bigint)"
        f" % {BLOOM_M_BITS}"
        for off in _HASH_OFFSETS
    )
    return f"array({parts})"


def _duck_positions(col: str) -> list[str]:
    return [
        f"('0x' || substr(md5({col}), {off}, 8))::BIGINT % {BLOOM_M_BITS}"
        for off in _HASH_OFFSETS
    ]


def _word_mask(df: DataFrame) -> DataFrame:
    """(…, p) → (…, word, mask): 32-bit-word index + bit mask."""
    return df.select(
        *[c for c in df.columns if c != "p"],
        (F.col("p") / BLOOM_WORD_BITS).cast("bigint").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD_BITS} AS INT))"
        ).alias("mask"),
    )


def docs_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per contaminated-or-flagged document: Bloom-positive gram count,
    exact-match gram count, and the realized false-positive count
    (``n_bloom_hits − n_exact_hits``; ≥ 0 always — Bloom filters have no
    false negatives, which the pytest pins).  Benchmark set = docs with
    ``doc_id % 50 == 0``, as in ``docs_decontaminate``."""
    tok = (
        _docs(spark, sf_dir)
        .withColumn("t", F.split("text", " "))
        .where(F.size("t") >= NGRAM)
    )
    bench = tok.where(F.col("doc_id") % 50 == 0)
    corpus = tok.where(F.col("doc_id") % 50 != 0)

    bench_grams = _grams(bench).select("gram").distinct()
    bloom = _word_mask(
        bench_grams.select(
            F.explode(F.expr(_spark_positions("gram"))).alias("p")
        )
    ).groupBy("word").agg(F.expr("bit_or(mask)").alias("bf"))

    # distinct BEFORE probing — see module docstring (correctness of the
    # all-K-bits count under repeated grams, and probe-volume bound)
    corp_grams = _grams(corpus).distinct()
    probes = _word_mask(
        corp_grams.select(
            "doc_id",
            "gram",
            F.explode(F.expr(_spark_positions("gram"))).alias("p"),
        )
    )
    # inner join: a word index absent from the bloom table has no bits
    # set, so its probe row must drop — exactly what the inner join does
    members = (
        probes.join(F.broadcast(bloom), "word")
        .where(F.expr("(mask & bf) != 0"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("k_set"))
        .where(F.col("k_set") == BLOOM_K)
    )
    bloom_hits = members.groupBy("doc_id").agg(
        F.count_distinct("gram").alias("n_bloom_hits")
    )
    exact_hits = (
        corp_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_exact_hits"))
    )
    return (
        bloom_hits.join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_bloom_hits",
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (
                F.col("n_bloom_hits")
                - F.coalesce("n_exact_hits", F.lit(0))
            ).alias("n_false_pos"),
        )
        .orderBy("doc_id")
    )


def _bloom_oracle() -> str:
    bpos = "\n  UNION ALL\n  ".join(
        f"SELECT {p} AS p FROM bg" for p in _duck_positions("gram")
    )
    ppos = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, gram, {p} AS p FROM cg"
        for p in _duck_positions("gram")
    )
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
             WHERE len(string_split(text, ' ')) >= {NGRAM}),
g AS (SELECT doc_id, array_to_string(t[u.i + 1 : u.i + {NGRAM}], ' ') AS gram
      FROM tok, unnest(generate_series(0, len(t) - {NGRAM})) AS u(i)),
bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
cg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 50 <> 0),
bpos AS (
  {bpos}),
bloom AS (SELECT p // {BLOOM_WORD_BITS} AS word,
                 bit_or(1::BIGINT << CAST(p % {BLOOM_WORD_BITS} AS INTEGER)) AS bf
          FROM bpos GROUP BY 1),
ppos AS (
  {ppos}),
members AS (
  SELECT doc_id, gram
  FROM ppos JOIN bloom ON ppos.p // {BLOOM_WORD_BITS} = bloom.word
  WHERE ((1::BIGINT << CAST(p % {BLOOM_WORD_BITS} AS INTEGER)) & bf) != 0
  GROUP BY doc_id, gram
  HAVING count(*) = {BLOOM_K}),
bh AS (SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_bloom_hits
       FROM members GROUP BY doc_id),
eh AS (SELECT doc_id, CAST(count(DISTINCT gram) AS BIGINT) AS n_exact_hits
       FROM cg JOIN bg USING (gram) GROUP BY doc_id)
SELECT bh.doc_id, n_bloom_hits,
       coalesce(n_exact_hits, 0) AS n_exact_hits,
       n_bloom_hits - coalesce(n_exact_hits, 0) AS n_false_pos
FROM bh LEFT JOIN eh ON bh.doc_id = eh.doc_id
ORDER BY bh.doc_id
"""


register("docs_decontaminate_bloom", docs_decontaminate_bloom, _bloom_oracle())
