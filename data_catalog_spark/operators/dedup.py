"""Deduplication operators over the documents table — exact, n-gram Jaccard,
MinHash+LSH, SimHash.  (Embedding-cosine near-dup lives in similarity.py.)

Exact and n-gram Jaccard are fully SQL-expressible and oracle-checked; the
sketch-based ones (MinHash, SimHash) are the *scale paths* — deterministic
but hash-seeded, so the driver records rows-only checks and pytest verifies
them against the exact Jaccard ground truth (recall on the planted near-dup
pairs).

Scale design (100 TB):
- exact dedup: one shuffle on a 16-byte hash — the cheapest possible
  distributed dedup; always run it first.
- n-gram Jaccard: exact but O(Σ pairs sharing a shingle) — correct at any
  scale only after blocking; here it is the ground-truth oracle.
- MinHash+LSH: the real 100 TB path.  signature = k per-shingle hash mins
  (one explode + one groupBy), banding turns O(n²) similarity into an
  equality join on (band, band_hash) — shuffle on band keys, candidate
  verification only within buckets.  b=16 bands × r=4 rows ⇒ s-curve
  threshold ≈ (1/16)^(1/4) ≈ 0.5.
- SimHash: 64-bit fingerprint per doc (map-only), candidates via 4×16-bit
  chunk equality join (Hamming ≤ 3 guarantees a shared chunk by pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .text import DUCK_SHINGLES, DUCK_TOKENS, SPARK_SHINGLES, SPARK_TOKENS

JACCARD_THRESHOLD = 0.5

MINHASH_K = 64  # signature length
MINHASH_BANDS = 16  # b bands of r = k/b rows
SIMHASH_MAX_HAMMING = 3
SIMHASH_CHUNKS = 4  # pigeonhole: hamming<=3 ⇒ ≥1 of 4 chunks equal


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("t", F.expr(SPARK_TOKENS))


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, s) — distinct 3-gram word shingles, exploded."""
    return (
        _tokens(df)
        .select("doc_id", F.explode(F.expr(SPARK_SHINGLES)).alias("s"))
        .distinct()
    )


# -- exact dedup -------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy exact dedup on the normalized token stream: one shuffle
    on md5, keeper = min doc_id per group."""
    return (
        _tokens(_docs(spark, sf_dir))
        .select("doc_id", F.md5(F.expr("concat_ws(' ', t)")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy("fp")
    )


DEDUP_EXACT_ORACLE = f"""
WITH d AS (SELECT doc_id, md5(array_to_string({DUCK_TOKENS}, ' ')) AS fp FROM documents)
SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp
"""


# -- exact n-gram Jaccard (the ground truth) ---------------------------------


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with 3-gram shingle Jaccard ≥ 0.5: explode → equality
    self-join on shingle (the blocking key) → per-pair overlap count →
    |A∪B| from per-doc sizes.  Exact, deterministic, oracle-checked.
    The docs repartition spreads the 1-row-group local file across the
    executor threads so shingling isn't a serial scan task (no-op to omit
    on a properly partitioned deployment input)."""
    docs = _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    sh = _shingles(docs).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    jac = F.col("common") / (F.col("na.n") + F.col("nb.n") - F.col("common"))
    return (
        pairs.join(na, F.col("da") == F.col("na.doc_id"))
        .join(nb, F.col("db") == F.col("nb.doc_id"))
        .where(jac >= JACCARD_THRESHOLD)
        .select("da", "db", F.round(jac, 6).alias("jac"))
        .orderBy("da", "db")
    )


# The pair query body, reusable as a subquery (dup-cluster resolution in
# operators/corpus.py embeds it).
JACCARD_PAIRS_BODY = f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest({DUCK_SHINGLES}) AS s FROM toks),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da, db, round(common / (na.n + nb.n - common), 6) AS jac
FROM pairs JOIN sizes na ON da = na.doc_id JOIN sizes nb ON db = nb.doc_id
WHERE common / (na.n + nb.n - common) >= {JACCARD_THRESHOLD}
"""

DEDUP_JACCARD_ORACLE = f"{JACCARD_PAIRS_BODY} ORDER BY da, db"


# -- MinHash + LSH (the scale path) ------------------------------------------


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig: array<long>) — component i = min over shingles of
    xxhash64(i, shingle).  One groupBy over the exploded shingles: the k
    hashes are flat codegen'd column expressions (NOT higher-order-function
    lambdas, which evaluate interpreted and cost ~7× here), and map-side
    partial mins mean the shuffle carries only n_docs × k longs per map
    partition — the exploded shingle stream itself never crosses the wire."""
    mins = [F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}") for i in range(k)]
    sig = _shingles(docs).groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def minhash_bands(sig: DataFrame, bands: int = MINHASH_BANDS, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, band, band_hash) — LSH bucket keys."""
    r = k // bands
    rows = []
    for band in range(bands):
        cols = [F.col("sig")[band * r + j] for j in range(r)]
        rows.append(
            F.struct(F.lit(band).alias("band"), F.xxhash64(*cols).alias("band_hash"))
        )
    return sig.select(
        "doc_id", F.explode(F.array(*rows)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash"))


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates with signature-estimated Jaccard.

    Output: (da, db, est_jac) for candidate pairs whose banding collided and
    whose signature agreement ≥ threshold.  Deterministic (xxhash64 seeds are
    fixed) but not SQL-expressible — rows-only driver check; pytest measures
    recall against dedup_ngram_jaccard."""
    # The sf0.1 documents file is a single row group ⇒ a 1-task scan that
    # would serialize all k×|shingles| hashing; spread docs across the
    # executor threads first (at deployment scale the input is already
    # many-partitioned and this repartition is a no-op to omit).
    docs = _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # Signatures are tiny (n_docs × k × 8 B); localCheckpoint materializes
    # them once so the band self-join and the two estimate-joins below reuse
    # the computed table instead of re-deriving it (the single-job analog of
    # writing a signatures table at deployment scale).
    sig = minhash_signatures(docs).localCheckpoint(eager=False)
    bands = minhash_bands(sig)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    est = (
        F.expr("aggregate(zip_with(sa.sig, sb.sig, (x, y) -> IF(x = y, 1, 0)), 0, (a, x) -> a + x)")
        / F.lit(MINHASH_K)
    )
    return (
        cand.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .select("da", "db", F.round(est, 6).alias("est_jac"))
        .where(F.col("est_jac") >= JACCARD_THRESHOLD)
        .orderBy("da", "db")
    )


# -- SimHash -----------------------------------------------------------------


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp: long) — 64-bit SimHash over the token multiset.

    Map-only per doc: explode tokens, hash each, ±1 vote per bit weighted by
    token multiplicity, sign-pack.  The per-bit votes are plain aggregates so
    the whole thing is one partial-aggregated groupBy."""
    tok = (
        _tokens(docs)
        .select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", F.xxhash64("w"))
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {i}) & 1") == 1, F.col("cnt")).otherwise(-F.col("cnt"))
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    packed = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        packed = term if packed is None else (packed + term)
    return agg.select("doc_id", packed.alias("fp"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming(fp_a, fp_b) ≤ 3.

    Candidates via 16-bit chunk equality (pigeonhole blocking — no O(n²));
    exact Hamming check with bit_count(xor).  Rows-only driver check; pytest
    compares against Jaccard ground truth."""
    fps = simhash_fingerprints(_docs(spark, sf_dir))
    chunks = fps.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(f"(fp >> {16 * j}) & 65535").alias("c"),
                    )
                    for j in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "fp", F.col("ck.j").alias("j"), F.col("ck.c").alias("c"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.expr("bit_count(a.fp ^ b.fp)")
    return (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.c") == F.col("b.c"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(ham <= SIMHASH_MAX_HAMMING)
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
        .orderBy("da", "db")
    )


register("dedup_exact", dedup_exact, DEDUP_EXACT_ORACLE)
register("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_JACCARD_ORACLE)
register("dedup_minhash", dedup_minhash, None)  # rows-only: hash-seeded sketch
register("dedup_simhash", dedup_simhash, None)  # rows-only: hash-seeded sketch
