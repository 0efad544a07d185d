"""Text-analysis operators over the documents table — the LLM-training-data
pipeline surface (BASELINE.json north star; no reference counterpart).

All operators are pure column expressions (split/filter/transform/aggregate
lambdas — JVM-side, whole-stage codegen; no Python UDFs).  Every operator is
defined ONCE as shared Python data (regexes, marker lists) and rendered to
both a Spark plan and DuckDB oracle SQL, like the catalog compiler.

Scale: each operator is a narrow projection of one table — map-only, no
shuffle; at 100 TB these run at scan speed and are the cheap first pass of a
data-quality pipeline (filter before you shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import analyzers
from ..io import read_table
from .registry import register

TOKEN_SPLIT = analyzers.STANDARD_SPLIT  # "[^a-z0-9]+"

# Spark + DuckDB renderings of "non-empty lowercase tokens of `text`".
SPARK_TOKENS = f"filter(split(lower(text), '{TOKEN_SPLIT}'), x -> x != '')"
DUCK_TOKENS = f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT}'), x -> x <> '')"

_STOPWORDS = sorted(analyzers.ENGLISH_STOPWORDS)

# Language-ID marker words: score(lang) = number of distinct markers present
# as tokens; argmax with fixed precedence (en > de > es > fr), 'und' when all
# zero.  A deliberately simple, deterministic n-gram/stopword heuristic —
# the point is the distributed shape (map-only scoring), not SOTA accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "des", "une", "est"],
}
_LANG_ORDER = ["en", "de", "es", "fr"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


# -- token / char counting ---------------------------------------------------

# BPE-ish subword segmentation: contractions, space-prefixed letter runs,
# digit runs, punct runs — a lookahead-free simplification of the GPT-2
# pretokenizer pattern so the identical regex runs in Java regex (Spark) and
# RE2 (DuckDB).  Counts approximate LLM token budgets deterministically.
BPE_PATTERN = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-token, subword-token (BPE-ish) and char counts per document."""
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.expr(f"size({SPARK_TOKENS})").cast("long").alias("n_tokens"),
            F.expr(f"size(regexp_extract_all(text, \"{BPE_PATTERN}\", 0))")
            .cast("long")
            .alias("n_subword_tokens"),
        )
        .orderBy("doc_id")
    )


_BPE_SQL = BPE_PATTERN.replace("'", "''")
TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS n_subword_tokens
FROM documents ORDER BY doc_id
"""


# -- quality scoring ---------------------------------------------------------


# Shared per-document feature renderers (one per engine), parameterized
# by the stopword list — text_quality, corpus_training_filter, and the
# frozen quality classifier (quality_model.py) all consume the SAME
# feature definitions; keep the rendering here so the four copies can't
# drift (each caller still fixes its own word list — the classifier's
# frozen weights pin a 6-word subset).


def spark_stop_count(words) -> str:
    """Count of tokens (in array column ``t``) found in ``words``."""
    lits = ", ".join(f"'{w}'" for w in words)
    return f"size(filter(t, x -> array_contains(array({lits}), x)))"


def duck_stop_count(words) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(t, x -> list_contains([{lits}], x)))"


# alphabetic-character share of the raw text, both renderings
SPARK_ALPHA_LEN = ("text", "[^a-zA-Z]", "")  # F.regexp_replace args
DUCK_ALPHA_RATIO = (
    "length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)"
)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / alpha-ratio / stopword-ratio quality features + a binary
    keep/drop verdict — the standard pre-training corpus filter shape."""
    return (
        _docs(spark, sf_dir)
        .withColumn("t", F.expr(SPARK_TOKENS))
        .withColumn("alpha_len", F.length(F.regexp_replace(*SPARK_ALPHA_LEN)))
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.expr("size(t)").cast("long").alias("n_tokens"),
            F.round(F.col("alpha_len") / F.length("text"), 6).alias("alpha_ratio"),
            F.round(
                F.expr(spark_stop_count(_STOPWORDS)) / F.expr("size(t)"),
                6,
            ).alias("stop_ratio"),
            F.round(
                # BIGINT accumulator: an int-literal zero makes the fold
                # 32-bit, silently wrapping on >2^31 total token chars in
                # non-ANSI Spark while the DuckDB oracle's sum does not
                # (r10 ADVICE); corpus.py's quality-signals twin uses the
                # same spelling for bit-consistency.
                F.expr("aggregate(t, CAST(0 AS BIGINT), (a, x) -> a + length(x))")
                / F.expr("size(t)"),
                6,
            ).alias("avg_token_len"),
        )
        .withColumn(
            "keep",
            (F.col("n_tokens") >= 5)
            & (F.col("alpha_ratio") >= 0.6)
            & (F.col("stop_ratio") <= 0.5),
        )
        .orderBy("doc_id")
    )


def _quality_oracle() -> str:
    stops = duck_stop_count(_STOPWORDS)
    return f"""
WITH d AS (SELECT doc_id, text, {DUCK_TOKENS} AS t FROM documents)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(t) AS BIGINT) AS n_tokens,
       round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text), 6)
           AS alpha_ratio,
       round({stops} / len(t), 6) AS stop_ratio,
       round(list_sum(list_transform(t, x -> length(x))) / len(t), 6)
           AS avg_token_len,
       len(t) >= 5
         AND round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text), 6) >= 0.6
         AND round({stops} / len(t), 6) <= 0.5
           AS keep
FROM d ORDER BY doc_id
"""


# -- language id -------------------------------------------------------------


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic; deterministic argmax.

    One tokenization + one array_intersect per language (score = number of
    distinct markers present) — tokenize-once beats 20 per-marker regex
    scans of the full text ~3× at bench scale."""
    df = _docs(spark, sf_dir).withColumn("t", F.expr(SPARK_TOKENS))
    for lang, words in LANG_MARKERS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        df = df.withColumn(
            f"s_{lang}", F.expr(f"size(array_intersect(t, array({arr})))").cast("int")
        )
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_ORDER}
    pred = (
        F.when(
            (s["en"] > 0) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]),
            "en",
        )
        .when((s["de"] > 0) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when((s["es"] > 0) & (s["es"] >= s["fr"]), "es")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )
    return df.select(
        "doc_id", pred.alias("lang_pred"), *[F.col(f"s_{l}") for l in _LANG_ORDER]
    ).orderBy("doc_id")


def _langid_oracle() -> str:
    score_exprs = []
    for lang in _LANG_ORDER:
        arr = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_exprs.append(
            f"CAST(len(list_intersect(t, [{arr}])) AS INTEGER) AS s_{lang}"
        )
    return f"""
WITH d AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
s AS (SELECT doc_id, {', '.join(score_exprs)} FROM d)
SELECT doc_id,
       CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred,
       s_en, s_de, s_es, s_fr
FROM s ORDER BY doc_id
"""


def source_language_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language mix — the first report any multilingual corpus
    curation runs (which crawls feed which languages, and at what share).
    Composes the marker-word classifier (text_langid) with one hash agg on
    (source, lang): map-only classify → partial-aggregated counts; the
    per-source share divides by a window-free second agg joined back (two
    tiny frames, bounded by |sources| × |langs|)."""
    df = _docs(spark, sf_dir).withColumn("t", F.expr(SPARK_TOKENS))
    for lang, words in LANG_MARKERS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        df = df.withColumn(
            f"s_{lang}", F.expr(f"size(array_intersect(t, array({arr})))").cast("int")
        )
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_ORDER}
    pred = (
        F.when(
            (s["en"] > 0) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]),
            "en",
        )
        .when((s["de"] > 0) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when((s["es"] > 0) & (s["es"] >= s["fr"]), "es")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )
    counts = (
        df.select("source", pred.alias("lang"))
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    ).localCheckpoint(eager=False)  # feeds totals AND the share join: one
    # classify pass over the corpus, not two (|source|×|lang| rows kept)
    totals = counts.groupBy("source").agg(F.sum("n_docs").alias("total"))
    return (
        counts.join(totals, "source")
        .select(
            "source",
            "lang",
            "n_docs",
            F.round(F.col("n_docs") / F.col("total"), 6).alias("share"),
        )
        .orderBy("source", "lang")
    )


def _source_lang_oracle() -> str:
    score_exprs = []
    for lang in _LANG_ORDER:
        arr = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_exprs.append(
            f"CAST(len(list_intersect(t, [{arr}])) AS INTEGER) AS s_{lang}"
        )
    return f"""
WITH d AS (SELECT doc_id, source, {DUCK_TOKENS} AS t FROM documents),
s AS (SELECT doc_id, source, {', '.join(score_exprs)} FROM d),
p AS (SELECT source,
       CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang
      FROM s),
c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM p GROUP BY source, lang),
t AS (SELECT source, SUM(n_docs) AS total FROM c GROUP BY source)
SELECT c.source, lang, n_docs, round(n_docs * 1.0 / total, 6) AS share
FROM c JOIN t ON c.source = t.source
ORDER BY c.source, lang
"""


register("source_language_profile", source_language_profile, _source_lang_oracle())


# -- fingerprinting ----------------------------------------------------------

# 3-gram word shingles of the normalized token stream; shared with dedup.
SHINGLE_N = 3
SPARK_SHINGLES = (
    f"CASE WHEN size(t) >= {SHINGLE_N} THEN "
    f"array_distinct(transform(sequence(0, size(t) - {SHINGLE_N}), "
    f"i -> concat_ws(' ', slice(t, i + 1, {SHINGLE_N})))) "
    f"ELSE CAST(array() AS ARRAY<STRING>) END"
)
DUCK_SHINGLES = (
    "list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] "
    "for i in range(1, len(t) - 1)])"
)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of the normalized token stream (exact-dup
    key) + min shingle-hash (a 1-hash MinHash / winnowing-style rolling
    fingerprint that survives small edits)."""
    return (
        _docs(spark, sf_dir)
        .withColumn("t", F.expr(SPARK_TOKENS))
        .select(
            "doc_id",
            F.md5(F.expr("concat_ws(' ', t)")).alias("doc_md5"),
            F.expr(f"array_min(transform({SPARK_SHINGLES}, x -> md5(x)))").alias(
                "min_shingle_md5"
            ),
        )
        .orderBy("doc_id")
    )


FINGERPRINT_ORACLE = f"""
WITH d AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents)
SELECT doc_id,
       md5(array_to_string(t, ' ')) AS doc_md5,
       list_aggregate(list_transform({DUCK_SHINGLES}, x -> md5(x)), 'min')
           AS min_shingle_md5
FROM d ORDER BY doc_id
"""


register("text_token_count", text_token_count, TOKEN_COUNT_ORACLE)
register("text_quality", text_quality, _quality_oracle())
register("text_langid", text_langid, _langid_oracle())
register("text_fingerprint", text_fingerprint, FINGERPRINT_ORACLE)


# -- winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm) ------

# Full winnowing, not the 1-hash sketch above: over the sequence of
# POSITIONAL 3-gram hashes, every window of WINNOW_W consecutive hashes
# contributes its minimum (rightmost on ties), and the distinct winners
# are the document's fingerprints.  Guarantee: any substring match of
# length >= WINNOW_W + SHINGLE_N - 1 tokens shares at least one
# fingerprint, while only ~2/(w+1) of positions are kept — the sparse
# representation plagiarism/copy detectors index at scale.
#
# Cross-engine tie-break trick: pack (hash, position) into ONE BIGINT
# key = h·2^31 + (2^31 − pos), so MIN(key) = minimal hash with the
# RIGHTMOST position on ties.  Bounds: h < 2^32 (an 8-hex-char md5
# slice) and 1 ≤ pos < 2^31 give key ≤ (2^32−1)·2^31 + 2^31 − 1 =
# 2^63 − 1 — exactly the signed-BIGINT ceiling, with the position field
# valid up to a 2-billion-token document (a narrower 2^20 field would
# silently corrupt tie-breaks past ~1M grams).  Both engines then agree
# bit-for-bit without struct-ordering semantics.
WINNOW_W = 4
_POS_BASE = 1 << 31

_SPARK_POS_HASHES = (
    f"CASE WHEN size(t) >= {SHINGLE_N} THEN "
    f"transform(sequence(1, size(t) - {SHINGLE_N} + 1), "
    f"i -> struct(i AS pos, "
    f"cast(conv(substring(md5(concat_ws(' ', slice(t, i, {SHINGLE_N}))), 1, 8), "
    f"16, 10) as bigint) AS h)) "
    f"ELSE array() END"
)


def docs_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: positional-gram count, winnowing fingerprint count,
    the selection density, and the doc's minimal fingerprint hash (a
    cheap clusterable key).  Docs with at least one full window (>=
    WINNOW_W + SHINGLE_N − 1 tokens) appear.

    Plan shape: explode to the positional hash stream, ONE running-frame
    window min per doc (shuffle on doc_id, sequential within — documents
    are bounded, so the partition never skews), then a distinct +
    groupBy(doc_id).  Linear in the token stream; the fingerprint SET is
    never collected."""
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(WINNOW_W - 1), 0
    )
    hashes = (
        _docs(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("t", F.expr(SPARK_TOKENS))
        .select("doc_id", F.explode(F.expr(_SPARK_POS_HASHES)).alias("ph"))
        .select(
            "doc_id",
            F.col("ph.pos").alias("pos"),
            (F.col("ph.h") * _POS_BASE + (_POS_BASE - F.col("ph.pos"))).alias(
                "key"
            ),
        )
    )
    winners = (
        hashes.withColumn("mk", F.min("key").over(win))
        .where(F.col("pos") >= WINNOW_W)  # full windows only
        .select("doc_id", "mk")
        .distinct()
    )
    grams = hashes.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        winners.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.min(F.expr(f"mk div {_POS_BASE}")).alias("min_fingerprint"),
        )
        .join(grams, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_fingerprints",
            F.round(
                F.col("n_fingerprints").cast("double") / F.col("n_grams"), 6
            ).alias("density"),
            "min_fingerprint",
        )
        .orderBy("doc_id")
    )


WINNOW_ORACLE = f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
ph AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(array_to_string(t[i : i + {SHINGLE_N} - 1], ' ')),
          1, 8))::BIGINT AS h
  FROM toks, LATERAL unnest(range(1, len(t) - {SHINGLE_N} + 2)) AS r(i)
),
keys AS (SELECT doc_id, pos, h * {_POS_BASE} + ({_POS_BASE} - pos) AS key
         FROM ph),
mins AS (
  SELECT doc_id, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
             AS mk
  FROM keys
),
winners AS (SELECT DISTINCT doc_id, mk FROM mins WHERE pos >= {WINNOW_W}),
grams AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM ph
          GROUP BY doc_id)
SELECT w.doc_id, g.n_grams,
       CAST(count(*) AS BIGINT) AS n_fingerprints,
       round(CAST(count(*) AS DOUBLE) / g.n_grams, 6) AS density,
       min(mk // {_POS_BASE}) AS min_fingerprint
FROM winners w JOIN grams g ON w.doc_id = g.doc_id
GROUP BY w.doc_id, g.n_grams ORDER BY w.doc_id
"""


register(
    "docs_winnowing_fingerprints", docs_winnowing_fingerprints, WINNOW_ORACLE
)


# -- stemmed corpus frequencies ----------------------------------------------


def corpus_top_stems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 stems corpus-wide — the english-analyzer stemming pass
    (SURVEY hard-parts) applied as a portable regexp CASE chain.

    Stem-dictionary plan: count RAW tokens first (one partial-aggregated
    shuffle), then run the (expensive, multi-step) stem chain on the
    DISTINCT vocabulary only and re-aggregate by stem.  The chain executes
    |vocabulary| times instead of |token occurrences| times — at corpus
    scale that is millions vs trillions; same trick a production analyzer
    uses (stem cache keyed by surface form)."""
    tokens = _docs(spark, sf_dir).select(F.explode(F.expr(SPARK_TOKENS)).alias("w"))
    counts = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    stem_col = F.expr(analyzers.spark_stem_expr("w"))
    return (
        counts.select(stem_col.alias("stem"), "n")
        .groupBy("stem")
        .agg(F.sum("n").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("stem"))
        .limit(25)
    )


TOP_STEMS_ORACLE = f"""
WITH s AS (
  SELECT unnest({analyzers.duck_stem_transform(DUCK_TOKENS)}) AS stem
  FROM documents
)
SELECT stem, CAST(count(*) AS BIGINT) AS n_occurrences
FROM s GROUP BY stem ORDER BY n_occurrences DESC, stem LIMIT 25
"""


register("corpus_top_stems", corpus_top_stems, TOP_STEMS_ORACLE)


# -- boilerplate detection (corpus-frequent n-gram coverage) ------------------

# Instance-level (non-distinct) 3-gram shingles: coverage must count every
# occurrence, so this is the multiset twin of SPARK_SHINGLES.
SPARK_SHINGLES_ALL = (
    f"CASE WHEN size(t) >= {SHINGLE_N} THEN "
    f"transform(sequence(0, size(t) - {SHINGLE_N}), "
    f"i -> concat_ws(' ', slice(t, i + 1, {SHINGLE_N}))) "
    f"ELSE CAST(array() AS ARRAY<STRING>) END"
)
DUCK_SHINGLES_ALL = (
    "[t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]"
)

BOILERPLATE_MIN_DOCS = 5  # a gram in ≥5 docs is boilerplate


def docs_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: how much of it is corpus boilerplate — the fraction of
    its 3-gram instances whose gram appears in ≥ BOILERPLATE_MIN_DOCS
    distinct documents (RefinedWeb-style repetition filtering at the
    n-gram granularity this corpus supports).

    Two aggregations: document frequency per gram (distinct-doc count —
    shuffle on the gram), then per-doc instance counts joined against the
    frequent-gram set (broadcast-sized in any real corpus: the frequent
    tail is tiny relative to the gram universe).  Output is scan-shaped,
    one row per doc — the gate you'd filter on before training."""
    docs = _docs(spark, sf_dir)
    # inst feeds BOTH the gram-frequency aggregation and the marking join —
    # materialize the exploded gram stream once instead of tokenizing and
    # shingling the corpus twice (the bigram_lm "write the postings once"
    # rule; at 100 TB the tokenize+explode map is the dominant stage).
    inst = (
        docs.withColumn("t", F.expr(SPARK_TOKENS))
        .select("doc_id", F.explode(F.expr(SPARK_SHINGLES_ALL)).alias("g"))
    ).localCheckpoint(eager=False)
    freq = (
        inst.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= BOILERPLATE_MIN_DOCS)
        .select("g")
    )
    marked = inst.join(F.broadcast(freq).withColumn("hit", F.lit(1)), "g", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_grams"), 6).alias("boiler_ratio"),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_ORACLE = f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
inst AS (SELECT doc_id, unnest({DUCK_SHINGLES_ALL}) AS g FROM toks),
freq AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM inst GROUP BY g)
  WHERE df >= {BOILERPLATE_MIN_DOCS}
),
marked AS (
  SELECT i.doc_id, CASE WHEN f.g IS NULL THEN 0 ELSE 1 END AS hit
  FROM inst i LEFT JOIN freq f ON i.g = f.g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(hit) AS BIGINT) AS n_boiler,
       round(sum(hit) / count(*), 6) AS boiler_ratio
FROM marked GROUP BY doc_id ORDER BY doc_id
"""


register("docs_boilerplate_ratio", docs_boilerplate_ratio, BOILERPLATE_ORACLE)


# -- intra-document repetition (Gopher-style rules) ---------------------------
#
# docs_boilerplate_ratio measures INTER-document repetition (corpus-frequent
# grams); these are the complementary INTRA-document signals from the Gopher
# quality rules: a doc dominated by one repeated phrase, or whose n-grams
# mostly repeat within the doc itself, is degenerate even if globally rare.

# word-2-gram array (same short-input guard as the shingles)
_SPARK_BIGRAMS = (
    "CASE WHEN size(t) >= 2 THEN "
    "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', slice(t, i + 1, 2))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)
_DUCK_BIGRAMS = "[t[i] || ' ' || t[i+1] for i in range(1, len(t))]"

TOP_BIGRAM_MAX_FRAC = 0.08  # top-bigram occupancy gate
DUP_TRIGRAM_MAX_FRAC = 0.6  # duplicated-trigram occupancy gate


def docs_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: ``top_bigram_frac`` (share of bigram instances taken
    by the single most frequent bigram — the 'same phrase over and over'
    signal) and ``dup_trigram_frac`` (share of trigram instances whose
    gram occurs more than once in the doc — Gopher's duplicated-n-gram
    fraction), plus the keep verdict at the module thresholds.

    Shape: explode → count per (doc, gram) → one agg per doc — the same
    postings shuffle as every other n-gram operator here; no per-doc
    state ever leaves the executors.  Short docs (no grams) keep frac 0
    and pass the gate."""
    docs = _docs(spark, sf_dir).withColumn("t", F.expr(SPARK_TOKENS))
    bi = (
        docs.select("doc_id", F.explode(F.expr(_SPARK_BIGRAMS)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_c"),
            F.sum("c").alias("n_bi"),
        )
    )
    tri = (
        docs.select("doc_id", F.explode(F.expr(SPARK_SHINGLES_ALL)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_tri"),
            F.sum("c").alias("n_tri"),
        )
    )
    out = (
        docs.select("doc_id")
        .join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("top_c") / F.col("n_bi"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("dup_tri") / F.col("n_tri"), F.lit(0.0)), 6
            ).alias("dup_trigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("top_bigram_frac") <= TOP_BIGRAM_MAX_FRAC)
            & (F.col("dup_trigram_frac") <= DUP_TRIGRAM_MAX_FRAC),
        )
        .orderBy("doc_id")
    )
    return out


REPETITION_ORACLE = f"""
WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
bi AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS n_bi FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, unnest({_DUCK_BIGRAMS}) AS g FROM toks)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
),
tri AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri,
         sum(c) AS n_tri FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, unnest({DUCK_SHINGLES_ALL}) AS g FROM toks)
    GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT d.doc_id,
       round(COALESCE(CAST(top_c AS DOUBLE) / n_bi, 0.0), 6) AS top_bigram_frac,
       round(COALESCE(CAST(dup_tri AS DOUBLE) / n_tri, 0.0), 6) AS dup_trigram_frac,
       round(COALESCE(CAST(top_c AS DOUBLE) / n_bi, 0.0), 6) <= {TOP_BIGRAM_MAX_FRAC}
         AND round(COALESCE(CAST(dup_tri AS DOUBLE) / n_tri, 0.0), 6) <= {DUP_TRIGRAM_MAX_FRAC}
           AS keep
FROM toks d LEFT JOIN bi ON d.doc_id = bi.doc_id LEFT JOIN tri ON d.doc_id = tri.doc_id
ORDER BY d.doc_id
"""


register("docs_repetition_stats", docs_repetition_stats, REPETITION_ORACLE)


# -- tokenizer efficiency (fertility / compression) ---------------------------


def tokenizer_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang): subword fertility (subword tokens per word —
    the standard tokenizer-quality metric; Ács 2019, Rust et al. 2021
    "How Good is Your Tokenizer?") and chars-per-subword (the
    compression rate that converts a byte budget into a token budget).
    A training-data build reads this table to price each source/language
    slice in TOKENS before mixing (see ``source_token_budget_mix``) —
    fertility differences of 2-3× across languages are why byte-balanced
    mixes are token-imbalanced.

    Map-only per-document metrics, one hash aggregation over (source,
    lang) — scan-speed at 100 TB; subword counts reuse the shared
    ``BPE_PATTERN`` so both engines segment identically."""
    d = _docs(spark, sf_dir).select(
        "source",
        "lang",
        F.length("text").cast("long").alias("nc"),
        F.expr(f"size({SPARK_TOKENS})").cast("long").alias("nw"),
        F.expr(f'size(regexp_extract_all(text, "{BPE_PATTERN}", 0))')
        .cast("long")
        .alias("ns"),
    )
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nw").alias("n_words"),
            F.sum("ns").alias("n_subwords"),
            F.round(F.sum("ns") / F.sum("nw"), 6).alias("fertility"),
            F.round(F.sum("nc") / F.sum("ns"), 6).alias("chars_per_subword"),
        )
        .orderBy("source", "lang")
    )


TOKENIZER_EFFICIENCY_ORACLE = f"""
WITH d AS (
  SELECT source, lang,
         CAST(length(text) AS BIGINT) AS nc,
         CAST(len({DUCK_TOKENS}) AS BIGINT) AS nw,
         CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT) AS ns
  FROM documents
)
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nw) AS BIGINT) AS n_words,
       CAST(sum(ns) AS BIGINT) AS n_subwords,
       round(CAST(sum(ns) AS DOUBLE) / sum(nw), 6) AS fertility,
       round(CAST(sum(nc) AS DOUBLE) / sum(ns), 6) AS chars_per_subword
FROM d GROUP BY source, lang ORDER BY source, lang
"""


register("tokenizer_efficiency", tokenizer_efficiency, TOKENIZER_EFFICIENCY_ORACLE)


# -- Zipf-law fit (corpus-health diagnostic) ----------------------------------
#
# Natural-language corpora follow freq ∝ rank^s with s ≈ −1 (Zipf 1935);
# a corpus whose fitted slope drifts far from −1 is degenerate (template
# spam flattens it, dedup failures steepen it), so pipelines track the
# fitted exponent as a composition diagnostic.  The fit is an ordinary
# least squares of ln(freq) on ln(rank) over the bounded top-R terms:
# term counting is the canonical one-shuffle word count; the top-R cut is
# TakeOrdered (never a global sort), and the single-partition rank window
# touches only the R retained rows.  Per-term ln values are truncated to
# DECIMAL before the regression sums (langmodel.py's portable-ln rule) so
# the five sufficient statistics are order-independent and cross-engine.

ZIPF_TOP_R = 1000


def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: term count in the fit, OLS slope/intercept of
    ln(freq) ~ ln(rank), and R² — over the top-R corpus terms."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.expr(SPARK_TOKENS)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w"))
        .limit(ZIPF_TOP_R)
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("w"))),
    )
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).cast("decimal(20,12)").alias("x"),
        F.log(F.col("cnt").cast("double")).cast("decimal(20,12)").alias("y"),
    ).select(
        F.col("x").cast("double").alias("xd"),
        F.col("y").cast("double").alias("yd"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xd").cast("decimal(20,10)")).cast("double").alias("sx"),
        F.sum(F.col("yd").cast("decimal(20,10)")).cast("double").alias("sy"),
        F.sum((F.col("xd") * F.col("yd")).cast("decimal(20,10)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("xd") * F.col("xd")).cast("decimal(20,10)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("yd") * F.col("yd")).cast("decimal(20,10)"))
        .cast("double")
        .alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        F.col("n").alias("n_terms"),
        F.round(cov / varx, 6).alias("slope"),
        F.round(
            (F.col("sy") - (cov / varx) * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


ZIPF_ORACLE = f"""
WITH counts AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({DUCK_TOKENS}) AS w FROM documents)
  GROUP BY w ORDER BY cnt DESC, w LIMIT {ZIPF_TOP_R}
), ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM counts
), pts AS (
  SELECT CAST(CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE) AS xd,
         CAST(CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE) AS yd
  FROM ranked
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(xd AS DECIMAL(20,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(yd AS DECIMAL(20,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(xd * yd AS DECIMAL(20,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(xd * xd AS DECIMAL(20,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(yd * yd AS DECIMAL(20,10))) AS DOUBLE) AS syy
  FROM pts
)
SELECT n AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
           AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM sums
"""


register("corpus_zipf_fit", corpus_zipf_fit, ZIPF_ORACLE)


# -- Heaps'-law vocabulary growth ---------------------------------------------
#
# The companion statistic to the Zipf fit: how the TYPE count grows with
# corpus size as it is consumed in ingest (doc_id) order — V(N) ≈ k·N^β.
# Mixture designers read β to extrapolate tokenizer vocab pressure and
# dedup saturation to the full crawl from a prefix sample.  Types are the
# dedup SHINGLE unit (word {SHINGLE_N}-grams): the driver corpus draws
# words from a closed ~31-word vocabulary, so unigram types saturate in
# the first bucket (a degenerate flat curve), while the n-gram type space
# keeps growing — and n-gram types are what MinHash saturation actually
# depends on.

HEAPS_BUCKETS = 100


def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: curve-point count, totals, OLS slope (the Heaps exponent
    β), intercept ln k, and R² of ln V ~ ln N over the bucketed
    cumulative shingle-vocabulary-growth curve (N = shingle instances,
    V = distinct shingle types).

    Scale shape: type first-appearances are ONE groupBy over the shingle
    stream (min doc_id per type — no per-doc distinct state, no
    quadratic rescan); the curve is bucketed onto a FIXED
    ``HEAPS_BUCKETS`` id-range grid with plain arithmetic (no global row
    ordering over the corpus), so the only unpartitioned window runs
    over the 100-row bucket aggregate — model-sized at any SF (the
    source_temperature_mix adjudication class).  OLS sums fold through
    DECIMAL (the corpus_zipf_fit convention), partition-order
    independent."""
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(SPARK_TOKENS).alias("t"))
        .localCheckpoint(eager=False)  # scalar max + shingle stream + sizes
    )
    mx = d.agg(F.max("doc_id")).first()[0] + 1

    def hb(col: str) -> F.Column:
        return F.expr(
            f"CAST(least(floor({col} * {HEAPS_BUCKETS} / {mx}), "
            f"{HEAPS_BUCKETS - 1}) AS INT)"
        )

    n_windows = (
        f"CASE WHEN size(t) >= {SHINGLE_N} "
        f"THEN size(t) - {SHINGLE_N - 1} ELSE 0 END"
    )
    pbt = d.groupBy(hb("doc_id").alias("bucket")).agg(
        F.sum(F.expr(n_windows)).cast("long").alias("n_tokens")
    )
    firsts = (
        d.select("doc_id", F.explode(F.expr(SPARK_SHINGLES)).alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fd"))
    )
    pbn = firsts.groupBy(hb("fd").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    grid = spark.range(HEAPS_BUCKETS).select(
        F.col("id").cast("int").alias("bucket")
    )
    pb = (
        grid.join(pbt, "bucket", "left")
        .join(pbn, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = pb.select(
        F.sum("n_tokens").over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_types"),
    )
    pts = (
        curve.where(F.col("cum_tokens") > 0)
        .select(
            F.log(F.col("cum_tokens").cast("double"))
            .cast("decimal(20,12)")
            .alias("x"),
            F.log(F.col("cum_types").cast("double"))
            .cast("decimal(20,12)")
            .alias("y"),
        )
        .select(
            F.col("x").cast("double").alias("xd"),
            F.col("y").cast("double").alias("yd"),
        )
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xd").cast("decimal(20,10)")).cast("double").alias("sx"),
        F.sum(F.col("yd").cast("decimal(20,10)")).cast("double").alias("sy"),
        F.sum((F.col("xd") * F.col("yd")).cast("decimal(20,10)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("xd") * F.col("xd")).cast("decimal(20,10)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("yd") * F.col("yd")).cast("decimal(20,10)"))
        .cast("double")
        .alias("syy"),
    )
    tot = pb.agg(F.sum("n_tokens"), F.sum("new_types")).first()
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        F.col("n").cast("long").alias("n_points"),
        F.lit(int(tot[0])).cast("long").alias("total_ngrams"),
        F.lit(int(tot[1])).cast("long").alias("total_types"),
        F.round(cov / varx, 6).alias("heaps_beta"),
        F.round(
            (F.col("sy") - (cov / varx) * F.col("sx")) / F.col("n"), 6
        ).alias("ln_k"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


HEAPS_ORACLE = f"""
WITH d AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
mx AS (SELECT max(doc_id) + 1 AS m FROM d),
pbt AS (
  SELECT CAST(least(floor(doc_id * {HEAPS_BUCKETS} / m),
              {HEAPS_BUCKETS - 1}) AS INTEGER) AS bucket,
         CAST(sum(CASE WHEN len(t) >= {SHINGLE_N}
                       THEN len(t) - {SHINGLE_N - 1} ELSE 0 END)
              AS BIGINT) AS n_tokens
  FROM d, mx GROUP BY 1),
firsts AS (
  SELECT w, min(doc_id) AS fd
  FROM (SELECT doc_id, unnest({DUCK_SHINGLES}) AS w FROM d) GROUP BY w),
pbn AS (
  SELECT CAST(least(floor(fd * {HEAPS_BUCKETS} / m),
              {HEAPS_BUCKETS - 1}) AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS new_types
  FROM firsts, mx GROUP BY 1),
grid AS (SELECT CAST(range AS INTEGER) AS bucket
         FROM range(0, {HEAPS_BUCKETS})),
pb AS (SELECT bucket, COALESCE(n_tokens, 0) AS n_tokens,
              COALESCE(new_types, 0) AS new_types
       FROM grid LEFT JOIN pbt USING (bucket) LEFT JOIN pbn USING (bucket)),
curve AS (SELECT sum(n_tokens) OVER (ORDER BY bucket) AS cum_tokens,
                 sum(new_types) OVER (ORDER BY bucket) AS cum_types
          FROM pb),
pts AS (
  SELECT CAST(CAST(ln(CAST(cum_tokens AS DOUBLE)) AS DECIMAL(20,12))
              AS DOUBLE) AS xd,
         CAST(CAST(ln(CAST(cum_types AS DOUBLE)) AS DECIMAL(20,12))
              AS DOUBLE) AS yd
  FROM curve WHERE cum_tokens > 0),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(xd AS DECIMAL(20,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(yd AS DECIMAL(20,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(xd * yd AS DECIMAL(20,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(xd * xd AS DECIMAL(20,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(yd * yd AS DECIMAL(20,10))) AS DOUBLE) AS syy
  FROM pts),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_ngrams,
               CAST(sum(new_types) AS BIGINT) AS total_types FROM pb)
SELECT n AS n_points, total_ngrams, total_types,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS heaps_beta,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
           AS ln_k,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM sums CROSS JOIN tot
"""


register("vocab_growth_heaps", vocab_growth_heaps, HEAPS_ORACLE)


# -- significant terms (the ES significant_terms aggregation) -------------------
#
# The reference's ES 1.x stack ships `significant_terms`: tokens
# OVERREPRESENTED in a foreground doc set relative to the whole corpus,
# scored by JLH = (fg_pct - bg_pct) * (fg_pct / bg_pct).  Re-expressed
# Spark-first: one distinct (doc, token) explode, one groupBy on the token
# key counting foreground and background doc frequencies together (the
# foreground flag aggregates as a conditional sum — no second corpus
# pass), a broadcast 1-row totals frame, then TakeOrderedAndProject for
# the top page.  Foreground here = lang='de' docs, whose vocabulary
# separates sharply from the corpus — the aggregation's whole point.

SIG_TERMS_K = 20
SIG_MIN_FG_DOCS = 3
SIG_FG_LANG = "de"


def docs_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, fg_docs, bg_docs, fg_pct, bg_pct, jlh): top-K significant
    terms of the foreground language's documents vs the whole corpus."""
    _docs(spark, sf_dir).createOrReplaceTempView("__sig_docs")
    return spark.sql(
        f"""
WITH dt AS (SELECT DISTINCT doc_id, lang = '{SIG_FG_LANG}' AS fg, token
            FROM (SELECT doc_id, lang, explode({SPARK_TOKENS}) AS token
                  FROM __sig_docs)),
tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS bg_n,
               CAST(count(DISTINCT CASE WHEN lang = '{SIG_FG_LANG}'
                                        THEN doc_id END) AS BIGINT) AS fg_n
        FROM __sig_docs),
cnt AS (SELECT token,
               CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_docs,
               CAST(count(1) AS BIGINT) AS bg_docs
        FROM dt GROUP BY token),
scored AS (SELECT token AS term, fg_docs, bg_docs,
                  fg_docs / CAST(fg_n AS DOUBLE) AS fg_pct,
                  bg_docs / CAST(bg_n AS DOUBLE) AS bg_pct
           FROM cnt CROSS JOIN tot
           WHERE fg_docs >= {SIG_MIN_FG_DOCS})
SELECT term, fg_docs, bg_docs,
       round(fg_pct, 6) AS fg_pct,
       round(bg_pct, 6) AS bg_pct,
       round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6) AS jlh
FROM scored
WHERE fg_pct > bg_pct
ORDER BY (fg_pct - bg_pct) * (fg_pct / bg_pct) DESC, term
LIMIT {SIG_TERMS_K}
"""
    )


SIG_TERMS_ORACLE = f"""
WITH dt AS (SELECT DISTINCT doc_id, lang = '{SIG_FG_LANG}' AS fg,
                   unnest({DUCK_TOKENS}) AS token
            FROM documents),
tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS bg_n,
               CAST(count(DISTINCT CASE WHEN lang = '{SIG_FG_LANG}'
                                        THEN doc_id END) AS BIGINT) AS fg_n
        FROM documents),
cnt AS (SELECT token,
               CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_docs,
               CAST(count(*) AS BIGINT) AS bg_docs
        FROM dt GROUP BY token),
scored AS (SELECT token AS term, fg_docs, bg_docs,
                  fg_docs / CAST(fg_n AS DOUBLE) AS fg_pct,
                  bg_docs / CAST(bg_n AS DOUBLE) AS bg_pct
           FROM cnt CROSS JOIN tot
           WHERE fg_docs >= {SIG_MIN_FG_DOCS})
SELECT term, fg_docs, bg_docs,
       round(fg_pct, 6) AS fg_pct,
       round(bg_pct, 6) AS bg_pct,
       round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6) AS jlh
FROM scored
WHERE fg_pct > bg_pct
ORDER BY (fg_pct - bg_pct) * (fg_pct / bg_pct) DESC, term
LIMIT {SIG_TERMS_K}
"""


register("docs_significant_terms", docs_significant_terms, SIG_TERMS_ORACLE)
