"""Text-analysis operators: oracle parity + semantic spot checks."""

from __future__ import annotations

from data_catalog_spark.operators import text, sessionize

from conftest import assert_same


def test_token_count_parity(spark, sf_dir, ddb):
    assert_same(text.text_token_count(spark, sf_dir), ddb, text.TOKEN_COUNT_ORACLE)


def test_quality_parity(spark, sf_dir, ddb):
    assert_same(text.text_quality(spark, sf_dir), ddb, text._quality_oracle())


def test_langid_parity(spark, sf_dir, ddb):
    assert_same(text.text_langid(spark, sf_dir), ddb, text._langid_oracle())


def test_fingerprint_parity(spark, sf_dir, ddb):
    assert_same(text.text_fingerprint(spark, sf_dir), ddb, text.FINGERPRINT_ORACLE)


def test_langid_predictions_valid(spark, sf_dir):
    rows = text.text_langid(spark, sf_dir).collect()
    langs = {r.lang_pred for r in rows}
    assert langs <= {"en", "de", "es", "fr", "und"}
    # the synthetic corpus is english-ish SQL words — 'the'/'and' dominate
    assert sum(r.lang_pred == "en" for r in rows) > len(rows) * 0.5


def test_quality_keep_consistent(spark, sf_dir):
    for r in text.text_quality(spark, sf_dir).collect():
        expected = r.n_tokens >= 5 and r.alpha_ratio >= 0.6 and r.stop_ratio <= 0.5
        assert r.keep == expected


def test_fingerprint_is_stable_key(spark, sf_dir):
    rows = text.text_fingerprint(spark, sf_dir).collect()
    assert all(len(r.doc_md5) == 32 for r in rows)
    # near-dup docs share min-shingle fingerprints far more often than md5
    assert len({r.doc_md5 for r in rows}) >= len({r.min_shingle_md5 for r in rows})


def test_sessionize_parity(spark, sf_dir, ddb):
    assert_same(
        sessionize.sessionize_events(spark, sf_dir), ddb, sessionize.SESSIONIZE_ORACLE
    )


def test_sessionize_gap_semantics(spark, sf_dir):
    from data_catalog_spark.io import read_table

    sessions = sessionize.sessionize_events(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    # every event lands in exactly one session
    assert sessions.groupBy().sum("n_events").collect()[0][0] == ev.count()


def test_stemmer_three_way_agreement(spark, ddb):
    """Python twin, Spark rendering, and DuckDB rendering of the stem
    chain must agree on plural-folding cases."""
    from pyspark.sql import functions as F

    from data_catalog_spark import analyzers as A

    words = ["widgets", "queries", "classes", "glass", "bus", "s", "window",
             "sses", "ies", "mass", "masses", "radius",
             # step 1b: eed / ed / ing + cleanup (at/bl/iz, undouble, +e)
             "agreed", "feed", "indeed", "plastered", "bled", "motoring",
             "sing", "conflated", "troubled", "sized", "hopped", "fitted",
             "filing", "hoping", "using", "agreeing", "seeing",
             # step 1c: y -> i
             "happy", "sky", "relay",
             # step 2: long suffixes gated on the m>0 proxy
             "relational", "national", "conditional", "organization",
             "activation", "operator", "formalism", "radicalli",
             "effectiveness", "hesitanci", "digitizer",
             # step 3: -icate/-ative/-alize/-iciti/-ical/-ful/-ness
             "triplicate", "formative", "formalize", "electrical",
             "hopeful", "goodness", "useful",
             # step 4 (m>1): derivational suffix drop + *S/*T ion guard,
             # incl. the ment-family longest-suffix dispatch (document/
             # element/monument/argument must NOT overstem via -ent)
             "revival", "allowance", "inference", "airliner", "gyroscopic",
             "adjustable", "defensible", "irritant", "replacement",
             "adjustment", "dependent", "adoption", "communism", "activate",
             "angulariti", "homologous", "effective", "bowdlerize",
             "cement", "region", "nation",
             "document", "element", "monument", "argument", "casement",
             # step 5a/5b: final-e tidy, ll undouble
             "probate", "rate", "cease", "fence", "agree", "free", "axe",
             "file", "use", "controlling", "rolling", "controll", "roll"]
    want = {w: A.stem(w) for w in words}
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = {
        r.w: r.s
        for r in sdf.select("w", F.expr(A.spark_stem_expr("w")).alias("s")).collect()
    }
    assert got_spark == want
    vals = ", ".join(f"('{w}')" for w in words)
    got_duck = dict(
        ddb.execute(
            f"SELECT w, {A.duck_stem_expr('w')} FROM (VALUES {vals}) v(w)"
        ).fetchall()
    )
    assert got_duck == want
    assert want["widgets"] == "widget" and want["queries"] == "queri"


def test_corpus_top_stems_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators.text import TOP_STEMS_ORACLE, corpus_top_stems

    from conftest import assert_same

    assert_same(corpus_top_stems(spark, sf_dir), ddb, TOP_STEMS_ORACLE)


def test_boilerplate_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import text as tx

    assert_same(tx.docs_boilerplate_ratio(spark, sf_dir), ddb, tx.BOILERPLATE_ORACLE)


def test_boilerplate_ratio_bounds(spark, sf_dir):
    from data_catalog_spark.operators import text as tx

    rows = tx.docs_boilerplate_ratio(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.boiler_ratio <= 1.0
        assert r.n_boiler <= r.n_grams
    # the synthetic corpus plants near-dups, so boilerplate must exist
    assert any(r.n_boiler > 0 for r in rows)


def test_repetition_stats_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import text as tx

    assert_same(tx.docs_repetition_stats(spark, sf_dir), ddb, tx.REPETITION_ORACLE)


def test_repetition_stats_semantics(spark, sf_dir):
    """Fracs bounded in [0,1], every doc covered, the gate splits the
    corpus non-trivially, and a hand-built degenerate doc is flagged."""
    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import text as tx

    rows = tx.docs_repetition_stats(spark, sf_dir).collect()
    assert len(rows) == read_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0.0 <= r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)  # the gate does real work on this corpus


def test_repetition_flags_degenerate_doc(spark, tmp_path):
    """'spam spam spam ...' must fail both repetition gates; normal prose
    must pass — checked through the same pipeline on a scratch table."""
    import os

    from data_catalog_spark.operators import text as tx

    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(
        [
            (0, " ".join(["spam"] * 50), "en", "s", 249),
            (1, "the quick brown fox jumps over the lazy dog near a quiet river bank today", "en", "s", 74),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r.doc_id: r for r in tx.docs_repetition_stats(spark, d).collect()}
    assert rows[0].top_bigram_frac == 1.0 and rows[0].dup_trigram_frac == 1.0
    assert not rows[0].keep
    assert rows[1].keep


def test_stemmer_python_duckdb_fuzz(ddb):
    """Property fuzz: the python twin and the DuckDB rendering of the stem
    chain agree on arbitrary lowercase tokens — guards Python-re vs RE2
    semantic drift in the step patterns (no Spark round-trip needed; the
    Spark rendering shares the identical pattern text and is pinned by the
    fixed-vocabulary 3-way test)."""
    from hypothesis import given, settings, strategies as st

    from data_catalog_spark import analyzers as A

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=14))
    def check(w):
        got = ddb.execute(
            f"SELECT {A.duck_stem_expr('w')} FROM (VALUES ('{w}')) v(w)"
        ).fetchone()[0]
        assert got == A.stem(w), w

    check()


def test_stemmer_python_spark_random_batch(spark):
    """Seeded-random batch through the SPARK rendering (one job, 200
    tokens) vs the python twin — the Java-regex side of the same guard."""
    import random

    from pyspark.sql import functions as F

    from data_catalog_spark import analyzers as A

    rng = random.Random(0xF00D)
    words = sorted(
        {
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(1, 14)))
            for _ in range(200)
        }
        | {w + s for w in ("hop", "file", "form", "organ") for s in ("ped", "ing", "ation", "alism", "s")}
    )
    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: r.s for r in sdf.select("w", F.expr(A.spark_stem_expr("w")).alias("s")).collect()}
    want = {w: A.stem(w) for w in words}
    assert got == want


def test_step4_ment_family_no_fallthrough():
    """Porter dispatches on the LONGEST matching suffix and stops when its
    condition fails; the chain must not fall through ement→ment→ent and
    overstem (document stayed 'document' in Porter, not 'docum')."""
    from data_catalog_spark import analyzers as A

    assert A.stem("document") == "document"
    assert A.stem("element") == "element"
    assert A.stem("monument") == "monument"
    assert A.stem("argument") == "argument"
    assert A.stem("replacement") == "replac"
    assert A.stem("adjustment") == "adjust"
    assert A.stem("dependent") == "depend"


def test_source_language_profile_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import text as tx

    assert_same(tx.source_language_profile(spark, sf_dir), ddb, tx._source_lang_oracle())


def test_source_language_profile_shares_sum_to_one(spark, sf_dir):
    from collections import defaultdict

    from data_catalog_spark.operators import text as tx

    rows = tx.source_language_profile(spark, sf_dir).collect()
    assert rows
    by_source = defaultdict(float)
    for r in rows:
        assert r.lang in {"en", "de", "es", "fr", "und"}
        assert r.n_docs > 0
        by_source[r.source] += r.share
    for total in by_source.values():
        assert abs(total - 1.0) < 1e-5


# -- winnowing fingerprints ---------------------------------------------------


def test_winnowing_parity(spark, sf_dir, ddb):
    assert_same(
        text.docs_winnowing_fingerprints(spark, sf_dir), ddb, text.WINNOW_ORACLE
    )


def _winnow_fingerprints(spark, rows):
    """Run the winnowing selection on a crafted corpus; returns
    {doc_id: set of fingerprint hashes}."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(text.WINNOW_W - 1), 0)
    )
    got = (
        docs.withColumn("t", F.expr(text.SPARK_TOKENS))
        .select("doc_id", F.explode(F.expr(text._SPARK_POS_HASHES)).alias("ph"))
        .select(
            "doc_id",
            F.col("ph.pos").alias("pos"),
            (
                F.col("ph.h") * text._POS_BASE
                + (text._POS_BASE - F.col("ph.pos"))
            ).alias("key"),
        )
        .withColumn("mk", F.min("key").over(win))
        .where(F.col("pos") >= text.WINNOW_W)
        .select("doc_id", F.expr(f"mk div {text._POS_BASE}").alias("fp"))
        .distinct()
        .collect()
    )
    out = {}
    for r in got:
        out.setdefault(r.doc_id, set()).add(r.fp)
    return out


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """The MOSS guarantee: a shared token run of length >= W + N − 1
    (= 6 here) must yield at least one COMMON fingerprint hash between
    the two documents, wherever the run sits in each."""
    shared = "quick brown foxes jump over lazy"  # 6 tokens
    rows = [
        (0, f"prefix words here then {shared} and a suffix"),
        (1, f"{shared} starts this one with another ending entirely"),
        (2, "completely different content with no overlap at all present"),
    ]
    fps = _winnow_fingerprints(spark, rows)
    assert fps[0] & fps[1], "shared 6-token run produced no common fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])


def test_winnowing_density_near_theory(spark, sf_dir):
    """Winnowing keeps ~2/(w+1) of positions on random-ish text; assert
    the corpus mean sits in a generous band around 0.4."""
    rows = text.docs_winnowing_fingerprints(spark, sf_dir).collect()
    mean = sum(r.density for r in rows) / len(rows)
    assert 0.25 <= mean <= 0.55, mean


# -- tokenizer efficiency -----------------------------------------------------


def test_tokenizer_efficiency_parity(spark, sf_dir, ddb):
    assert_same(
        text.tokenizer_efficiency(spark, sf_dir),
        ddb,
        text.TOKENIZER_EFFICIENCY_ORACLE,
    )


def test_tokenizer_efficiency_sane(spark, sf_dir):
    """Fertility ≥ 1 (a word is at least one subword under BPE_PATTERN's
    space-prefixed-run segmentation) and chars_per_subword is positive
    and below the longest plausible run."""
    rows = text.tokenizer_efficiency(spark, sf_dir).collect()
    assert rows, "no (source, lang) groups"
    for r in rows:
        assert r.n_docs > 0 and r.n_words > 0 and r.n_subwords > 0
        assert r.fertility >= 1.0
        assert 0 < r.chars_per_subword < 40


def test_significant_terms_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import text as t

    assert_same(
        t.docs_significant_terms(spark, sf_dir), ddb, t.SIG_TERMS_ORACLE
    )


def test_significant_terms_are_overrepresented(spark, sf_dir):
    """Every reported term must actually be overrepresented in the
    foreground (jlh > 0 ⇔ fg_pct > bg_pct) and respect min_doc_count."""
    from data_catalog_spark.operators import text as t

    rows = t.docs_significant_terms(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.fg_docs >= t.SIG_MIN_FG_DOCS
        assert r.fg_pct > r.bg_pct
        assert r.jlh > 0
