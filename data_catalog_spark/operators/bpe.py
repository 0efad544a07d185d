"""BPE tokenizer-merge TRAINING as a registered, oracle-checked operator.

``tokenizer_efficiency`` (text.py) measures a FIXED subword scheme; real
LLM pipelines train the merge list.  This operator runs the classic
Sennrich BPE training loop: build a word-frequency vocab in one corpus
pass, then for each of ``N_MERGES`` rounds count adjacent symbol pairs
(weighted by word count), pick the most frequent pair, and apply the
merge.  Output: the learned merge table (rank, first, second, merged,
pair count) — the model a tokenizer would ship.

Scale design (100 TB): the corpus is touched EXACTLY ONCE (token explode →
map-side-combined groupBy → top-V vocab via TakeOrderedAndProject); the
merge rounds then run on the constant ``VOCAB_CAP``-row count table —
MODEL state, the same class as k-means centroids — driver-side in exact
integer arithmetic, so training cost after the single distributed pass is
independent of corpus size.  This count-once-merge-on-counts split is the
structure real BPE trainers use.  Two rejected alternatives, both
measured: (a) one Spark statement per merge round pays ~20 job latencies
on a 1024-row table (2.9-4.4 s of almost pure fixed overhead at sf0.1);
(b) rendering all rounds as ONE multi-CTE statement (the oracle's shape)
sends Spark's analyzer superlinear — the 20-round chain exceeds the
100-iteration resolution fixed point, and with the cap raised analysis
still ran >120 s, because Spark, unlike DuckDB, has no ``MATERIALIZED``
CTE barrier to stop scalar-subquery re-expansion.

Cross-engine determinism: word state is a delimiter-framed string
(``"ab" -> "__a__b__"`` with '_' — impossible in [a-z0-9]+ tokens), so a
merge is a plain ``replace(w, '_a__b_', '_ab_')``: both engines scan
left-to-right non-overlapping, and the double delimiter leaves one '_'
for the neighboring pair, which reproduces BPE's greedy tiling exactly
(``"a a a" -> "aa a"``, ``"a b a b" -> "ab ab"``).  Pair counts are exact
bigints; ties break lexicographically on (first, second) — identical
ASCII collation both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register
from .text import DUCK_TOKENS, SPARK_TOKENS

VOCAB_CAP = 1024  # top-V words by (count desc, word) enter training
N_MERGES = 20

def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(SPARK_TOKENS)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(VOCAB_CAP)
    )


def _merge_rounds(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """The merge loop over the framed (word, count) model table, in plain
    exact-integer python.  Semantics are the engine-portable definition in
    the module docstring: pair counts are Σ cnt over adjacent symbols of
    the '_'-framed word; the winner is (cnt DESC, first, second) — ASCII
    collation, identical in python / Spark / DuckDB; the merge is
    left-to-right non-overlapping ``str.replace``, exactly what SQL
    ``replace`` does.  The DuckDB oracle replays these rounds in SQL, so
    the gate checks this loop's every round, not just its output shape."""
    ws = [
        ("__" + "".join(ch + "__" for ch in word), cnt) for word, cnt in vocab
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, cnt in ws:
            s = [x for x in w.split("_") if x]
            for j in range(len(s) - 1):
                pr = (s[j], s[j + 1])
                counts[pr] = counts.get(pr, 0) + cnt
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, c))
        ws = [
            (w.replace(f"_{a}__{b}_", f"_{a}{b}_"), cnt) for w, cnt in ws
        ]
    return merges


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn N_MERGES BPE merges over the documents vocabulary; one row
    per merge: (rank, first, second, merged, cnt).  One distributed
    corpus pass builds the capped vocab (the model table); the rounds run
    in ``_merge_rounds`` on that bounded state."""
    vocab = [(r.word, int(r.cnt)) for r in _vocab(spark, sf_dir).collect()]
    merges = _merge_rounds(vocab, N_MERGES)
    return spark.createDataFrame(
        merges, "rank int, first string, second string, merged string, cnt bigint"
    )


def _train_ctes() -> str:
    """The shared DuckDB training CTE chain (toks → vocab → ws0 → per-round
    p{i}/win{i}/ws{i}), ending with a trailing comma so both oracles append
    their own CTEs.  Factored (rather than string-sliced from the rendered
    SQL) so a reformat of one oracle cannot silently truncate the other.
    ``CAST(SUM(cnt) AS BIGINT)`` keeps the pair counts BIGINT — DuckDB's
    bare SUM(BIGINT) is HUGEINT, which hash-diverges from Spark's bigint
    even when values are identical (round-7 driver red row)."""
    parts = [
        f"""WITH toks AS (SELECT unnest({DUCK_TOKENS}) AS word FROM documents),
vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
          GROUP BY word ORDER BY cnt DESC, word LIMIT {VOCAB_CAP}),
ws0 AS MATERIALIZED (
  SELECT '__' || regexp_replace(word, '(.)', '\\1__', 'g') AS w, cnt
  FROM vocab),"""
    ]
    for i in range(1, N_MERGES + 1):
        parts.append(
            f"""p{i} AS (
  SELECT pr[1] AS first, pr[2] AS second, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT unnest([[s[j], s[j + 1]] for j in range(1, len(s))]) AS pr, cnt
    FROM (SELECT list_filter(string_split(w, '_'), x -> x <> '') AS s, cnt
          FROM ws{i - 1}))
  GROUP BY 1, 2),
win{i} AS MATERIALIZED (SELECT first, second, cnt FROM p{i}
           ORDER BY cnt DESC, first, second LIMIT 1),
ws{i} AS MATERIALIZED (SELECT replace(w,
    COALESCE((SELECT '_' || first || '__' || second || '_' FROM win{i}), '~'),
    COALESCE((SELECT '_' || first || second || '_' FROM win{i}), '~')) AS w,
    cnt FROM ws{i - 1}),"""
        )
    return "\n".join(parts)


def _bpe_oracle() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, first, second, first || second AS merged, cnt"
        f" FROM win{i}"
        for i in range(1, N_MERGES + 1)
    )
    return f"{_train_ctes()}\nm AS ({unions})\nSELECT * FROM m ORDER BY rank"


BPE_ORACLE = _bpe_oracle()

register("bpe_train_merges", bpe_train_merges, BPE_ORACLE)


# -- encoding: apply the learned merges to the whole corpus --------------------
#
# The application half of the tokenizer lifecycle: segment EVERY corpus word
# with the trained merge list and report per-source compression.  Encoding
# is O(distinct words × N_MERGES) — the corpus is touched once to build the
# (source, doc_id, word) stream and once more only as a hash join against
# the word→subword-count table, so at 100 TB the replace chain runs over
# the (much smaller) distinct-word table, never per occurrence.


def _framed(col: str) -> str:
    return f"'__' || regexp_replace({col}, '(.)', '$1__')"


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_words, n_subwords, avg_per_word): corpus-wide
    subword statistics under the merges learned by ``bpe_train_merges``
    (re-trained in the same run — one engine, training and application)."""
    merges = [
        (r.first, r.second)
        for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    enc = _framed("word")
    for a, b in merges:
        enc = f"replace({enc}, '_{a}__{b}_', '_{a}{b}_')"
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("__bpe_docs")
    return spark.sql(
        f"""
WITH toks AS (SELECT doc_id, source, {SPARK_TOKENS} AS t FROM __bpe_docs),
stream AS (SELECT doc_id, source, explode(t) AS word FROM toks),
words AS (SELECT DISTINCT word FROM stream),
wq AS (SELECT word,
       CAST(size(filter(split({enc}, '_'), x -> x != '')) AS BIGINT) AS n_sub
       FROM words)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       round(sum(n_sub) / count(*), 6) AS avg_per_word
FROM stream JOIN wq USING (word)
GROUP BY source ORDER BY source
"""
    )


def _bpe_encode_oracle() -> str:
    """Replays training (the shared ``_train_ctes()`` chain) and then
    applies each round's winning merge to the FULL distinct-word table via
    the same data-driven replace chain — no literals, the oracle re-derives
    the merges itself."""
    parts = [
        _train_ctes(),
        """stream AS (SELECT doc_id, source, unnest({toks}) AS word FROM documents),
words AS (SELECT DISTINCT word FROM stream),
ew0 AS (SELECT word, '__' || regexp_replace(word, '(.)', '\\1__', 'g') AS w
        FROM words),""".replace("{toks}", DUCK_TOKENS),
    ]
    for i in range(1, N_MERGES + 1):
        parts.append(
            f"""ew{i} AS MATERIALIZED (SELECT word, replace(w,
    COALESCE((SELECT '_' || first || '__' || second || '_' FROM win{i}), '~'),
    COALESCE((SELECT '_' || first || second || '_' FROM win{i}), '~')) AS w
    FROM ew{i - 1}),"""
        )
    parts.append(
        f"""wq AS (SELECT word,
    CAST(len(list_filter(string_split(w, '_'), x -> x <> '')) AS BIGINT) AS n_sub
    FROM ew{N_MERGES})
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       round(sum(n_sub) / count(*), 6) AS avg_per_word
FROM stream JOIN wq USING (word)
GROUP BY source ORDER BY source"""
    )
    return "\n".join(parts)


BPE_ENCODE_ORACLE = _bpe_encode_oracle()

register("bpe_encode_corpus", bpe_encode_corpus, BPE_ENCODE_ORACLE)


# -- tokenizer fertility per (source, lang) cell -------------------------------
#
# The mixture-design artifact real pipelines read before fixing source
# weights (r10 verdict ask #6): per (source, language) cell, how well the
# TRAINED tokenizer fits that slice — fertility (subword tokens per word),
# bytes per token (compression), and the OOV rate (fraction of word
# occurrences the merge list cannot reduce to a single vocab unit — with
# open-vocab BPE nothing is truly out-of-vocabulary, so "still multi-piece
# after all merges" is the standard fertility-style proxy).  A cell whose
# fertility/bytes-per-token is far off the corpus mean is a cell the
# tokenizer underserves — the signal used to rebalance training mixtures
# or retrain the vocab.  Same scale shape as bpe_encode_corpus: ONE corpus
# pass builds the (source, lang, word) stream; the merge-replace chain runs
# on the DISTINCT-word table only; the final report is one grouped
# aggregation joined through the word table.


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, lang, n_docs, n_words, n_subwords, fertility,
    bytes_per_token, oov_rate) under the merges learned by
    ``bpe_train_merges`` — the per-cell tokenizer-fit report."""
    merges = [
        (r.first, r.second)
        for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    enc = _framed("word")
    for a, b in merges:
        enc = f"replace({enc}, '_{a}__{b}_', '_{a}{b}_')"
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("__bpe_docs")
    return spark.sql(
        f"""
WITH toks AS (SELECT doc_id, source, lang, {SPARK_TOKENS} AS t FROM __bpe_docs),
stream AS (SELECT doc_id, source, lang, explode(t) AS word FROM toks),
words AS (SELECT DISTINCT word FROM stream),
wq AS (SELECT word,
       CAST(size(filter(split({enc}, '_'), x -> x != '')) AS BIGINT) AS n_sub,
       CAST(octet_length(word) AS BIGINT) AS n_bytes
       FROM words)
SELECT source, lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       round(sum(n_sub) / count(*), 6) AS fertility,
       round(sum(n_bytes) / sum(n_sub), 6) AS bytes_per_token,
       round(sum(CASE WHEN n_sub > 1 THEN 1 ELSE 0 END) / count(*), 6)
           AS oov_rate
FROM stream JOIN wq USING (word)
GROUP BY source, lang ORDER BY source, lang
"""
    )


def _fertility_oracle() -> str:
    """Shares ``_bpe_encode_oracle``'s structure: replay training, apply
    the data-driven merge chain to the distinct-word table, then the
    per-(source, lang) grouped report.  ``strlen`` = BYTE length in DuckDB
    (its ``length`` counts characters), matching Spark's octet_length."""
    parts = [
        _train_ctes(),
        """stream AS (SELECT doc_id, source, lang, unnest({toks}) AS word
        FROM documents),
words AS (SELECT DISTINCT word FROM stream),
ew0 AS (SELECT word, '__' || regexp_replace(word, '(.)', '\\1__', 'g') AS w
        FROM words),""".replace("{toks}", DUCK_TOKENS),
    ]
    for i in range(1, N_MERGES + 1):
        parts.append(
            f"""ew{i} AS MATERIALIZED (SELECT word, replace(w,
    COALESCE((SELECT '_' || first || '__' || second || '_' FROM win{i}), '~'),
    COALESCE((SELECT '_' || first || second || '_' FROM win{i}), '~')) AS w
    FROM ew{i - 1}),"""
        )
    parts.append(
        f"""wq AS (SELECT word,
    CAST(len(list_filter(string_split(w, '_'), x -> x <> '')) AS BIGINT) AS n_sub,
    CAST(strlen(word) AS BIGINT) AS n_bytes
    FROM ew{N_MERGES})
SELECT source, lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       round(sum(n_sub) / count(*), 6) AS fertility,
       round(sum(n_bytes) / sum(n_sub), 6) AS bytes_per_token,
       round(sum(CASE WHEN n_sub > 1 THEN 1 ELSE 0 END) / count(*), 6)
           AS oov_rate
FROM stream JOIN wq USING (word)
GROUP BY source, lang ORDER BY source, lang"""
    )
    return "\n".join(parts)


register("tokenizer_fertility", tokenizer_fertility, _fertility_oracle())
