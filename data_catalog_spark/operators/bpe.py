"""BPE tokenizer-merge TRAINING as a registered, oracle-checked operator.

``tokenizer_efficiency`` (text.py) measures a FIXED subword scheme; real
LLM pipelines train the merge list.  This operator runs the classic
Sennrich BPE training loop: build a word-frequency vocab in one corpus
pass, then for each of ``N_MERGES`` rounds count adjacent symbol pairs
(weighted by word count), pick the most frequent pair, and apply the
merge.  Output: the learned merge table (rank, first, second, merged,
pair count) — the model a tokenizer would ship.

Scale design (100 TB): the corpus is touched EXACTLY ONCE (token explode →
map-side-combined groupBy → top-V vocab via TakeOrderedAndProject); every
merge round then runs on the constant-size V-row vocab table, so training
cost after the single pass is independent of corpus size — the same
count-once-merge-on-counts structure real BPE trainers use.  The driver
loop is control-only (one winning pair per round, like
corpus._connected_components); the vocab sits behind a lazy
localCheckpoint so round i re-reads materialized rows instead of
re-running the corpus pass.

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

# adjacent symbol pairs of the framed word; guard short words against the
# sequence(1, 0) descending-range trap
_PAIRS = """
if(size(s) > 1,
   transform(sequence(1, size(s) - 1),
             j -> struct(element_at(s, j) AS first,
                         element_at(s, j + 1) AS second)),
   array())
"""


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(SPARK_TOKENS)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(VOCAB_CAP)
    )


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn N_MERGES BPE merges over the documents vocabulary; one row
    per merge: (rank, first, second, merged, cnt)."""
    ws = (
        _vocab(spark, sf_dir)
        .select(
            F.concat(
                F.lit("__"), F.expr("regexp_replace(word, '(.)', '$1__')")
            ).alias("w"),
            "cnt",
        )
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, N_MERGES + 1):
        win = (
            ws.withColumn(
                "s", F.expr("filter(split(w, '_'), x -> x != '')")
            )
            .select(F.explode(F.expr(_PAIRS)).alias("pr"), "cnt")
            .groupBy("pr.first", "pr.second")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "first", "second")
            .limit(1)
            .collect()
        )
        if not win:
            break
        a, b, c = win[0].first, win[0].second, int(win[0].cnt)
        merges.append((rank, a, b, a + b, c))
        ws = ws.withColumn(
            "w", F.expr(f"replace(w, '_{a}__{b}_', '_{a}{b}_')")
        )
        # note: re-barriering the replace chain every K rounds was
        # measured SLOWER (5.0-5.5 s vs 4.8 s at sf0.1) — the checkpoint
        # jobs cost more than the saved lineage re-analysis at N=20
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
