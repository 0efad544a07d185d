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


def _bpe_oracle() -> str:
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
  SELECT pr[1] AS first, pr[2] AS second, SUM(cnt) AS cnt FROM (
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
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, first, second, first || second AS merged, cnt"
        f" FROM win{i}"
        for i in range(1, N_MERGES + 1)
    )
    parts.append(f"m AS ({unions})\nSELECT * FROM m ORDER BY rank")
    return "\n".join(parts)


BPE_ORACLE = _bpe_oracle()

register("bpe_train_merges", bpe_train_merges, BPE_ORACLE)
