"""Dataset profiling — the operation a data catalog runs when a dataset is
registered: per-column null counts, distinct cardinality, min/max.

The reference stores profile-ish metadata (recordCount, size, dataSample —
metadata_entry.py:48-49,44) that some upstream process computed; this
operator IS that process, Spark-first: ONE pass over the table computing
every column's stats as parallel aggregates (partial/map-side combined),
then pivoted row-per-column with ``stack``.  No per-column scans — at
100 TB, 11 columns profiled costs one scan, not 11.

For exact distinct counts across many columns in one pass Spark plans
an expand (one shuffle per distinct column set); the 100 TB variant swaps
``count_distinct`` → ``approx_count_distinct`` (HLL, single pass, no
expand) — same call shape, bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import read_table
from .registry import register

PROFILE_COLUMNS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
]


def _fmt(col: str, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.format_string("%.4f", F.col(col))
    return F.col(col).cast("string")


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) — one
    row per profiled column, one scan total."""
    df = read_table(spark, sf_dir, "lineitem")
    dtypes = dict(zip(df.schema.fieldNames(), [f.dataType for f in df.schema.fields]))
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLUMNS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
            F.min(_fmt(c, dtypes[c])).alias(f"min_{c}"),
            F.max(_fmt(c, dtypes[c])).alias(f"max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, dist_{c}, min_{c}, max_{c}" for c in PROFILE_COLUMNS
    )
    return one.select(
        F.expr(
            f"stack({len(PROFILE_COLUMNS)}, {stack_args}) "
            "AS (column, n_nulls, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    ).orderBy("column")


def _profile_oracle() -> str:
    # DuckDB side mirrors the formatting: timestamps → strftime seconds,
    # doubles → plain 4-decimal printf.
    parts = []
    for c in PROFILE_COLUMNS:
        if c == "l_shipdate":
            val = f"strftime({c}, '%Y-%m-%d %H:%M:%S')"
        elif c in ("l_quantity", "l_extendedprice", "l_discount"):
            val = f"printf('%.4f', {c})"
        else:
            val = f"CAST({c} AS VARCHAR)"
        parts.append(
            f"SELECT '{c}' AS \"column\", CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
            f"  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,\n"
            f"  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,\n"
            f"  MIN({val}) AS min_value, MAX({val}) AS max_value\n"
            f"FROM lineitem"
        )
    return "\nUNION ALL\n".join(parts) + '\nORDER BY "column"'


register("profile_lineitem", profile_lineitem, _profile_oracle())


# -- correlation / covariance profile ---------------------------------------


def lineitem_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag linear-relationship profile of quantity vs extended
    price: Pearson correlation, sample covariance, and both means — one
    hash-aggregate pass (all four are partial-aggregatable moments, so the
    map-side combine does the heavy lifting at scale)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


CORR_ORACLE = """
SELECT l_returnflag,
       count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


register("lineitem_corr_profile", lineitem_corr_profile, CORR_ORACLE)


# -- language-mix entropy per source -----------------------------------------


def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: document count, distinct languages, and the Shannon
    entropy (nats) of its language distribution — the corpus-composition
    profile a multilingual training mix is tuned against (a source with
    entropy ≈ 0 is monolingual; high entropy = balanced mix).

    Shape: groupBy(source, lang) map-side combines the scan down to a tiny
    (sources × langs) frame; the per-source normalization is a window over
    that frame, not the base table — at 100 TB the heavy aggregate is one
    shuffle and everything after is negligible."""
    from pyspark.sql import Window

    c = (
        read_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("source")
    return (
        c.withColumn("p", F.col("n") / F.sum("n").over(tot))
        .groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.round(F.sum(-F.col("p") * F.log("p")), 6).alias("lang_entropy"),
        )
        .orderBy("source")
    )


LANG_ENTROPY_ORACLE = """
WITH c AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
), p AS (
  SELECT source, n, n / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE) AS p
  FROM c
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       round(sum(-p * ln(p)), 6) AS lang_entropy
FROM p GROUP BY source ORDER BY source
"""


register("source_lang_entropy", source_lang_entropy, LANG_ENTROPY_ORACLE)


# -- declarative data-quality expectations ------------------------------------

# (rule name, SQL predicate over orders that a VIOLATING row satisfies).
# One shared definition renders both engines' queries, like the catalog
# compiler: the expectation suite is DATA, not code.
ORDER_EXPECTATIONS: list[tuple[str, str]] = [
    ("totalprice_positive", "o_totalprice <= 0"),
    ("orderdate_not_null", "o_orderdate IS NULL"),
    ("status_in_domain", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    (
        "priority_format",
        "o_orderpriority NOT IN "
        "('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')",
    ),
]


def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over orders: one row per rule with its
    violation count plus a referential-integrity check (every o_custkey
    resolves to a customer).

    ONE scan evaluates every predicate rule (conditional-sum aggregation —
    adding a rule adds a column expression, not a pass); the FK rule is a
    broadcast-dim anti-join counted in the same job.  This is the
    balance-line pattern of ingest gating at 100 TB: the report is O(rules)
    rows, and nothing is collected but the report itself."""
    o = read_table(spark, sf_dir, "orders")
    rule_aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(name)
        for name, pred in ORDER_EXPECTATIONS
    ]
    wide = o.agg(*rule_aggs)
    # wide (1 row) → long (rule, n_violations) via stack
    n = len(ORDER_EXPECTATIONS)
    stack_args = ", ".join(f"'{name}', {name}" for name, _ in ORDER_EXPECTATIONS)
    long = wide.selectExpr(
        f"stack({n}, {stack_args}) AS (rule, n_violations)"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    fk = (
        o.select("o_custkey")
        .join(F.broadcast(cust), "o_custkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("custkey_resolves").alias("rule"), "n_violations")
    )
    return (
        long.unionByName(fk)
        .select("rule", "n_violations", (F.col("n_violations") == 0).alias("pass"))
        .orderBy("rule")
    )


def _quality_oracle() -> str:
    arms = "\n  UNION ALL\n  ".join(
        f"SELECT '{name}' AS rule, "
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations "
        f"FROM orders"
        for name, pred in ORDER_EXPECTATIONS
    )
    return f"""
WITH rules AS (
  {arms}
  UNION ALL
  SELECT 'custkey_resolves' AS rule,
         CAST(count(*) AS BIGINT) AS n_violations
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
)
SELECT rule, n_violations, n_violations = 0 AS pass
FROM rules ORDER BY rule
"""


register("orders_quality_report", orders_quality_report, _quality_oracle())


# -- per-source duplication rate ----------------------------------------------


def source_dup_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication report: how many of a source's docs are
    copies of content that appears more than once ANYWHERE in the corpus
    (dup_docs), what fraction of the source that is (dup_rate), and how
    many docs a content-level dedup would keep (distinct_fps).  The
    before/after-sizing number every corpus-mixing decision starts from.

    Plan: one md5 fingerprint pass (same normalization as dedup_exact,
    operators/dedup.py:89), a corpus-wide fp count (hash agg with map-side
    partials), then an UNHINTED left join of the duplicated-fp set back
    onto the stream.  No forced broadcast (the duplicated inventory is NOT
    constant-bounded — a heavily duplicated crawl makes it O(n), past any
    fixed broadcast cap): AQE broadcasts when the runtime size allows and
    otherwise shuffle-joins with skew-split available — which is also why
    this is a JOIN and not a window over fp (a window must co-locate every
    copy of a hot fingerprint in one task with no skew mitigation)."""
    from .text import SPARK_TOKENS

    docs = read_table(spark, sf_dir, "documents").select(
        "source", F.md5(F.expr(f"concat_ws(' ', {SPARK_TOKENS})")).alias("fp")
    )
    dup_fps = (
        docs.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select("fp", F.lit(1).alias("is_dup"))
    )
    flagged = docs.join(dup_fps, "fp", "left_outer")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("distinct_fps"),
            F.sum(F.coalesce("is_dup", F.lit(0))).alias("dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "distinct_fps",
            "dup_docs",
            F.round(F.col("dup_docs") / F.col("n_docs"), 6).alias("dup_rate"),
        )
        .orderBy("source")
    )


def _source_dup_oracle() -> str:
    from .text import DUCK_TOKENS

    return f"""
WITH d AS (SELECT source, md5(array_to_string({DUCK_TOKENS}, ' ')) AS fp
           FROM documents),
dups AS (SELECT fp FROM d GROUP BY fp HAVING count(*) > 1)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fp) AS BIGINT) AS distinct_fps,
       CAST(sum(CASE WHEN fp IN (SELECT fp FROM dups) THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_docs,
       round(sum(CASE WHEN fp IN (SELECT fp FROM dups) THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS dup_rate
FROM d GROUP BY source ORDER BY source
"""


register("source_dup_rates", source_dup_rates, _source_dup_oracle())


# -- log-bucketed document length histogram -----------------------------------


def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length histogram over n_chars: bucket = floor(log2),
    reported as [lo, hi) bounds with counts and corpus share — the
    length-distribution profile used to pick chunking windows and spot
    truncated/degenerate documents.  Map-only bucket computation + one
    hash agg; integer log2 via the binary-digit count keeps the Spark side
    exact at bucket boundaries (floor(log2) is exact for DuckDB at these
    magnitudes)."""
    docs = read_table(spark, sf_dir, "documents")
    total = docs.count()  # 1-scalar driver value, reused as a literal
    bucket = F.expr("CAST(length(bin(n_chars)) - 1 AS INT)")
    return (
        docs.where(F.col("n_chars") > 0)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket)").alias("lo_chars"),
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1)").alias("hi_chars"),
            "n_docs",
            F.round(F.col("n_docs") / F.lit(total), 6).alias("share"),
        )
        .orderBy("lo_chars")
    )


DOCS_LENGTH_HIST_ORACLE = """
WITH b AS (
  SELECT CAST(floor(log2(n_chars)) AS INT) AS bucket
  FROM documents WHERE n_chars > 0
),
t AS (SELECT count(*) AS total FROM documents)
SELECT CAST((CAST(1 AS BIGINT) << bucket) AS BIGINT) AS lo_chars,
       CAST((CAST(1 AS BIGINT) << (bucket + 1)) AS BIGINT) AS hi_chars,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) * 1.0 / (SELECT total FROM t), 6) AS share
FROM b GROUP BY bucket ORDER BY lo_chars
"""


register("docs_length_histogram", docs_length_histogram, DOCS_LENGTH_HIST_ORACLE)
