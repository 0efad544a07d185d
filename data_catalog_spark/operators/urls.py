"""Crawl-URL canonical dedup — the web-pipeline counterpart of the text
near-dup family: the same page is crawled under many raw URL spellings
(host/scheme case, default ports, tracking query params, param order,
trailing slashes, fragments), and training-corpus dedup by exact text
hash misses none of them only AFTER a canonical-URL pass has collapsed
the fetch list.  Canonicalization here follows the common crawler rules
(cf. the RFC 3986 §6 normalization ladder and what Nutch/Heritrix apply
by default):

- scheme and host lowercased
- default port stripped (``:80`` for http, ``:443`` for https; any other
  port is identity-bearing and kept)
- fragment dropped
- tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``),
  remaining params sorted so order never splits a cluster
- trailing slashes stripped from the path (root path stays ``/``)

The URL corpus is derived deterministically from ``documents.doc_id`` in
portable SQL (the ``datasets_source`` recipe: one generation text both
engines evaluate bit-identically), planting every noise class above so
the oracle checks each canonicalization rule, not just the happy path.

Scale shape (100 TB): generation + canonicalization are map-only column
expressions (regex + array ops inside whole-stage codegen — no UDFs, no
driver round-trips); the cluster report is ONE hash aggregation keyed on
the canonical URL with map-side partial aggregation.  Nothing shuffles
except the (canonical_url → stats) rollup, and the published page is a
TakeOrderedAndProject top-k.

No reference counterpart (north-star extension; SURVEY §2.6 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table
from .registry import register

# -- deterministic messy-URL corpus (portable: Spark SQL == DuckDB) ----------
#
# 7 hosts × 11 paths (lcm 77) → real collision clusters even at the
# 500-doc SFs; the noise classes rotate on co-prime moduli so most
# combinations occur.  Scheme is a HOST property (even hosts http, odd
# https) so case/port noise never changes identity; ':8080'
# (doc_id % 17 = 3) is a real non-default port and must survive
# canonicalization as its own cluster key.
# the raw-URL construction as a standalone scalar expression over doc_id,
# so single-pass consumers (host_quality_profile) can inline it next to
# other per-doc columns without a self-join on doc_id
URL_EXPR_SQL = """
       (CASE WHEN doc_id % 19 = 0
             THEN upper(CASE WHEN doc_id % 7 % 2 = 0 THEN 'http' ELSE 'https' END)
             ELSE CASE WHEN doc_id % 7 % 2 = 0 THEN 'http' ELSE 'https' END END)
       || '://'
       || (CASE WHEN doc_id % 5 = 2
                THEN upper('www.site' || CAST(doc_id % 7 AS STRING) || '.com')
                ELSE 'www.site' || CAST(doc_id % 7 AS STRING) || '.com' END)
       || (CASE WHEN doc_id % 17 = 3 THEN ':8080'
                WHEN doc_id % 4 = 1
                THEN CASE WHEN doc_id % 7 % 2 = 0 THEN ':80' ELSE ':443' END
                ELSE '' END)
       || '/p/' || CAST(doc_id % 11 AS STRING)
       || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
       || (CASE doc_id % 6 WHEN 1 THEN '?a=1&b=2'
                           WHEN 2 THEN '?b=2&a=1'
                           WHEN 3 THEN '?utm_source=news&a=1&b=2'
                           WHEN 4 THEN '?a=1'
                           WHEN 5 THEN '?utm_campaign=x'
                           ELSE '' END)
       || (CASE WHEN doc_id % 8 = 2 THEN '#sec' || CAST(doc_id % 4 AS STRING)
                ELSE '' END)
"""

RAW_URLS_SQL = f"""
SELECT doc_id, {URL_EXPR_SQL} AS url
FROM {{docs}}
"""

# Canonicalization twins.  The query is extracted from the DEFRAGGED
# string: '[?]([^#]*)' over the raw URL matches a '?' INSIDE the
# fragment ('/p#a?c' would grow a query 'c') — found by the urllib
# reference fuzz in test_urls, invisible to the oracle gate because both
# engine texts shared the regex.  The regexes are backslash-free ([?] instead of
# \\?) so the pattern text survives both engines' string-literal rules
# unchanged; only the array-function NAMES differ (split/filter/
# array_sort/array_join vs string_split/list_filter/list_sort/
# array_to_string).
_TRACKING = "x LIKE 'utm_%' OR x LIKE 'fbclid=%' OR x LIKE 'gclid=%'"

SPARK_CANON_SQL = f"""
SELECT doc_id, url,
       scheme || '://' || host || path
       || (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canonical_url
FROM (
  SELECT doc_id, url, scheme,
         CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END AS host,
         CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(rawpath, '/+$', '') END AS path,
         array_join(array_sort(filter(split(query, '&'),
                    x -> x != '' AND NOT ({_TRACKING}))), '&') AS qs
  FROM (
    SELECT doc_id, url,
           lower(regexp_extract(url, '^([^:]+)://', 1)) AS scheme,
           lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)) AS hostport,
           regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS rawpath,
           regexp_extract(regexp_replace(url, '#.*$', ''),
                          '[?](.*)', 1) AS query
    FROM raw_urls
  )
)
"""

# DuckDB NULL-vs-'' divergences from Spark, each coalesced below:
# regexp_extract returns NULL (not '') when the pattern misses, and
# array_to_string([]) is NULL where Spark's array_join([]) is '' — a
# query-less URL would otherwise NULL its whole canonical string.
DUCK_CANON_SQL = f"""
SELECT doc_id, url,
       scheme || '://' || host || path
       || (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canonical_url
FROM (
  SELECT doc_id, url, scheme,
         CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END AS host,
         CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(rawpath, '/+$', '') END AS path,
         coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
                  x -> x != '' AND NOT ({_TRACKING}))), '&'), '') AS qs
  FROM (
    SELECT doc_id, url,
           coalesce(lower(regexp_extract(url, '^([^:]+)://', 1)), '') AS scheme,
           coalesce(lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)), '')
             AS hostport,
           coalesce(regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1), '')
             AS rawpath,
           coalesce(regexp_extract(regexp_replace(url, '#.*$', '', 'g'),
                                   '[?](.*)', 1), '') AS query
    FROM raw_urls
  )
)
"""

def spark_canon_expr(url_col: str) -> str:
    """The canonicalization as ONE scalar SQL expression over ``url_col``
    — the streaming form (a stream cannot route through the named-
    subquery text above).  Built from the same regexes and _TRACKING
    filter; test_urls pins it output-equal to SPARK_CANON_SQL on the
    planted corpus AND on the urllib fuzz set."""
    u = url_col
    scheme = f"lower(regexp_extract({u}, '^([^:]+)://', 1))"
    hostport = f"lower(regexp_extract({u}, '^[^:]+://([^/?#]*)', 1))"
    rawpath = f"regexp_extract({u}, '^[^:]+://[^/?#]*([^?#]*)', 1)"
    query = f"regexp_extract(regexp_replace({u}, '#.*$', ''), '[?](.*)', 1)"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    path = (
        f"CASE WHEN regexp_replace({rawpath}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({rawpath}, '/+$', '') END"
    )
    qs = (
        f"array_join(array_sort(filter(split({query}, '&'), "
        f"x -> x != '' AND NOT ({_TRACKING}))), '&')"
    )
    return (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {qs} = '' THEN '' ELSE concat('?', {qs}) END)"
    )


TOP_K = 100


def dedup_canonical_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 canonical-URL clusters: (canonical_url, n_urls,
    n_raw_spellings, keeper_doc_id) ordered by cluster size desc then
    canonical URL — the crawl frontier's 'fetch once' collapse report.
    keeper is the lowest doc_id (first-crawled wins, the usual rule)."""
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("__url_docs")
    raw = RAW_URLS_SQL.format(docs="__url_docs")
    return spark.sql(
        f"""
WITH raw_urls AS ({raw}),
canon AS ({SPARK_CANON_SQL})
SELECT canonical_url,
       CAST(count(1) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_spellings,
       min(doc_id) AS keeper_doc_id
FROM canon
GROUP BY canonical_url
ORDER BY n_urls DESC, canonical_url
LIMIT {TOP_K}
"""
    )


CANONICAL_URL_ORACLE = f"""
WITH raw_urls AS ({RAW_URLS_SQL.format(docs="documents")}),
canon AS ({DUCK_CANON_SQL})
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_spellings,
       min(doc_id) AS keeper_doc_id
FROM canon
GROUP BY canonical_url
ORDER BY n_urls DESC, canonical_url
LIMIT {TOP_K}
"""

register("dedup_canonical_url", dedup_canonical_url, CANONICAL_URL_ORACLE)


# -- the frontier's other half: how much fetch volume does dedup save? -------


def url_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per noise bucket (cluster size), with the fetches a
    canonical-first frontier skips — the publishable 'crawler saved N%'
    summary over the same canonical clusters."""
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("__url_docs")
    raw = RAW_URLS_SQL.format(docs="__url_docs")
    return spark.sql(
        f"""
WITH raw_urls AS ({raw}),
canon AS ({SPARK_CANON_SQL}),
clusters AS (
  SELECT canonical_url, CAST(count(1) AS BIGINT) AS sz
  FROM canon GROUP BY canonical_url
)
SELECT sz AS cluster_size,
       CAST(count(1) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_urls,
       CAST(sum(sz) - count(1) AS BIGINT) AS n_skipped_fetches
FROM clusters
GROUP BY sz
ORDER BY sz
"""
    )


URL_SAVINGS_ORACLE = f"""
WITH raw_urls AS ({RAW_URLS_SQL.format(docs="documents")}),
canon AS ({DUCK_CANON_SQL}),
clusters AS (
  SELECT canonical_url, CAST(count(*) AS BIGINT) AS sz
  FROM canon GROUP BY canonical_url
)
SELECT sz AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_urls,
       CAST(sum(sz) - count(*) AS BIGINT) AS n_skipped_fetches
FROM clusters
GROUP BY sz
ORDER BY sz
"""

register("url_dedup_savings", url_dedup_savings, URL_SAVINGS_ORACLE)


# -- domain-level filtering: per-host quality rollup ---------------------------
#
# The C4/RefinedWeb blocklist stage: document-level quality gates are
# noisy one doc at a time, but hosts are consistent — a domain whose docs
# mostly fail the keep gate is blocklisted wholesale (and conversely a
# good host rescues borderline docs).  This is the report that decides
# the list.
#
# Scale shape: ONE corpus pass (the URL expression and the quality gates
# are columns over the same documents scan — zero joins), then one hash
# aggregation keyed on host (map-side partial agg; |hosts| rows out).

HOST_BLOCK_KEEP_RATE = 0.5  # blocklist a host when under half its docs pass


def _host_profile_sql() -> str:
    """The profile SQL over the ``__hq_docs`` view — a module function so
    tests can drive the same text over planted frames (the synthetic
    corpus passes the keep gate host-wide, so the blocklist branch needs
    its own fixture)."""
    from .text import SPARK_TOKENS, _STOPWORDS, spark_stop_count

    stops = spark_stop_count(_STOPWORDS)
    return f"""
WITH scanned AS (
  SELECT lower(regexp_extract({URL_EXPR_SQL.strip()}, '^[^:]+://([^/?#:]*)', 1))
           AS host,
         {SPARK_TOKENS} AS t,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS DOUBLE)
           / length(text) AS alpha_ratio
  FROM __hq_docs),
gated AS (
  SELECT host, alpha_ratio,
         (size(t) >= 5 AND alpha_ratio >= 0.6
          AND CAST({stops} AS DOUBLE) / size(t) <= 0.5) AS keep
  FROM scanned)
SELECT host,
       CAST(count(1) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(1), 6)
         AS keep_rate,
       round(avg(alpha_ratio), 6) AS avg_alpha_ratio,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(1)
         < {HOST_BLOCK_KEEP_RATE} AS blocklisted
FROM gated
GROUP BY host
ORDER BY host
"""


def host_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, n_docs, n_kept, keep_rate, avg_alpha_ratio, blocklisted)
    per canonical host, ordered by host — the domain-filter decision
    table over the text_quality keep gate."""
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("__hq_docs")
    return spark.sql(_host_profile_sql())


def _host_quality_oracle() -> str:
    from .text import DUCK_TOKENS, _STOPWORDS, duck_stop_count

    stops = duck_stop_count(_STOPWORDS)
    return f"""
WITH scanned AS (
  SELECT lower(regexp_extract({URL_EXPR_SQL.strip()}, '^[^:]+://([^/?#:]*)', 1))
           AS host,
         {DUCK_TOKENS} AS t,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
           AS alpha_ratio
  FROM documents),
gated AS (
  SELECT host, alpha_ratio,
         (len(t) >= 5 AND alpha_ratio >= 0.6
          AND {stops} * 1.0 / len(t) <= 0.5) AS keep
  FROM scanned)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS keep_rate,
       round(avg(alpha_ratio), 6) AS avg_alpha_ratio,
       sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*)
         < {HOST_BLOCK_KEEP_RATE} AS blocklisted
FROM gated
GROUP BY host
ORDER BY host
"""


register("host_quality_profile", host_quality_profile, _host_quality_oracle())


# -- the whole web pipeline as one funnel report --------------------------------
#
# Composition capstone: every curation stage above, chained in the order
# a web corpus actually runs them, with the survivor count after each —
# the one-page report a pipeline owner reads before a training run.
#
#   discovered → canonical-URL dedup (keeper = min doc_id per canonical)
#              → host blocklist (host_quality_profile verdict)
#              → per-doc quality gate (text_quality thresholds)
#              → exact text dedup (md5 over the token stream, keep min id)
#
# Scale shape: the corpus is scanned ONCE into a per-doc frame
# (canonical_url, host, keep, fp) behind a localCheckpoint barrier (the
# docs_boilerplate_ratio multi-consumer rule — the r9 union-of-counts
# version inlined the CTE chain into 28 parquet scans, judge-counted);
# the keeper subset is a second checkpointed frame (one hash agg + one
# semi join over the in-memory per-doc RDD).  The report itself is a
# per-doc MAX-SURVIVING-STAGE label (two doc-keyed left joins, one
# host-keyed agg — all over checkpointed RDDs, zero parquet rescans) and
# ONE cumulative count-down aggregation unpivoted with stack().


def _wf_perdoc_sql() -> str:
    """Everything later stages need, one column expression pass over the
    documents scan: canonical URL (the streaming single-expression twin
    of SPARK_CANON_SQL, pinned output-equal in test_urls), host, the
    text_quality keep gate, and the exact-text fingerprint."""
    from .text import SPARK_TOKENS, _STOPWORDS, spark_stop_count

    stops = spark_stop_count(_STOPWORDS)
    return f"""
SELECT doc_id, canonical_url,
       lower(regexp_extract(canonical_url, '^[^:]+://([^/?#:]*)', 1)) AS host,
       (size(t) >= 5 AND alpha_ratio >= 0.6
        AND CAST({stops} AS DOUBLE) / size(t) <= 0.5) AS keep,
       md5(concat_ws(' ', t)) AS fp
FROM (
  SELECT doc_id, {spark_canon_expr("url")} AS canonical_url, t,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS DOUBLE)
           / length(text) AS alpha_ratio
  FROM (
    SELECT doc_id, text, {URL_EXPR_SQL.strip()} AS url, {SPARK_TOKENS} AS t
    FROM __wf_docs))
"""


_WF_GATED_SQL = """
SELECT p.doc_id, p.host, p.keep, p.fp
FROM __wf_perdoc p
LEFT SEMI JOIN (SELECT min(doc_id) AS doc_id FROM __wf_perdoc
                GROUP BY canonical_url) k
  ON p.doc_id = k.doc_id
"""

_WF_REPORT_SQL = f"""
WITH host_stats AS (
  SELECT host,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(1)
           >= {HOST_BLOCK_KEEP_RATE} AS good
  FROM __wf_gated GROUP BY host),
labeled AS (
  SELECT g.doc_id, g.keep, g.fp, coalesce(h.good, false) AS good
  FROM __wf_gated g LEFT JOIN host_stats h ON g.host = h.host),
winners AS (
  SELECT min(doc_id) AS doc_id FROM labeled WHERE good AND keep GROUP BY fp),
staged AS (
  SELECT CASE WHEN l.doc_id IS NULL THEN 1
              WHEN NOT l.good THEN 2
              WHEN NOT l.keep THEN 3
              WHEN w.doc_id IS NULL THEN 4
              ELSE 5 END AS max_stage
  FROM __wf_perdoc p
  LEFT JOIN labeled l ON p.doc_id = l.doc_id
  LEFT JOIN winners w ON p.doc_id = w.doc_id),
agg AS (
  SELECT CAST(count(1) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN max_stage >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN max_stage >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         CAST(sum(CASE WHEN max_stage >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
         CAST(sum(CASE WHEN max_stage >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS s5
  FROM staged)
SELECT stage, n_docs FROM (
  SELECT stack(5,
           1, 'discovered',    s1,
           2, 'url_deduped',   s2,
           3, 'host_filtered', s3,
           4, 'quality_kept',  s4,
           5, 'text_deduped',  s5) AS (ord, stage, n_docs)
  FROM agg)
ORDER BY ord
"""


def _funnel_oracle_sql() -> str:
    """The DuckDB twin keeps the direct five-CTE chain (DuckDB binds each
    CTE once); the stage semantics are the contract both shapes satisfy:
    stage n counts docs whose max surviving stage is ≥ n."""
    from .text import DUCK_TOKENS, _STOPWORDS, duck_stop_count

    stops = duck_stop_count(_STOPWORDS)
    keep_rate = "sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / count(*)"
    return f"""
WITH scanned AS (
  SELECT doc_id, {URL_EXPR_SQL.strip()} AS url,
         {DUCK_TOKENS} AS t,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
           AS alpha_ratio
  FROM documents),
raw_urls AS (SELECT doc_id, url FROM scanned),
canon AS ({DUCK_CANON_SQL}),
keepers AS (
  SELECT min(doc_id) AS doc_id, canonical_url
  FROM canon GROUP BY canonical_url),
gated AS (
  SELECT s.doc_id, k.canonical_url,
         lower(regexp_extract(k.canonical_url, '^[^:]+://([^/?#:]*)', 1)) AS host,
         (len(t) >= 5 AND alpha_ratio >= 0.6
          AND CAST({stops} AS DOUBLE) / len(t) <= 0.5) AS keep,
         md5(array_to_string(t, ' ')) AS fp
  FROM scanned s JOIN keepers k ON s.doc_id = k.doc_id),
good_hosts AS (
  SELECT host FROM gated GROUP BY host
  HAVING {keep_rate} >= {HOST_BLOCK_KEEP_RATE}),
hosted AS (SELECT g.* FROM gated g JOIN good_hosts USING (host)),
quality AS (SELECT * FROM hosted WHERE keep),
deduped AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY fp)
SELECT stage, n_docs FROM (
  SELECT 1 AS ord, 'discovered' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM scanned
  UNION ALL
  SELECT 2, 'url_deduped', CAST(count(*) AS BIGINT) FROM keepers
  UNION ALL
  SELECT 3, 'host_filtered', CAST(count(*) AS BIGINT) FROM hosted
  UNION ALL
  SELECT 4, 'quality_kept', CAST(count(*) AS BIGINT) FROM quality
  UNION ALL
  SELECT 5, 'text_deduped', CAST(count(*) AS BIGINT) FROM deduped
) ORDER BY ord
"""


def web_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, n_docs) survivor counts through the five web-curation
    stages, in pipeline order.  The documents parquet is scanned exactly
    once (the per-doc frame below); every later stage runs over
    checkpointed in-memory RDDs."""
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("__wf_docs")
    perdoc = spark.sql(_wf_perdoc_sql()).localCheckpoint(eager=False)
    perdoc.createOrReplaceTempView("__wf_perdoc")
    gated = spark.sql(_WF_GATED_SQL).localCheckpoint(eager=False)
    gated.createOrReplaceTempView("__wf_gated")
    return spark.sql(_WF_REPORT_SQL)


register("web_corpus_funnel", web_corpus_funnel, _funnel_oracle_sql())
