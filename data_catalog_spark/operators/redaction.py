"""PII redaction over the documents table — a training-data pipeline staple
(scrub emails / phone numbers / IP addresses before a corpus ships).

No reference counterpart (the reference catalogs dataset metadata; scrubbing
the data itself is north-star scope, BASELINE.json).  The driver's synthetic
documents contain no organic PII, so the operator first LACES each document
with deterministic doc_id-derived PII (an email, a phone, an IPv4) and then
redacts it — the regexes are genuinely exercised and the oracle checks both
the match counts and the redacted text byte-for-byte.

Portability constraints baked into the patterns:
- no backslash escapes (``[.]`` not ``\\.``, ``[0-9]`` not ``\\d``) so the
  IDENTICAL pattern string parses in Java regex (Spark) and RE2 (DuckDB)
  without double-escaping drift;
- no lookarounds / backreferences (RE2 has neither);
- DuckDB ``regexp_replace`` is first-match-only by default — the oracle must
  pass the ``'g'`` flag to match Spark's replace-all semantics.

Scale: map-only projection, no shuffle — at 100 TB this runs at scan speed
inside one whole-stage-codegen span (three chained ``regexp_replace`` calls
on the JVM, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

# Literal dots are [.] so the same string is a valid, equivalent pattern in
# both engines with no escape-layer differences.
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
PHONE_RE = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

# Redaction order matters: emails first (their domain part would otherwise
# leave a dotted token the IP pattern could bite on), phones second, bare
# IPs last.
_ORDER = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>")]


def _laced_sql(str_type: str) -> str:
    """Portable SQL: a deterministic PII-laced message per document.

    ``str_type`` is 'STRING' for Spark, 'VARCHAR' for DuckDB — the only
    dialect difference in the whole expression.
    """
    did = f"CAST(doc_id AS {str_type})"
    return (
        "concat(substr(text, 1, 80), ' contact user', " + did + ", "
        "'@mail.example.org or call +1-555-', "
        "lpad(CAST(doc_id % 10000 AS " + str_type + "), 4, '0'), "
        "' from host 10.', CAST(doc_id % 256 AS " + str_type + "), "
        "'.0.', CAST((doc_id * 7) % 256 AS " + str_type + "))"
    )


def docs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII match counts + fully redacted text."""
    laced = F.expr(_laced_sql("STRING"))
    redacted = laced
    for pat, tag in _ORDER:
        redacted = F.regexp_replace(redacted, pat, tag)
    return (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.regexp_extract_all(laced, F.lit(EMAIL_RE), F.lit(0)))
            .cast("long")
            .alias("n_emails"),
            F.size(F.regexp_extract_all(laced, F.lit(PHONE_RE), F.lit(0)))
            .cast("long")
            .alias("n_phones"),
            # count IPs on the email/phone-redacted text, exactly as the
            # redaction chain sees it
            F.size(
                F.regexp_extract_all(
                    F.regexp_replace(
                        F.regexp_replace(laced, EMAIL_RE, "<EMAIL>"),
                        PHONE_RE,
                        "<PHONE>",
                    ),
                    F.lit(IPV4_RE),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("n_ips"),
            redacted.alias("redacted"),
        )
        .orderBy("doc_id")
    )


_LACED_DUCK = _laced_sql("VARCHAR")
PII_REDACT_ORACLE = f"""
WITH laced AS (
  SELECT doc_id, {_LACED_DUCK} AS msg FROM documents
), step AS (
  SELECT doc_id, msg,
         regexp_replace(regexp_replace(msg, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g') AS no_contact
  FROM laced
)
SELECT doc_id,
       CAST(len(regexp_extract_all(msg, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(msg, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(no_contact, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(no_contact, '{IPV4_RE}', '<IP>', 'g') AS redacted
FROM step ORDER BY doc_id
"""


register("docs_pii_redact", docs_pii_redact, PII_REDACT_ORACLE)
