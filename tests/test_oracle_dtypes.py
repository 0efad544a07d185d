"""Every registered oracle must emit driver-hashable dtypes.

The driver's canonical value hash is dtype-sensitive: a DuckDB column that
comes back HUGEINT/UHUGEINT/DECIMAL hashes differently from Spark's BIGINT
even when every value is identical (round-7 red rows ``bpe_train_merges``
and ``user_activity_streaks`` — bare ``SUM(BIGINT)`` in DuckDB widens to
HUGEINT).  This probe ``DESCRIBE``s each oracle at sf0.001 (the DB-API
``description`` field only reports the generic class "NUMBER", so the
real type names need DuckDB's DESCRIBE) and rejects the wide types, so
the class can never regress silently again.  Oracles must follow the
``CAST(SUM(...) AS BIGINT)`` discipline (e.g. entries.py:345-351).
"""

from __future__ import annotations

import re

import duckdb
import pytest

from data_catalog_spark.entries import all_oracles

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Types whose pandas/arrow representation diverges from any Spark column
# type: there is no Spark output type that hashes like these.
FORBIDDEN = re.compile(r"HUGEINT|UHUGEINT|DECIMAL", re.IGNORECASE)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _oracle_items():
    return sorted(all_oracles().items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_emits_no_wide_types(con, name, sql):
    cols = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (c[0], c[1]) for c in cols if FORBIDDEN.search(str(c[1]))
    ]
    assert not bad, (
        f"oracle {name} emits driver-unhashable column types {bad}; "
        f"CAST the aggregate to BIGINT/DOUBLE"
    )
