"""Local stand-in for the driver's t2 gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at the given SF, compare row count +
column names + order-insensitive value multiset (floats rounded).

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


class NonScalarCell(ValueError):
    """A list/dict cell reached the comparator.  The driver's canonicalizer
    hashes rows with pandas, which cannot factorize list cells (r6 red row:
    event_training_sequences) — so the local gate REJECTS them instead of
    tupling them, keeping it strictly as strict as the driver."""


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, set, dict)):
        raise NonScalarCell(
            f"non-scalar cell {type(v).__name__} — driver cannot hash this"
        )
    return v


def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(norm_cell(r[i]) for i in order) for r in rows], key=repr
    )


def canon_type(t: str) -> str:
    """Collapse a Spark simpleString / DuckDB description type into the
    class the driver's hash effectively distinguishes.  HUGEINT / UHUGEINT /
    DECIMAL deliberately map to their own class: DuckDB's bare SUM(BIGINT)
    widens to HUGEINT, which hash-diverges from Spark bigint even when the
    values are identical (round-7 red rows bpe_train_merges,
    user_activity_streaks) — the value comparison below erases dtype, so
    this check is what keeps the local gate as strict as the driver."""
    t = t.upper()
    if "HUGEINT" in t or t.startswith("DECIMAL"):
        return t  # mismatches every normal class
    for cls, names in (
        ("int", ("BIGINT", "INTEGER", "INT", "SMALLINT", "TINYINT",
                 "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")),
        ("float", ("DOUBLE", "FLOAT", "REAL")),
        ("str", ("VARCHAR", "STRING", "TEXT")),
        ("bool", ("BOOLEAN",)),
        ("ts", ("TIMESTAMP", "TIMESTAMP_NTZ", "TIMESTAMP WITH TIME ZONE")),
        ("date", ("DATE",)),
    ):
        if any(t == n or t.startswith(n) for n in names):
            return cls
    return t


def dtype_problems(spark_schema, con, oracle_sql) -> list[str]:
    """The DB-API ``description`` only reports the generic class NUMBER;
    the real DuckDB type names need a DESCRIBE round-trip."""
    spark_types = {
        f.name.lower(): canon_type(f.dataType.simpleString())
        for f in spark_schema.fields
    }
    out = []
    for name, otype, *_ in con.execute(f"DESCRIBE {oracle_sql}").fetchall():
        stype = spark_types.get(name.lower())
        ocanon = canon_type(str(otype))
        if stype is not None and stype != ocanon:
            out.append(f"dtype {name}: spark {stype} vs oracle {ocanon}")
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    from data_catalog_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if only is not None:
        unknown = sorted(only - set(qs))
        if unknown:
            print(f"ERROR: --only names not in the registry: {unknown}")
            sys.exit(2)
    failures, no_oracle = [], []
    for name, fn in sorted(qs.items()):
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            schema = df.schema
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            no_oracle.append(name)
            print(f"ok?  {name}: {len(rows)} rows (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        problems = []
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            problems.append(f"columns {cols} vs {ocols}")
        try:
            problems.extend(dtype_problems(schema, con, oracles[name]))
        except Exception as ex:
            problems.append(f"dtype probe error: {ex}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        else:
            try:
                mismatch = norm_rows(rows, cols) != norm_rows(orows, ocols)
            except NonScalarCell as ex:
                problems.append(f"non-scalar output: {ex}")
                mismatch = False
            if mismatch:
                got, want = norm_rows(rows, cols), norm_rows(orows, ocols)
                diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: {len(rows)} rows in {time.time()-t0:.1f}s")

    n_run = len(qs) if only is None else len([n for n in qs if n in only])
    print(
        f"\n{n_run - len(failures) - len(no_oracle)} passed, "
        f"{len(failures)} failed, {len(no_oracle)} rows-only"
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
