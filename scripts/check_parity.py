"""Quick per-query Spark↔DuckDB parity check (the driver-compare mimic).

Usage: python scripts/check_parity.py name1,name2[,...] [sf_dir]
Defaults to sf0.001 for speed; mirrors the driver's canonicalization
(columns sorted by name, rows sorted, 6dp rounding, string compare).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_catalog_spark.session import get_spark  # noqa: E402


def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # round BEFORE sorting: sub-1e-6 cross-engine float noise must not
    # reorder near-equal rows and misalign the row-wise compare
    return df.round(6).sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    names = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    from data_catalog_spark.io import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    rc = 0
    for name in names:
        sdf = qs[name](spark, sf).toPandas()
        odf = con.execute(os_[name]).df()
        a, b = canon(sdf), canon(odf)
        ok_cols = list(a.columns) == list(b.columns)
        ok = len(a) == len(b) and ok_cols and a.astype(str).equals(b.astype(str))
        print(f"{name}: rows={len(a)}/{len(b)} cols_match={ok_cols} vals_match={ok}")
        if not ok:
            rc = 1
            if len(a) == len(b) and ok_cols:
                for c in a.columns:
                    if not a[c].astype(str).equals(b[c].astype(str)):
                        d = a[c].astype(str) != b[c].astype(str)
                        print(
                            f"  col {c}: {a[c][d].head(3).tolist()} vs {b[c][d].head(3).tolist()}"
                        )
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
