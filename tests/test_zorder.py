"""Z-order (Morton) two-dimensional data-skipping layout."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_catalog_spark.io import read_table, write_clustered, write_zordered, zorder_key


def _files_admitting(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(n_admitting, n_total): files whose footer [min,max] of ``col``
    intersects [lo, hi] — what a stats-pruning scan would have to read."""
    admitting = total = 0
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        total += 1
        pf = pq.ParquetFile(os.path.join(path, f))
        fmin = fmax = None
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmax >= lo and fmin <= hi:
            admitting += 1
    return admitting, total


def test_zorder_key_interleaves():
    # spot values: x=0b11, y=0b01 → z = x0@0 | y0@1 | x1@2 | y1@3 = 0b0111
    from pyspark.sql import Row

    from data_catalog_spark.session import get_spark

    spark = get_spark(app_name="zkey", master="local[2]", shuffle_partitions=2)
    df = spark.createDataFrame([Row(x=3, y=1)])
    z = df.select(zorder_key(F.col("x"), F.col("y"), bits=4).alias("z")).first().z
    assert z == 0b0111


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files prune on BOTH part/supp keys; a linear sort on
    partkey cannot prune on suppkey."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", bits=8, n_files=16)
    write_clustered(li, lpath, ["l_partkey"], n_files=16)

    # identical content
    assert spark.read.parquet(zpath).count() == li.count()

    maxp = li.agg(F.max("l_partkey")).first()[0]
    maxs = li.agg(F.max("l_suppkey")).first()[0]

    # narrow slice on each dimension (bottom ~6% of the key range)
    zp, zt = _files_admitting(zpath, "l_partkey", 0, maxp * 0.06)
    zs, _ = _files_admitting(zpath, "l_suppkey", 0, maxs * 0.06)
    lp, lt = _files_admitting(lpath, "l_partkey", 0, maxp * 0.06)
    ls, _ = _files_admitting(lpath, "l_suppkey", 0, maxs * 0.06)

    assert lp < lt  # linear prunes its own sort column…
    assert ls == lt  # …but reads EVERY file for the other dimension
    assert zp < zt and zs < zt  # z-order prunes on both
    assert zs < ls  # and strictly beats linear on the non-sort column
