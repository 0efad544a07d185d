"""Differential query fuzz: a random (filter, group-by, aggregates) spec is
rendered to BOTH engines from one structure — the analytics-side analog of
the compiler fuzz (there the shared IR is the query compiler; here it is
the spec tuple).  Catches cross-engine drift in null handling, aggregate
typing, and filter boundary semantics that a fixed query set can miss.

Determinism rules follow the repo conventions: SUM/AVG over doubles go
through DECIMAL(18,4) so accumulation is order-independent, float outputs
round to 6dp, counts are BIGINT."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
AGGS = ["sum", "avg", "min", "max", "count"]

spec_st = st.fixed_dictionaries(
    {
        "group": st.sampled_from(GROUP_COLS),
        "agg": st.sampled_from(AGGS),
        "val": st.sampled_from(NUM_COLS),
        "filter_col": st.sampled_from(NUM_COLS + [None]),
        "cut": st.integers(min_value=0, max_value=60),
        "op": st.sampled_from(["<", "<=", ">", ">="]),
    }
)


def _spark_query(spark, sf_dir, spec):
    from pyspark.sql import functions as F

    from data_catalog_spark.io import read_table

    df = read_table(spark, sf_dir, "lineitem")
    if spec["filter_col"]:
        df = df.where(f"{spec['filter_col']} {spec['op']} {spec['cut']}")
    v = F.col(spec["val"]).cast("decimal(18,4)")
    agg = {
        "sum": F.round(F.sum(v).cast("double"), 6),
        # divide as doubles: decimal-quotient SCALE rules differ between
        # engines; the numerator is still the order-independent decimal sum
        "avg": F.round(F.sum(v).cast("double") / F.count(v), 6),
        "min": F.round(F.min(F.col(spec["val"])), 6),
        "max": F.round(F.max(F.col(spec["val"])), 6),
        "count": F.count(F.lit(1)),
    }[spec["agg"]]
    return (
        df.groupBy(spec["group"])
        .agg(agg.alias("m"))
        .orderBy(spec["group"])
    )


def _duck_sql(spec):
    where = (
        f"WHERE {spec['filter_col']} {spec['op']} {spec['cut']}"
        if spec["filter_col"]
        else ""
    )
    v = f"CAST({spec['val']} AS DECIMAL(18,4))"
    expr = {
        "sum": f"round(CAST(SUM({v}) AS DOUBLE), 6)",
        "avg": f"round(CAST(SUM({v}) AS DOUBLE) / COUNT({spec['val']}), 6)",
        "min": f"round(MIN({spec['val']}), 6)",
        "max": f"round(MAX({spec['val']}), 6)",
        "count": "CAST(COUNT(*) AS BIGINT)",
    }[spec["agg"]]
    return (
        f"SELECT {spec['group']}, {expr} AS m FROM lineitem {where} "
        f"GROUP BY {spec['group']} ORDER BY {spec['group']}"
    )


@settings(max_examples=25, deadline=None)
@given(spec=spec_st)
def test_random_group_agg_specs_agree(spark, sf_dir, ddb, spec):
    got = [
        (r[0], round(r.m, 6) if isinstance(r.m, float) else r.m)
        for r in _spark_query(spark, sf_dir, spec).collect()
    ]
    want = [
        (a, round(b, 6) if isinstance(b, float) else b)
        for a, b in ddb.execute(_duck_sql(spec)).fetchall()
    ]
    assert got == want, spec


# -- join fuzz: random (join-type, filtered dim, agg) specs -------------------
# The join analog of the spec fuzz above: lineitem ⋈ orders on the order key
# under a randomized join type / dim-side filter / aggregate, rendered to both
# engines from one spec.  Catches cross-engine drift in outer-join null
# semantics, join-key type coercion, and post-join aggregate typing.

JOIN_TYPES = ["inner", "left", "right"]
ORD_FILTER_COLS = ["o_orderstatus", "o_orderpriority"]

join_spec_st = st.fixed_dictionaries(
    {
        "jt": st.sampled_from(JOIN_TYPES),
        "filter_col": st.sampled_from(ORD_FILTER_COLS + [None]),
        "pick": st.integers(min_value=0, max_value=4),
        "agg": st.sampled_from(["sum", "count"]),
        "group": st.sampled_from(["l_returnflag", "o_orderstatus"]),
    }
)

_FILTER_VALUES = {
    "o_orderstatus": ["F", "O", "P", "F", "O"],
    "o_orderpriority": [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ],
}


def _join_frames(spark, sf_dir, spec):
    from pyspark.sql import functions as F

    from data_catalog_spark.io import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    od = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    if spec["filter_col"]:
        od = od.where(
            F.col(spec["filter_col"]) == _FILTER_VALUES[spec["filter_col"]][spec["pick"]]
        )
    j = li.join(od, li.l_orderkey == od.o_orderkey, spec["jt"])
    v = F.col("l_quantity").cast("decimal(18,4)")
    agg = (
        F.round(F.sum(v).cast("double"), 6)
        if spec["agg"] == "sum"
        else F.count(F.lit(1))
    )
    return (
        j.groupBy(spec["group"])
        .agg(agg.alias("m"))
        .orderBy(F.col(spec["group"]).asc_nulls_first())
    )


def _join_duck_sql(spec):
    jt = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN"}[spec["jt"]]
    dim = "orders"
    if spec["filter_col"]:
        val = _FILTER_VALUES[spec["filter_col"]][spec["pick"]]
        dim = f"(SELECT * FROM orders WHERE {spec['filter_col']} = '{val}')"
    agg = (
        "round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)"
        if spec["agg"] == "sum"
        else "CAST(COUNT(*) AS BIGINT)"
    )
    return (
        f"SELECT {spec['group']}, {agg} AS m "
        f"FROM lineitem {jt} {dim} o ON l_orderkey = o.o_orderkey "
        f"GROUP BY {spec['group']} ORDER BY {spec['group']} NULLS FIRST"
    )


@settings(max_examples=20, deadline=None)
@given(spec=join_spec_st)
def test_random_join_specs_agree(spark, sf_dir, ddb, spec):
    got = [
        (r[0], round(r.m, 6) if isinstance(r.m, float) else r.m)
        for r in _join_frames(spark, sf_dir, spec).collect()
    ]
    want = [
        (a, round(b, 6) if isinstance(b, float) else b)
        for a, b in ddb.execute(_join_duck_sql(spec)).fetchall()
    ]
    assert got == want, spec
