"""Property-based compiler robustness (hypothesis).

The reference's compiler is pure and pre-validates everything
(query_translation.py:245-263) — ours must never crash with anything but
InvalidQueryError, and every successfully compiled query must render to
both backends.  No SparkSession needed: the compiler and both renderers
are pure."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_catalog_spark.errors import InvalidQueryError
from data_catalog_spark.query import DataSetFiltering as M, compile_query
from data_catalog_spark.query import sqlgen

MODES = [M.PRIVATE_AND_PUBLIC, M.ONLY_PRIVATE, M.ONLY_PUBLIC]

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(10**6), 10**6),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda c: st.one_of(st.lists(c, max_size=4), st.dictionaries(st.text(max_size=8), c, max_size=4)),
    max_leaves=10,
)
arbitrary_query = st.dictionaries(st.text(max_size=12), json_values, max_size=5)

valid_fields = st.sampled_from(
    ["category", "format", "orgUUID", "isPublic", "recordCount", "size", "creationTime"]
)


@settings(max_examples=300, deadline=None)
@given(
    q=arbitrary_query,
    orgs=st.lists(st.text(max_size=8), max_size=3),
    mode=st.sampled_from(MODES),
    admin=st.booleans(),
)
def test_compiler_never_crashes_arbitrary_dict(q, orgs, mode, admin):
    """Any dict either compiles or raises InvalidQueryError — nothing else."""
    try:
        cq = compile_query(q, orgs, mode, is_admin=admin)
    except InvalidQueryError:
        return
    # A compiled query must render on both backends.
    assert isinstance(sqlgen.hits_sql(cq), str)
    assert isinstance(sqlgen.total_sql(cq), str)


@settings(max_examples=300, deadline=None)
@given(raw=st.text(max_size=40))
def test_compiler_never_crashes_raw_string(raw):
    """The REST layer passes the raw query string through json.loads —
    arbitrary text must map to InvalidQueryError, never an uncaught parse
    crash (reference: search.py:80-81)."""
    if not raw:
        # empty query string → match-all (query_translation.py:128-129);
        # non-empty whitespace is a JSON parse error like the reference's
        cq = compile_query(raw, [], M.ONLY_PUBLIC, is_admin=False)
        assert "SELECT" in sqlgen.hits_sql(cq)
        return
    try:
        parsed = json.loads(raw)
    except ValueError:
        parsed = None
    if parsed is None:
        with pytest.raises(InvalidQueryError):
            compile_query(raw, [], M.ONLY_PUBLIC, is_admin=False)
    # valid JSON strings go through the dict path covered above


@settings(max_examples=200, deadline=None)
@given(
    field=valid_fields,
    str_values=st.lists(st.text(min_size=1, max_size=10), min_size=1, max_size=4),
    int_values=st.lists(st.integers(0, 10**6), min_size=1, max_size=4),
    bool_value=st.booleans(),
    mode=st.sampled_from(MODES),
)
def test_valid_term_filters_always_compile_and_segregate(
    field, str_values, int_values, bool_value, mode
):
    """Type-correct filters on schema fields always compile and render
    (the P7 segregation invariant: every filter lands in query-filters,
    post-filters, or the or-group — rendering exercises all three)."""
    if field == "creationTime":
        values = ["2014-01-01", "2015-01-01"]
    elif field in ("recordCount", "size"):
        values = int_values
    elif field == "isPublic":
        values = [bool_value]
    else:
        values = str_values
    try:
        cq = compile_query(
            {"filters": [{field: values}]}, ["orgx"], mode, is_admin=False
        )
    except InvalidQueryError:
        # only legal rejection: values that blank out after stringification
        assert all(str(v).strip() == "" for v in values)
        return
    rendered = sqlgen.hits_sql(cq)
    assert isinstance(rendered, str) and "SELECT" in rendered
