"""Golden tests for the query compiler — ports the semantics of the
reference's 17 ddt cases (tests/test_query_translation.py:36-383,438-567)
onto the backend-neutral IR."""

from __future__ import annotations

import pytest

from data_catalog_spark.errors import InvalidQueryError
from data_catalog_spark.query import (
    CompiledQuery,
    DataSetFiltering as M,
    OrGroup,
    RangeFilter,
    TermsFilter,
    compile_query,
)

ORGS = ["org01", "org02"]


def test_empty_query_private_and_public():
    cq = compile_query({}, ORGS, M.PRIVATE_AND_PUBLIC, is_admin=False)
    assert cq.text is None
    assert cq.post_filters == ()
    assert cq.query_filters == (
        OrGroup(
            (
                TermsFilter("orgUUID", ("org01", "org02")),
                TermsFilter("isPublic", (True,)),
            )
        ),
    )
    assert (cq.from_, cq.size) == (0, 10)
    assert not cq.explicit_pagination


def test_single_format_filter_is_post_filter():
    cq = compile_query({"filters": [{"format": ["csv"]}]}, ORGS, M.PRIVATE_AND_PUBLIC, False)
    assert cq.post_filters == (TermsFilter("format", ("csv",)),)
    assert isinstance(cq.query_filters[0], OrGroup)


def test_multi_value_category_filter():
    cq = compile_query(
        {"filters": [{"category": ["health", "finance"]}]}, ORGS, M.PRIVATE_AND_PUBLIC, False
    )
    assert cq.post_filters == (TermsFilter("category", ("health", "finance")),)


def test_multiple_filters_are_anded():
    cq = compile_query(
        {"filters": [{"format": ["csv"]}, {"category": ["health"]}]},
        ORGS,
        M.PRIVATE_AND_PUBLIC,
        False,
    )
    assert cq.post_filters == (
        TermsFilter("format", ("csv",)),
        TermsFilter("category", ("health",)),
    )


def test_values_lowercased_at_compile_time():
    cq = compile_query({"filters": [{"format": ["CSV"]}]}, ORGS, M.PRIVATE_AND_PUBLIC, False)
    assert cq.post_filters == (TermsFilter("format", ("csv",)),)


def test_time_range_closed_is_query_filter():
    cq = compile_query(
        {"filters": [{"creationTime": ["2014-05-18", "2014-11-03"]}]},
        ORGS,
        M.PRIVATE_AND_PUBLIC,
        False,
    )
    assert cq.query_filters[0] == RangeFilter("creationTime", "2014-05-18", "2014-11-03")


@pytest.mark.parametrize(
    "values,lo,hi",
    [
        ([-1, "2014-11-03"], None, "2014-11-03"),
        (["2014-05-18", -1], "2014-05-18", None),
    ],
)
def test_time_range_open_ends(values, lo, hi):
    cq = compile_query({"filters": [{"creationTime": values}]}, ORGS, M.PRIVATE_AND_PUBLIC, False)
    assert cq.query_filters[0] == RangeFilter("creationTime", lo, hi)


def test_only_public_ignores_orgs():
    cq = compile_query({"filters": [{"format": ["csv"]}]}, ORGS, M.ONLY_PUBLIC, False)
    assert cq.query_filters == (TermsFilter("isPublic", (True,)),)
    assert cq.post_filters == (TermsFilter("format", ("csv",)),)


def test_only_private_non_admin():
    cq = compile_query({}, ORGS, M.ONLY_PRIVATE, False)
    assert cq.query_filters == (
        TermsFilter("orgUUID", ("org01", "org02")),
        TermsFilter("isPublic", (False,)),
    )


def test_only_private_admin_without_orgs_skips_org_filter():
    cq = compile_query({}, [], M.ONLY_PRIVATE, True)
    assert cq.query_filters == (TermsFilter("isPublic", (False,)),)


def test_private_and_public_admin_without_orgs_bypasses_security():
    cq = compile_query({}, [], M.PRIVATE_AND_PUBLIC, True)
    assert cq.query_filters == ()
    assert cq.post_filters == ()


def test_private_and_public_admin_with_orgs_gets_or_group():
    cq = compile_query({}, ["org03"], M.PRIVATE_AND_PUBLIC, True)
    assert cq.query_filters == (
        OrGroup((TermsFilter("orgUUID", ("org03",)), TermsFilter("isPublic", (True,)))),
    )


def test_user_is_public_filter_joins_or_group_in_pap_mode():
    # query_translation.py:225-228: user-supplied orgUUID/isPublic filters
    # are OR-ed with the injected security filters in PRIVATE_AND_PUBLIC mode.
    cq = compile_query({"filters": [{"isPublic": [False]}]}, ORGS, M.PRIVATE_AND_PUBLIC, False)
    assert cq.query_filters == (
        OrGroup(
            (
                TermsFilter("isPublic", (False,)),
                TermsFilter("orgUUID", ("org01", "org02")),
                TermsFilter("isPublic", (True,)),
            )
        ),
    )


def test_creation_time_is_query_filter_in_only_public_mode():
    cq = compile_query(
        {"filters": [{"creationTime": ["2014-01-01", -1]}]}, ORGS, M.ONLY_PUBLIC, False
    )
    assert cq.query_filters == (
        RangeFilter("creationTime", "2014-01-01", None),
        TermsFilter("isPublic", (True,)),
    )


def test_pagination_passthrough_and_flag():
    cq = compile_query({"size": 3, "from": 14}, ORGS, M.PRIVATE_AND_PUBLIC, False)
    assert (cq.from_, cq.size) == (14, 3)
    assert cq.explicit_pagination


def test_text_query_with_filters_and_pagination():
    # The M1 full-featured query (tests/test_query_translation.py:552-567).
    cq = compile_query(
        {"query": "blabla", "filters": [{"format": ["csv"]}], "size": 3, "from": 14},
        ORGS,
        M.PRIVATE_AND_PUBLIC,
        False,
    )
    assert cq.text == "blabla"
    assert cq.post_filters == (TermsFilter("format", ("csv",)),)
    assert (cq.from_, cq.size) == (14, 3)


def test_orgs_normalized_lower_stripped():
    cq = compile_query({}, [" ORG01 "], M.ONLY_PRIVATE, False)
    assert cq.query_filters[0] == TermsFilter("orgUUID", ("org01",))


def test_numeric_filter_values_coerced():
    cq = compile_query({"filters": [{"recordCount": [100, "200"]}]}, ORGS, M.ONLY_PUBLIC, False)
    assert cq.post_filters == (TermsFilter("recordCount", (100, 200)),)


@pytest.mark.parametrize(
    "bad",
    [
        "{not json",
        {"filters": ["notadict"]},
        {"filters": [{}]},
        {"filters": [{"nosuchfield": ["x"]}]},
        {"filters": [{"format": []}]},
        {"filters": [{"format": "csv"}]},
        {"filters": [{"creationTime": ["2014-01-01"]}]},
        {"filters": [{"creationTime": ["a", "b", "c"]}]},
        {"from": -1},
        {"size": "ten"},
        {"query": 42},
    ],
)
def test_invalid_queries_raise(bad):
    with pytest.raises(InvalidQueryError):
        compile_query(bad, ORGS, M.PRIVATE_AND_PUBLIC, False)


def test_empty_orgs_non_admin_pap_raises_like_reference():
    # The injected {'orgUUID': []} hits the same empty-values validation the
    # user filters do (query_translation.py:261-262).
    with pytest.raises(InvalidQueryError):
        compile_query({}, [], M.PRIVATE_AND_PUBLIC, False)


def test_compiled_query_is_plain_data():
    cq = compile_query({"query": "x"}, ORGS, M.PRIVATE_AND_PUBLIC, False)
    assert isinstance(cq, CompiledQuery)
    assert hash(cq) is not None  # frozen dataclass — usable as cache key
