"""Org-scope/admin resolution parity matrix (reference auth.py:42-169) and
its composition with the query compiler's security modes."""

from __future__ import annotations

import pytest

from data_catalog_spark import auth


# -- admin check (auth.py:95-97) ---------------------------------------------


def test_admin_iff_console_admin_scope():
    assert auth.is_admin({"scope": ["console.admin", "openid"]})
    assert not auth.is_admin({"scope": ["openid"]})
    assert not auth.is_admin({"scope": []})


def test_missing_scope_is_unauthorized():
    with pytest.raises(auth.UnauthorizedError):
        auth.is_admin({})
    with pytest.raises(auth.UnauthorizedError):
        auth.is_admin(None)


# -- requested-org parsing (auth.py:149-169) ---------------------------------


def test_get_orgs_lowered_and_stripped():
    assert auth.parse_requested_orgs("GET", query_orgs=" OrgA , orgB ") == [
        "orga",
        "orgb",
    ]
    assert auth.parse_requested_orgs("GET", query_orgs="") == []
    assert auth.parse_requested_orgs("GET", query_orgs=None) == []


def test_body_orgs_lowered_not_stripped():
    """The reference strips on the GET path only — the asymmetry is kept."""
    assert auth.parse_requested_orgs("PUT", body_org_uuid="OrgA, OrgB") == [
        "orga",
        " orgb",
    ]
    assert auth.parse_requested_orgs("POST", body_org_uuid="OrgC") == ["orgc"]
    assert auth.parse_requested_orgs("POST", body_org_uuid="") == []


def test_other_methods_request_nothing():
    assert auth.parse_requested_orgs("DELETE", query_orgs="orgA") == []
    assert auth.parse_requested_orgs("HEAD", body_org_uuid="orgA") == []


# -- scope resolution (auth.py:131-146) --------------------------------------


def test_admin_gets_exactly_requested():
    assert auth.resolve_user_scope(["orgx"], ["orga"], admin=True) == ["orgx"]
    assert auth.resolve_user_scope([], ["orga"], admin=True) == []


def test_non_admin_subset_allowed():
    assert auth.resolve_user_scope(["orga"], ["orga", "orgb"], admin=False) == ["orga"]


def test_non_admin_superset_forbidden():
    with pytest.raises(auth.ForbiddenError):
        auth.resolve_user_scope(["orga", "orgz"], ["orga"], admin=False)


def test_non_admin_empty_request_gets_membership():
    assert auth.resolve_user_scope([], ["orga", "orgb"], admin=False) == [
        "orga",
        "orgb",
    ]


# -- algorithm-name normalization (auth.py:100-122) --------------------------


def test_algorithm_names_normalize():
    assert auth.normalize_sign_algorithm("sha256withrsa") == "RS256"
    assert auth.normalize_sign_algorithm("RS256") == "RS256"
    assert auth.normalize_sign_algorithm("Sha512withEcdsa") == "ES512"
    with pytest.raises(auth.UnauthorizedError):
        auth.normalize_sign_algorithm("NONE")


# -- end-to-end composition with the compiler --------------------------------


def test_resolution_feeds_compile_query():
    """The resolved pair drives the same security predicate the oracle-
    checked cat_* cases pin: a non-admin restricted to their orgs compiles
    to the org/visibility clause; an admin bypasses it."""
    from data_catalog_spark.query import DataSetFiltering, compile_query

    scope, admin = auth.resolve_request_scope(
        {"scope": ["openid"]},
        user_orgs=["org01", "org02"],
        method="GET",
        query_orgs="Org01",
    )
    assert (scope, admin) == (["org01"], False)
    cq = compile_query({"size": 10}, scope, DataSetFiltering.PRIVATE_AND_PUBLIC, admin)
    assert cq is not None

    scope_a, admin_a = auth.resolve_request_scope(
        {"scope": ["console.admin"]},
        user_orgs=[],
        method="GET",
        query_orgs="org09",
    )
    assert (scope_a, admin_a) == (["org09"], True)
    cq_a = compile_query({"size": 10}, scope_a, DataSetFiltering.PRIVATE_AND_PUBLIC, admin_a)
    assert cq_a is not None


def test_non_admin_cross_org_request_rejected_end_to_end():
    with pytest.raises(auth.ForbiddenError):
        auth.resolve_request_scope(
            {"scope": ["openid"]},
            user_orgs=["org01"],
            method="GET",
            query_orgs="org01,org02",
        )
