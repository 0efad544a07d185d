"""Org-scope resolution + admin-role semantics of the reference's auth layer.

Re-expresses the PURE-LOGIC half of data_catalog/auth.py — everything that
happens AFTER token signature verification and after the user-management
service has answered.  Token-signature verification itself now lives in
``jwt_verify.py`` (stdlib HS*/RS*; the reference delegates to PyJWT,
auth.py:90-94) and is wired per-request by ``http_api.py``; only the
membership fetch (auth.py:172-180, a cloud-controller HTTP call) remains
an injectable deployment hook.  This module takes their outputs (token
CLAIMS and the user's org list) as inputs, exactly as the reference's
`_Authorization` consumes them.  The resolved `(org_uuid_list, is_admin)` pair is the
precise contract `query.compile_query` already accepts, so
``resolve_request_scope`` composes directly with the search path.

Behavior parity map (reference file:line):
- admin check:      'console.admin' in claims['scope']      auth.py:95-97
- scope resolution: admin → requested; non-admin subset-of-membership else
                    Forbidden; no request → full membership  auth.py:131-146
- requested-org parsing: GET `orgs` query param, comma-split,
  lower+STRIP; PUT/POST body `orgUUID`, comma-split, lower (the reference
  does NOT strip on the body path — the asymmetry is kept and tested);
  other methods → []                                         auth.py:149-169
- missing/invalid token → 401-class error                    auth.py:57-61
- org-access failure → 403-class error                       auth.py:66-70
- UAA key algorithm-name normalization                       auth.py:100-122
"""

from __future__ import annotations

from .errors import DataCatalogError


class UnauthorizedError(DataCatalogError):
    """Missing/invalid token → HTTP 401 (auth.py:57-61)."""


class ForbiddenError(DataCatalogError):
    """User requested an org outside their membership → HTTP 403
    (auth.py:66-70, _UserCantAccessOrg auth.py:140-144)."""


ADMIN_SCOPE = "console.admin"

# auth.py:100-109 — UAA reports signature algorithms under either the JOSE
# name or a Java-style name; both normalize to the JOSE identifier.
SIGN_ALGORITHMS = {
    "HS256": "HS256", "SHA256WITHHMAC": "HS256",
    "HS384": "HS384", "SHA384WITHHMAC": "HS384",
    "HS512": "HS512", "SHA512WITHHMAC": "HS512",
    "ES256": "ES256", "SHA256WITHECDSA": "ES256",
    "ES384": "ES384", "SHA384WITHECDSA": "ES384",
    "ES512": "ES512", "SHA512WITHECDSA": "ES512",
    "RS256": "RS256", "SHA256WITHRSA": "RS256",
    "RS384": "RS384", "SHA384WITHRSA": "RS384",
    "RS512": "RS512", "SHA512WITHRSA": "RS512",
}


def normalize_sign_algorithm(alg: str) -> str:
    """auth.py:116-122: case-insensitive lookup; unknown names raise."""
    key = alg.upper()
    if key not in SIGN_ALGORITHMS:
        raise UnauthorizedError(
            f"{alg!r} is not on the list of known algorithms: "
            f"{sorted(SIGN_ALGORITHMS)}"
        )
    return SIGN_ALGORITHMS[key]


def is_admin(claims: dict) -> bool:
    """auth.py:95-97: admin iff the console.admin scope is present.
    A claims dict without 'scope' is an invalid token (401-class)."""
    try:
        scopes = claims["scope"]
    except (TypeError, KeyError) as ex:
        raise UnauthorizedError(f"token claims missing 'scope': {ex}") from ex
    return ADMIN_SCOPE in scopes


def parse_requested_orgs(
    method: str,
    query_orgs: str | None = None,
    body_org_uuid: str | None = None,
) -> list[str]:
    """auth.py:149-169, faithfully including the GET-vs-body asymmetry:
    GET values are lowercased AND whitespace-stripped; PUT/POST body values
    are lowercased only; any other method requests nothing."""
    m = method.upper()
    if m == "GET":
        if not query_orgs:
            return []
        return [u.lower().strip() for u in query_orgs.split(",")]
    if m in ("PUT", "POST"):
        if not body_org_uuid:
            return []
        return [u.lower() for u in body_org_uuid.split(",")]
    return []


def resolve_user_scope(
    requested_orgs: list[str], user_orgs: list[str], admin: bool
) -> list[str]:
    """auth.py:131-146: admins get exactly what they asked for; a
    non-admin's request must be a subset of their membership (else 403);
    an empty request means the full membership."""
    if admin:
        return requested_orgs
    if requested_orgs:
        if set(requested_orgs).issubset(set(user_orgs)):
            return requested_orgs
        raise ForbiddenError(
            "User is not authorized to access at least some of these "
            f"organizations: {requested_orgs}"
        )
    return list(user_orgs)


def resolve_request_scope(
    claims: dict,
    user_orgs: list[str],
    method: str,
    query_orgs: str | None = None,
    body_org_uuid: str | None = None,
) -> tuple[list[str], bool]:
    """The full per-request resolution (auth.py:42-70 minus the I/O edges):
    returns the ``(org_uuid_list, is_admin)`` pair that feeds
    ``query.compile_query`` — admin bypass, org filtering, and the
    visibility modes all key off exactly these two values."""
    admin = is_admin(claims)
    requested = parse_requested_orgs(method, query_orgs, body_org_uuid)
    return resolve_user_scope(requested, user_orgs, admin), admin
