"""Stdlib JWT verification — the token-signature edge the engine previously
declared out of scope (reference ``auth.py:90-94`` delegates it to PyJWT +
an HTTPS key fetch).  No third-party package is needed for the algorithms
the reference's UAA actually issues:

- **HS256/HS384/HS512** — ``hmac`` + ``hashlib``, constant-time compare.
- **RS256/RS384/RS512** — RSASSA-PKCS1-v1_5 verification from first
  principles: a minimal DER reader parses the PEM public key
  (SubjectPublicKeyInfo or PKCS#1) to ``(n, e)``, the signature is checked
  as ``pow(s, e, n)`` against the EMSA-PKCS1-v1_5 encoding of the signing
  input's digest.  Verification needs only the PUBLIC key and modular
  exponentiation — both stdlib.
- **ES256/ES384/ES512** — ECDSA verification over the NIST curves
  (P-256/P-384/P-521) from first principles: short-Weierstrass point
  arithmetic with ``pow(x, -1, p)`` inversions, the JOSE raw ``r||s``
  signature layout, and left-bits hash truncation per SEC 1 §4.1.4.

Claim validation mirrors what the reference's ``jwt.decode(...,
audience="cloud_controller")`` call enforces: signature, ``exp``, ``nbf``,
and audience.  The ``none`` algorithm is rejected unconditionally, and HS*
verification refuses a PEM public key as the MAC secret (the classic
RS→HS key-confusion downgrade).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time


class InvalidTokenError(Exception):
    """Any verification failure → the reference's 401 path
    (auth.py:57-61 catches jwt.InvalidTokenError)."""


_HS = {"HS256": "sha256", "HS384": "sha384", "HS512": "sha512"}
_RS = {"RS256": "sha256", "RS384": "sha384", "RS512": "sha512"}
_ES = {"ES256": ("sha256", "P-256"), "ES384": ("sha384", "P-384"), "ES512": ("sha512", "P-521")}

# EMSA-PKCS1-v1_5 DigestInfo prefixes (RFC 8017 §9.2 notes).
_DIGEST_INFO = {
    "sha256": bytes.fromhex("3031300d060960864801650304020105000420"),
    "sha384": bytes.fromhex("3041300d060960864801650304020205000430"),
    "sha512": bytes.fromhex("3051300d060960864801650304020305000440"),
}


def _b64url_decode(part: str) -> bytes:
    try:
        return base64.urlsafe_b64decode(part + "=" * (-len(part) % 4))
    except (ValueError, TypeError) as ex:
        raise InvalidTokenError(f"bad base64url segment: {ex}") from ex


# -- DER / PEM ----------------------------------------------------------------


def _der_read(data: bytes, pos: int) -> tuple[int, bytes, int]:
    """One TLV: returns (tag, value, next_pos)."""
    if pos + 2 > len(data):
        raise InvalidTokenError("truncated DER")
    tag = data[pos]
    length = data[pos + 1]
    pos += 2
    if length & 0x80:
        n = length & 0x7F
        if n == 0 or pos + n > len(data):
            raise InvalidTokenError("bad DER length")
        length = int.from_bytes(data[pos : pos + n], "big")
        pos += n
    if pos + length > len(data):
        raise InvalidTokenError("truncated DER value")
    return tag, data[pos : pos + length], pos + length


def _der_int(data: bytes, pos: int) -> tuple[int, int]:
    tag, value, nxt = _der_read(data, pos)
    if tag != 0x02:
        raise InvalidTokenError(f"expected DER INTEGER, got tag {tag:#x}")
    return int.from_bytes(value, "big"), nxt


def parse_rsa_public_key(pem: str) -> tuple[int, int]:
    """PEM → (n, e).  Accepts SubjectPublicKeyInfo (``BEGIN PUBLIC KEY``)
    and raw PKCS#1 (``BEGIN RSA PUBLIC KEY``)."""
    body = "".join(
        line.strip()
        for line in pem.strip().splitlines()
        if line.strip() and not line.startswith("-----")
    )
    try:
        der = base64.b64decode(body, validate=True)
    except (ValueError, TypeError) as ex:
        raise InvalidTokenError(f"bad PEM body: {ex}") from ex
    tag, outer, _ = _der_read(der, 0)
    if tag != 0x30:
        raise InvalidTokenError("public key is not a DER SEQUENCE")
    inner_tag, inner, nxt = _der_read(outer, 0)
    if inner_tag == 0x30:
        # SubjectPublicKeyInfo: SEQ { SEQ{alg...}, BIT STRING { PKCS#1 } }
        bits_tag, bits, _ = _der_read(outer, nxt)
        if bits_tag != 0x03 or not bits or bits[0] != 0:
            raise InvalidTokenError("malformed SubjectPublicKeyInfo")
        tag, seq, _ = _der_read(bits[1:], 0)
        if tag != 0x30:
            raise InvalidTokenError("malformed PKCS#1 payload")
    else:
        # raw PKCS#1: SEQ { INTEGER n, INTEGER e }
        seq = outer
    n, pos = _der_int(seq, 0)
    e, _ = _der_int(seq, pos)
    if n <= 0 or e <= 0:
        raise InvalidTokenError("degenerate RSA public key")
    return n, e


def _rsa_pkcs1_v15_verify(n: int, e: int, sig: bytes, msg: bytes, hash_name: str) -> bool:
    k = (n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    s = int.from_bytes(sig, "big")
    if s >= n:
        return False
    em = pow(s, e, n).to_bytes(k, "big")
    info = _DIGEST_INFO[hash_name]
    digest = hashlib.new(hash_name, msg).digest()
    pad_len = k - 3 - len(info) - len(digest)
    if pad_len < 8:
        return False
    expected = b"\x00\x01" + b"\xff" * pad_len + b"\x00" + info + digest
    return hmac.compare_digest(em, expected)


# -- ECDSA over the NIST curves ----------------------------------------------

# SEC 2 short-Weierstrass domain parameters: (p, a, b, Gx, Gy, n).
_CURVES = {
    "P-256": (
        0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
        -3,
        0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
        0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
        0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
        0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
    ),
    "P-384": (
        0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFFFF0000000000000000FFFFFFFF,
        -3,
        0xB3312FA7E23EE7E4988E056BE3F82D19181D9C6EFE8141120314088F5013875AC656398D8A2ED19D2A85C8EDD3EC2AEF,
        0xAA87CA22BE8B05378EB1C71EF320AD746E1D3B628BA79B9859F741E082542A385502F25DBF55296C3A545E3872760AB7,
        0x3617DE4A96262C6F5D9E98BF9292DC29F8F41DBD289A147CE9DA3113B5F0B8C00A60B1CE1D7E819D7A431D7C90EA0E5F,
        0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFC7634D81F4372DDF581A0DB248B0A77AECEC196ACCC52973,
    ),
    "P-521": (
        2**521 - 1,
        -3,
        0x0051953EB9618E1C9A1F929A21A0B68540EEA2DA725B99B315F3B8B489918EF109E156193951EC7E937B1652C0BD3BB1BF073573DF883D2C34F1EF451FD46B503F00,
        0x00C6858E06B70404E9CD9E3ECB662395B4429C648139053FB521F828AF606B4D3DBAA14B5E77EFE75928FE1DC127A2FFA8DE3348B3C1856A429BF97E7E31C2E5BD66,
        0x011839296A789A3BC0045C8A5FB42C7D1BD998F54449579B446817AFBD17273E662C97EE72995EF42640C550B9013FAD0761353C7086A272C24088BE94769FD16650,
        int("1" + "f" * 64 + "fa51868783bf2f966b7fcc0148f709a5d0"
            "3bb5c9b8899c47aebb6fb71e91386409", 16),
    ),
}

# id-ecPublicKey and the named-curve OIDs, as DER-encoded OID values.
_EC_OID = bytes.fromhex("2a8648ce3d0201")  # 1.2.840.10045.2.1
_CURVE_OIDS = {
    bytes.fromhex("2a8648ce3d030107"): "P-256",  # 1.2.840.10045.3.1.7
    bytes.fromhex("2b81040022"): "P-384",  # 1.3.132.0.34
    bytes.fromhex("2b81040023"): "P-521",  # 1.3.132.0.35
}


def _ec_add(P, Q, p, a):
    """Affine short-Weierstrass addition; None is the identity."""
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if P == Q:
        lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return x3, (lam * (x1 - x3) - y1) % p


def _ec_mul(k: int, P, p, a):
    R = None
    while k:
        if k & 1:
            R = _ec_add(R, P, p, a)
        P = _ec_add(P, P, p, a)
        k >>= 1
    return R


def _ec_on_curve(x: int, y: int, p: int, a: int, b: int) -> bool:
    return 0 <= x < p and 0 <= y < p and (y * y - (x * x * x + a * x + b)) % p == 0


def parse_ec_public_key(pem: str) -> tuple[str, int, int]:
    """PEM SubjectPublicKeyInfo → (curve_name, x, y).  Uncompressed
    points only (the form UAA-style issuers publish)."""
    body = "".join(
        line.strip()
        for line in pem.strip().splitlines()
        if line.strip() and not line.startswith("-----")
    )
    try:
        der = base64.b64decode(body, validate=True)
    except (ValueError, TypeError) as ex:
        raise InvalidTokenError(f"bad PEM body: {ex}") from ex
    tag, outer, _ = _der_read(der, 0)
    if tag != 0x30:
        raise InvalidTokenError("EC public key is not a DER SEQUENCE")
    alg_tag, alg, nxt = _der_read(outer, 0)
    if alg_tag != 0x30:
        raise InvalidTokenError("malformed EC AlgorithmIdentifier")
    oid_tag, oid, oid_nxt = _der_read(alg, 0)
    if oid_tag != 0x06 or oid != _EC_OID:
        raise InvalidTokenError("not an id-ecPublicKey key")
    cv_tag, cv, _ = _der_read(alg, oid_nxt)
    if cv_tag != 0x06 or cv not in _CURVE_OIDS:
        raise InvalidTokenError("unknown or unsupported EC named curve")
    curve = _CURVE_OIDS[cv]
    bits_tag, bits, _ = _der_read(outer, nxt)
    if bits_tag != 0x03 or len(bits) < 2 or bits[0] != 0 or bits[1] != 0x04:
        raise InvalidTokenError("EC point must be an uncompressed BIT STRING")
    point = bits[2:]
    half = len(point) // 2
    if len(point) != 2 * half:
        raise InvalidTokenError("odd-length EC point")
    return curve, int.from_bytes(point[:half], "big"), int.from_bytes(point[half:], "big")


def _ecdsa_verify(curve: str, x: int, y: int, sig: bytes, msg: bytes, hash_name: str) -> bool:
    p, a, b, gx, gy, n = _CURVES[curve]
    if not _ec_on_curve(x, y, p, a, b):
        return False  # invalid-point attack guard
    size = (n.bit_length() + 7) // 8
    if len(sig) != 2 * size:  # JOSE raw r||s layout
        return False
    r = int.from_bytes(sig[:size], "big")
    s = int.from_bytes(sig[size:], "big")
    if not (1 <= r < n and 1 <= s < n):
        return False
    digest = hashlib.new(hash_name, msg).digest()
    e = int.from_bytes(digest, "big")
    excess = len(digest) * 8 - n.bit_length()
    if excess > 0:  # SEC 1 §4.1.4 left-bits truncation (P-521 + sha512)
        e >>= excess
    w = pow(s, -1, n)
    u1, u2 = e * w % n, r * w % n
    R = _ec_add(
        _ec_mul(u1, (gx, gy), p, a), _ec_mul(u2, (x, y), p, a), p, a
    )
    return R is not None and R[0] % n == r


# -- decode -------------------------------------------------------------------


def decode(
    token: str,
    key,
    algorithms: list[str],
    audience: str | None = None,
    now: float | None = None,
    leeway: float = 0.0,
) -> dict:
    """Verify signature + registered claims; return the payload claims.

    ``key``: the shared secret (HS*, ``str``/``bytes``) or the RSA public
    key (RS*, PEM string or an ``(n, e)`` tuple).  ``algorithms`` is the
    caller's allowlist — the header's ``alg`` must be on it (never
    ``none``)."""
    parts = token.split(".")
    if len(parts) != 3:
        raise InvalidTokenError("token must have three dot-separated segments")
    header_b64, payload_b64, sig_b64 = parts
    try:
        header = json.loads(_b64url_decode(header_b64))
        claims = json.loads(_b64url_decode(payload_b64))
    except (ValueError, UnicodeDecodeError) as ex:
        raise InvalidTokenError(f"undecodable token segment: {ex}") from ex
    if not isinstance(header, dict) or not isinstance(claims, dict):
        raise InvalidTokenError("header/payload must be JSON objects")
    alg = header.get("alg")
    if alg not in algorithms:
        raise InvalidTokenError(f"algorithm {alg!r} not in the allowlist")
    signing_input = f"{header_b64}.{payload_b64}".encode("ascii")
    sig = _b64url_decode(sig_b64)

    if alg in _HS:
        if isinstance(key, str):
            key = key.encode("utf-8")
        # RS→HS downgrade guard, on the BYTES form so a PEM read in 'rb'
        # mode is caught too: a public key is public — using it as a MAC
        # secret lets anyone mint valid tokens
        if b"-----BEGIN" in key:
            raise InvalidTokenError(
                "refusing to use a PEM public key as an HMAC secret"
            )
        mac = hmac.new(key, signing_input, _HS[alg]).digest()
        if not hmac.compare_digest(mac, sig):
            raise InvalidTokenError("HMAC signature mismatch")
    elif alg in _RS:
        n, e = key if isinstance(key, tuple) else parse_rsa_public_key(key)
        if not _rsa_pkcs1_v15_verify(n, e, sig, signing_input, _RS[alg]):
            raise InvalidTokenError("RSA signature verification failed")
    elif alg in _ES:
        hash_name, expect_curve = _ES[alg]
        if isinstance(key, tuple):
            curve, x, y = key
        else:
            curve, x, y = parse_ec_public_key(key)
        if curve != expect_curve:
            raise InvalidTokenError(
                f"{alg} requires a {expect_curve} key, got {curve}"
            )
        if not _ecdsa_verify(curve, x, y, sig, signing_input, hash_name):
            raise InvalidTokenError("ECDSA signature verification failed")
    else:
        raise InvalidTokenError(f"unsupported algorithm {alg!r}")

    t = time.time() if now is None else now
    if "exp" in claims:
        try:
            if t > float(claims["exp"]) + leeway:
                raise InvalidTokenError("token expired")
        except (TypeError, ValueError) as ex:
            raise InvalidTokenError(f"bad exp claim: {ex}") from ex
    if "nbf" in claims:
        try:
            if t < float(claims["nbf"]) - leeway:
                raise InvalidTokenError("token not yet valid")
        except (TypeError, ValueError) as ex:
            raise InvalidTokenError(f"bad nbf claim: {ex}") from ex
    if audience is not None:
        aud = claims.get("aud")
        auds = aud if isinstance(aud, list) else [aud]
        if audience not in auds:
            raise InvalidTokenError(f"audience {audience!r} not in {auds!r}")
    return claims
