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
- **ES256/ES384/ES512** — raise ``InvalidTokenError`` (stdlib has no EC
  group arithmetic; an honest gate, like the pillow-gated image decoders).

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
_ES = {"ES256", "ES384", "ES512"}

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
            if "-----BEGIN" in key:
                # RS→HS downgrade guard: a public key is public — using it
                # as a MAC secret lets anyone mint valid tokens
                raise InvalidTokenError(
                    "refusing to use a PEM public key as an HMAC secret"
                )
            key = key.encode("utf-8")
        mac = hmac.new(key, signing_input, _HS[alg]).digest()
        if not hmac.compare_digest(mac, sig):
            raise InvalidTokenError("HMAC signature mismatch")
    elif alg in _RS:
        n, e = key if isinstance(key, tuple) else parse_rsa_public_key(key)
        if not _rsa_pkcs1_v15_verify(n, e, sig, signing_input, _RS[alg]):
            raise InvalidTokenError("RSA signature verification failed")
    elif alg in _ES:
        raise InvalidTokenError(
            "ES* verification requires an EC library (not in stdlib) — "
            "deploy with PyJWT+cryptography for ECDSA-issued tokens"
        )
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
