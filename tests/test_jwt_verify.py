"""Stdlib JWT verification: HS* HMAC path, RS* PKCS#1 v1.5 path (against a
deterministically generated RSA keypair signed from first principles),
claim validation, and the downgrade guards."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import math
import random

import pytest

from data_catalog_spark import jwt_verify
from data_catalog_spark.jwt_verify import InvalidTokenError, decode


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _mint_hs(claims: dict, secret: str, alg: str = "HS256", header_alg=None) -> str:
    header = {"alg": header_alg or alg, "typ": "JWT"}
    h = _b64url(json.dumps(header).encode())
    p = _b64url(json.dumps(claims).encode())
    digest = {"HS256": "sha256", "HS384": "sha384", "HS512": "sha512"}[alg]
    sig = hmac.new(secret.encode(), f"{h}.{p}".encode(), digest).digest()
    return f"{h}.{p}.{_b64url(sig)}"


# -- deterministic RSA keypair + signer (test-only, stdlib) -------------------


def _is_prime(n: int) -> bool:
    if n < 2 or n % 2 == 0:
        return n == 2
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if a % n == 0:
            continue
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _rsa_keypair(bits: int = 1024, seed: int = 7):
    rnd = random.Random(seed)

    def gen_prime(b: int) -> int:
        while True:
            p = rnd.getrandbits(b) | (1 << (b - 1)) | 1
            if _is_prime(p):
                return p

    e = 65537
    while True:
        p, q = gen_prime(bits // 2), gen_prime(bits // 2)
        if p == q:
            continue
        phi = (p - 1) * (q - 1)
        if math.gcd(e, phi) == 1:
            return p * q, e, pow(e, -1, phi)


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def _der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b"\x02" + _der_len(len(b)) + b


def _der_seq(*parts: bytes) -> bytes:
    body = b"".join(parts)
    return b"\x30" + _der_len(len(body)) + body


def _pem(der: bytes, label: str) -> str:
    b64 = base64.b64encode(der).decode()
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    return f"-----BEGIN {label}-----\n" + "\n".join(lines) + f"\n-----END {label}-----\n"


def _spki_pem(n: int, e: int) -> str:
    pkcs1 = _der_seq(_der_int(n), _der_int(e))
    alg = bytes.fromhex("300d06092a864886f70d0101010500")  # rsaEncryption, NULL
    bitstring = b"\x03" + _der_len(len(pkcs1) + 1) + b"\x00" + pkcs1
    return _pem(_der_seq(alg, bitstring), "PUBLIC KEY")


def _pkcs1_pem(n: int, e: int) -> str:
    return _pem(_der_seq(_der_int(n), _der_int(e)), "RSA PUBLIC KEY")


def _mint_rs(claims: dict, n: int, d: int, alg: str = "RS256") -> str:
    header = {"alg": alg, "typ": "JWT"}
    h = _b64url(json.dumps(header).encode())
    p = _b64url(json.dumps(claims).encode())
    msg = f"{h}.{p}".encode()
    hash_name = {"RS256": "sha256", "RS384": "sha384", "RS512": "sha512"}[alg]
    info = jwt_verify._DIGEST_INFO[hash_name]
    digest = hashlib.new(hash_name, msg).digest()
    k = (n.bit_length() + 7) // 8
    em = b"\x00\x01" + b"\xff" * (k - 3 - len(info) - len(digest)) + b"\x00" + info + digest
    sig = pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")
    return f"{h}.{p}.{_b64url(sig)}"


KEY = _rsa_keypair()
CLAIMS = {"scope": ["console.admin"], "aud": "cloud_controller", "user_id": "u1"}


@pytest.mark.parametrize("alg", ["HS256", "HS384", "HS512"])
def test_hs_roundtrip(alg):
    tok = _mint_hs(CLAIMS, "s3cret", alg)
    got = decode(tok, "s3cret", [alg], audience="cloud_controller")
    assert got["user_id"] == "u1"
    with pytest.raises(InvalidTokenError):
        decode(tok, "wrong", [alg])


def test_hs_tamper_rejected():
    tok = _mint_hs(CLAIMS, "s3cret")
    h, p, s = tok.split(".")
    evil = _b64url(json.dumps({**CLAIMS, "scope": ["console.admin", "x"]}).encode())
    with pytest.raises(InvalidTokenError, match="HMAC"):
        decode(f"{h}.{evil}.{s}", "s3cret", ["HS256"])


@pytest.mark.parametrize("alg", ["RS256", "RS384", "RS512"])
def test_rs_roundtrip_pem_forms(alg):
    n, e, d = KEY
    tok = _mint_rs(CLAIMS, n, d, alg)
    for key in (_spki_pem(n, e), _pkcs1_pem(n, e), (n, e)):
        got = decode(tok, key, [alg], audience="cloud_controller")
        assert got["scope"] == ["console.admin"]
    # flipping one signature bit must fail
    h, p, s = tok.split(".")
    sig = bytearray(base64.urlsafe_b64decode(s + "=" * (-len(s) % 4)))
    sig[0] ^= 1
    bad = f"{h}.{p}.{_b64url(bytes(sig))}"
    with pytest.raises(InvalidTokenError, match="RSA"):
        decode(bad, (n, e), [alg])


def test_exp_nbf_and_audience():
    tok = _mint_hs({**CLAIMS, "exp": 1000}, "k")
    with pytest.raises(InvalidTokenError, match="expired"):
        decode(tok, "k", ["HS256"], now=2000)
    decode(tok, "k", ["HS256"], now=500, audience="cloud_controller")
    tok = _mint_hs({**CLAIMS, "nbf": 1000}, "k")
    with pytest.raises(InvalidTokenError, match="not yet valid"):
        decode(tok, "k", ["HS256"], now=500)
    tok = _mint_hs({"aud": "something_else", "scope": []}, "k")
    with pytest.raises(InvalidTokenError, match="audience"):
        decode(tok, "k", ["HS256"], audience="cloud_controller")


def test_alg_allowlist_and_none_rejected():
    tok = _mint_hs(CLAIMS, "k")
    with pytest.raises(InvalidTokenError, match="allowlist"):
        decode(tok, "k", ["RS256"])  # HS-signed token, RS-only verifier
    h = _b64url(json.dumps({"alg": "none"}).encode())
    p = _b64url(json.dumps(CLAIMS).encode())
    with pytest.raises(InvalidTokenError):
        decode(f"{h}.{p}.", "k", ["HS256", "none"])


def test_rs_to_hs_downgrade_guard():
    """A token HMAC'd with the PUBLIC pem as the secret must not verify
    when the verifier is (mis)configured with that pem for HS."""
    n, e, _ = KEY
    pem = _spki_pem(n, e)
    tok = _mint_hs(CLAIMS, pem)
    with pytest.raises(InvalidTokenError, match="PEM public key"):
        decode(tok, pem, ["HS256"])
    # ADVICE r5: the same pem read in 'rb' mode (bytes key) must be
    # rejected too — the str-only guard re-enabled the downgrade
    tok_b = _mint_hs(CLAIMS, pem)
    with pytest.raises(InvalidTokenError, match="PEM public key"):
        decode(tok_b, pem.encode("utf-8"), ["HS256"])


# -- ECDSA (test-only signer from the same curve constants) -------------------


def _ec_keypair(curve: str, seed: int = 11):
    p, a, b, gx, gy, n = jwt_verify._CURVES[curve]
    d = random.Random(seed).randrange(1, n)
    qx, qy = jwt_verify._ec_mul(d, (gx, gy), p, a)
    return d, qx, qy


def _mint_es(claims: dict, curve: str, d: int, alg: str, seed: int = 13) -> str:
    p, a, b, gx, gy, n = jwt_verify._CURVES[curve]
    header = {"alg": alg, "typ": "JWT"}
    h = _b64url(json.dumps(header).encode())
    pl = _b64url(json.dumps(claims).encode())
    msg = f"{h}.{pl}".encode()
    hash_name = {"ES256": "sha256", "ES384": "sha384", "ES512": "sha512"}[alg]
    digest = hashlib.new(hash_name, msg).digest()
    e = int.from_bytes(digest, "big")
    excess = len(digest) * 8 - n.bit_length()
    if excess > 0:
        e >>= excess
    rnd = random.Random(seed)
    while True:
        k = rnd.randrange(1, n)
        R = jwt_verify._ec_mul(k, (gx, gy), p, a)
        r = R[0] % n
        if r == 0:
            continue
        s = pow(k, -1, n) * (e + r * d) % n
        if s == 0:
            continue
        size = (n.bit_length() + 7) // 8
        sig = r.to_bytes(size, "big") + s.to_bytes(size, "big")
        return f"{h}.{pl}.{_b64url(sig)}"


def _ec_spki_pem(curve: str, x: int, y: int) -> str:
    curve_oid = {
        "P-256": bytes.fromhex("2a8648ce3d030107"),
        "P-384": bytes.fromhex("2b81040022"),
        "P-521": bytes.fromhex("2b81040023"),
    }[curve]
    n = jwt_verify._CURVES[curve][5]
    size = (n.bit_length() + 7) // 8
    point = b"\x04" + x.to_bytes(size, "big") + y.to_bytes(size, "big")
    alg = _der_seq(
        b"\x06" + _der_len(len(jwt_verify._EC_OID)) + jwt_verify._EC_OID,
        b"\x06" + _der_len(len(curve_oid)) + curve_oid,
    )
    bitstring = b"\x03" + _der_len(len(point) + 1) + b"\x00" + point
    return _pem(_der_seq(alg, bitstring), "PUBLIC KEY")


@pytest.mark.parametrize(
    "alg,curve",
    [("ES256", "P-256"), ("ES384", "P-384"), ("ES512", "P-521")],
)
def test_es_roundtrip(alg, curve):
    d, qx, qy = _ec_keypair(curve)
    tok = _mint_es(CLAIMS, curve, d, alg)
    for key in (_ec_spki_pem(curve, qx, qy), (curve, qx, qy)):
        got = decode(tok, key, [alg], audience="cloud_controller")
        assert got["scope"] == ["console.admin"]
    # bit-flipped signature fails
    h, p, s = tok.split(".")
    sig = bytearray(base64.urlsafe_b64decode(s + "=" * (-len(s) % 4)))
    sig[-1] ^= 1
    with pytest.raises(InvalidTokenError, match="ECDSA"):
        decode(f"{h}.{p}.{_b64url(bytes(sig))}", (curve, qx, qy), [alg])


@pytest.mark.parametrize("curve", ["P-256", "P-384", "P-521"])
def test_curve_constants_are_consistent(curve):
    """Domain-parameter self-check (a mistyped constant here silently
    breaks all ES verification): G is on the curve and n·G = identity."""
    p, a, b, gx, gy, n = jwt_verify._CURVES[curve]
    assert jwt_verify._ec_on_curve(gx, gy, p, a % p, b)
    assert jwt_verify._ec_mul(n, (gx, gy), p, a) is None
    assert n.bit_length() == p.bit_length()


def test_es_wrong_curve_and_invalid_point_rejected():
    d, qx, qy = _ec_keypair("P-256")
    tok = _mint_es(CLAIMS, "P-256", d, "ES256")
    with pytest.raises(InvalidTokenError, match="requires"):
        decode(tok, ("P-384", qx, qy), ["ES256"])
    # an off-curve point must never verify (invalid-point guard)
    with pytest.raises(InvalidTokenError, match="ECDSA"):
        decode(tok, ("P-256", qx, (qy + 1)), ["ES256"])


def test_malformed_tokens():
    for bad in ["", "a.b", "a.b.c.d", "!!.!!.!!"]:
        with pytest.raises(InvalidTokenError):
            decode(bad, "k", ["HS256"])
