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


def test_es_is_an_honest_gate():
    h = _b64url(json.dumps({"alg": "ES256"}).encode())
    p = _b64url(json.dumps(CLAIMS).encode())
    with pytest.raises(InvalidTokenError, match="EC"):
        decode(f"{h}.{p}.{_b64url(b'x')}", "k", ["ES256"])


def test_malformed_tokens():
    for bad in ["", "a.b", "a.b.c.d", "!!.!!.!!"]:
        with pytest.raises(InvalidTokenError):
            decode(bad, "k", ["HS256"])
