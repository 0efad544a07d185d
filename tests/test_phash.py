"""Perceptual hash + image near-dup (operators/phash.py)."""

from __future__ import annotations

import numpy as np
import pytest


def test_phash_oracle_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import phash

    assert_same(phash.media_phash_dedup(spark, sf_dir), ddb, phash.PHASH_ORACLE)


def test_phash_real_png_roundtrip_matches_pixel_hash():
    """The real-decode arm must hash the DECODED PIXELS: encoding a known
    grayscale image as PNG and hashing the blob equals hashing the pixel
    grid directly."""
    from data_catalog_spark.operators import phash
    from data_catalog_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(40, 56, 1), dtype=np.uint8)
    blob = encode_png(px)
    grid_blob, fmt = phash._gray_grid(blob)
    assert fmt == "png"
    # direct path: same luma + nearest-neighbor resize on the raw pixels
    p = px[:, :, 0].astype(np.int64)
    rows = (np.arange(phash.GRID) * 40) // phash.GRID
    cols = (np.arange(phash.GRID) * 56) // phash.GRID
    direct = p[np.ix_(rows, cols)]
    assert (grid_blob == direct).all()
    assert phash._phash64(grid_blob) == phash._phash64(direct)


def test_phash_is_robust_to_small_perturbation_and_separates_noise():
    """pHash contract: a lightly perturbed image stays within the Hamming
    band; an unrelated image does not."""
    from data_catalog_spark.operators import phash

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(phash.GRID, phash.GRID)).astype(np.int64)
    tweaked = base.copy()
    tweaked[5, 5] += 3  # sub-quantum luminance change
    other = rng.integers(0, 256, size=(phash.GRID, phash.GRID)).astype(np.int64)

    def ham(a, b):
        return bin(phash._phash64(a) ^ phash._phash64(b)).count("1")

    assert ham(base, tweaked) <= phash.HAM_K
    assert ham(base, other) > phash.HAM_K


def test_banding_is_complete_vs_bruteforce(spark, sf_dir):
    """Pigeonhole completeness: every Hamming<=K pair found by brute force
    is found by the banded join (7 bands x 9 bits cover Hamming<=6
    exactly)."""
    from data_catalog_spark.operators import phash
    from data_catalog_spark.operators.multimodal import synth_media

    hashed = phash.phash_images(synth_media(spark, sf_dir)).collect()
    hs = {r.media_id: r.phash for r in hashed}
    ids = sorted(hs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hs[a] ^ hs[b]).count("1") <= phash.HAM_K
    }
    banded = {
        (r.a_id, r.b_id)
        for r in phash.media_phash_dedup(spark, sf_dir).collect()
    }
    assert banded == brute


def test_phash_hash_is_63_bits_nonnegative(spark, sf_dir):
    from data_catalog_spark.operators import phash
    from data_catalog_spark.operators.multimodal import synth_media

    for r in phash.phash_images(synth_media(spark, sf_dir)).collect():
        assert 0 <= r.phash < (1 << 63)


def test_gray_grid_bytes_view_pads_and_truncates():
    from data_catalog_spark.operators import phash

    short, fmt = phash._gray_grid(b"ab")
    assert fmt == "bytes"
    assert short.shape == (32, 32)
    assert short[0, 0] == ord("a") and short[0, 1] == ord("b")
    assert short[31, 31] == 0
    long_grid, _ = phash._gray_grid(bytes(range(256)) * 8)  # 2048 bytes
    assert long_grid[0, 31] == 31


def test_phash_resolve_keeps_largest_member(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import phash
    from data_catalog_spark.operators.multimodal import synth_media
    from pyspark.sql import functions as F

    resolved = phash.media_phash_resolve(spark, sf_dir)
    rows = resolved.collect()
    assert rows, "the near-dup pairs imply at least one cluster"
    sizes = {
        r.media_id: r.n
        for r in synth_media(spark, sf_dir)
        .select("media_id", F.expr("CAST(octet_length(content) AS BIGINT)").alias("n"))
        .collect()
    }
    pairs = phash.media_phash_dedup(spark, sf_dir).collect()
    members: dict[int, set[int]] = {}
    # reconstruct clusters in pure python (union-find over the pair graph)
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.a_id), find(p.b_id)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for node in list(parent):
        members.setdefault(find(node), set()).add(node)
    got = {r.cluster_id: r for r in rows}
    assert set(got) == set(members)
    for cid, mem in members.items():
        r = got[cid]
        assert r.n_members == len(mem)
        assert r.n_dropped == len(mem) - 1
        best = sorted(mem, key=lambda m: (-sizes[m], m))[0]
        assert r.kept_media_id == best
        assert r.kept_bytes == sizes[best]
    assert_same(resolved, ddb, phash._phash_resolve_oracle())


def test_phash_incremental_matches_batch_pairs(spark, sf_dir, ddb):
    """Every incremental match must be derivable from the batch pair set
    restricted to new×existing, with the best (hamming, id) neighbor
    kept; parity against the replayed oracle."""
    from conftest import assert_same
    from data_catalog_spark.operators import phash

    inc = phash.media_phash_incremental(spark, sf_dir)
    rows = inc.collect()
    assert rows, "the split must bisect at least one near-dup pair"
    pairs = phash.media_phash_dedup(spark, sf_dir).collect()
    best: dict[int, tuple[int, int]] = {}
    for p in pairs:
        for new, ex in ((p.a_id, p.b_id), (p.b_id, p.a_id)):
            if new % phash.PHASH_NEW_MOD == 0 and ex % phash.PHASH_NEW_MOD != 0:
                cur = best.get(new)
                if cur is None or (p.hamming, ex) < cur:
                    best[new] = (p.hamming, ex)
    got = {r.media_id: (r.hamming, r.match_id, r.kind) for r in rows}
    assert set(got) == set(best)
    for mid, (ham, ex) in best.items():
        g = got[mid]
        assert (g[0], g[1]) == (ham, ex)
        assert g[2] == ("exact" if ham == 0 else "near")
    assert_same(inc, ddb, phash._phash_incremental_oracle())


def test_gate_corpus_stays_in_the_bytes_view_ascii_arm(spark):
    """Cross-engine parity of the pHash oracles rests on two assumptions
    about the synthetic corpus (ADVICE r7): the Spark arm hashes utf-8
    BYTES of content after attempting real decodes, while the DuckDB
    oracle hashes per-CHARACTER code points and never decodes.  Both
    agree iff every oracle-checked image row is (a) pure ASCII (utf-8
    bytes == code points) and (b) rejected by every real codec
    (decode_fmt == 'bytes').  Pin both at the gate SFs so a regenerated
    corpus that breaks either assumption fails HERE, not as a
    hash-mismatch the driver may or may not sample."""
    from data_catalog_spark.operators.multimodal import synth_media
    from data_catalog_spark.operators.phash import phash_images
    from pyspark.sql import functions as F

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        imgs = synth_media(spark, sf).where(F.col("kind") == "image")
        non_ascii = imgs.where(
            F.col("content") != F.encode(
                F.decode(F.col("content"), "US-ASCII"), "US-ASCII"
            )
        ).count()
        assert non_ascii == 0, f"non-ASCII image content at {sf}"
        fmts = {
            r.decode_fmt
            for r in phash_images(synth_media(spark, sf))
            .select("decode_fmt")
            .distinct()
            .collect()
        }
        assert fmts == {"bytes"}, f"real-decodable blob at {sf}: {fmts}"
