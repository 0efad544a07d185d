"""Perceptual image hashing (pHash) + Hamming-banded image near-dup.

Composes the multimodal lane with the dedup lane — the standard image-dedup
shape for crawled corpora (pHash → pigeonhole band blocking → verified
Hamming distance), cf. the SimHash text pipeline in dedup.py.

The hash is a 63-bit DCT sign pattern, computed entirely in INTEGER
arithmetic so both engines reproduce it bit-for-bit:

1. 32×32 grayscale grid.  Real PNG/JPEG/GIF/BMP blobs decode through the
   stdlib codecs (multimodal/jpeg/gif/bmp) → integer luma → nearest-
   neighbor 32×32; undecodable blobs (the synthetic corpus: raw ASCII
   text bytes) take the deterministic bytes-view — first 1024 bytes,
   zero-padded (same fake-decode contract as media_resize_stats).
2. Fixed-point 2-D DCT: M = Q·P·Qᵀ with Q the 8×32 integer matrix
   round(cos(π(2x+1)u/64)·2¹⁰) — only the 8 low-frequency rows are ever
   needed, so the transform is 8×32 · 32×32 · 32×8 (cf. the float DCT in
   jpeg.py; integer scaling makes it replayable in SQL).  |M| ≤ 2.8e14,
   comfortably int64.
3. Drop the DC term, take the median (32nd smallest of 63) of the
   remaining coefficients, bit k = 1 iff coeff_k > median (row-major) —
   a 63-bit non-negative bigint.

Near-dup pairs: Hamming ≤ 6 via 7 bands × 9 bits (pigeonhole: two hashes
within Hamming 6 MUST agree on ≥1 of 7 bands), candidates from a
band-equality self-join, verified with bit_count(xor).  Never all-pairs:
candidate volume is bounded by band-bucket occupancy exactly like
dedup.simhash's blocking.

Scale (100 TB): hashing is a map-only Arrow-batched pass (numpy einsum per
batch); the join shuffles 7 small (band, 9-bit value) keys per image; the
registered query's oracle replays the full integer pipeline in DuckDB over
the ASCII bytes-view (the corpus synthesizer emits ASCII-only text — both
engines see identical bytes).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import register
from .multimodal import synth_media

GRID = 32
LOWFREQ = 8
DCT_SCALE = 1 << 10
HAM_K = 6
N_BANDS = HAM_K + 1  # pigeonhole
BAND_BITS = 9  # 7 × 9 = 63 bits

# 8×32 fixed-point DCT-II rows (low frequencies only); module-level so the
# numpy arm and the SQL literal are generated from the SAME list.
DCT_Q: list[list[int]] = [
    [
        round(math.cos(math.pi * (2 * x + 1) * u / (2 * GRID)) * DCT_SCALE)
        for x in range(GRID)
    ]
    for u in range(LOWFREQ)
]

_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decode_fmt", T.StringType()),
    ]
)


def _gray_grid(content: bytes) -> tuple[np.ndarray, str]:
    """(32×32 int64 grayscale grid, fmt): real decode when a stdlib codec
    accepts the blob, bytes-view otherwise."""
    from . import bmp, gif, jpeg
    from .multimodal import decode_png

    pixels = None
    fmt = "bytes"
    for name, dec in (
        ("png", decode_png),
        ("jpeg", jpeg.decode_jpeg),
        ("gif", gif.decode_gif),
        ("bmp", bmp.decode_bmp),
    ):
        try:
            out = dec(content)
            pixels = out[3]
            fmt = name
            break
        except ValueError:
            # the codecs' documented not-this-format / unsupported-mode
            # signal (classify_decode's contract); anything else is a
            # decoder BUG and must surface, not silently fall through to
            # the bytes-view
            continue
    if pixels is not None:
        px = np.asarray(pixels, dtype=np.int64)
        if px.ndim == 2:
            px = px[:, :, None]
        if px.shape[2] >= 3:
            # integer luma (77R + 150G + 29B) >> 8 — deterministic ints
            px = (
                77 * px[:, :, 0] + 150 * px[:, :, 1] + 29 * px[:, :, 2]
            ) >> 8
        else:
            px = px[:, :, 0]
        h, w = px.shape
        rows = (np.arange(GRID) * h) // GRID
        cols = (np.arange(GRID) * w) // GRID
        return px[np.ix_(rows, cols)], fmt
    buf = np.frombuffer(
        (bytes(content) + b"\x00" * (GRID * GRID))[: GRID * GRID],
        dtype=np.uint8,
    )
    return buf.astype(np.int64).reshape(GRID, GRID), fmt


def _phash64(grid: np.ndarray) -> int:
    q = np.asarray(DCT_Q, dtype=np.int64)
    m = q @ grid @ q.T  # 8×8 low-frequency block, exact int64
    vals = m.reshape(-1)[1:]  # drop DC, row-major
    med = np.sort(vals)[(len(vals) - 1) // 2]  # 32nd smallest of 63
    bits = vals > med
    return int(sum(1 << k for k, b in enumerate(bits) if b))


def phash_images(media: DataFrame) -> DataFrame:
    """(media_id, phash, decode_fmt) for every image row — Arrow-batched
    map-only pass.  Spread across executor threads first: the decode
    attempts + einsum are per-row-expensive, and the local test media
    derives from a single-row-group scan (the repo's standing 1-task
    pitfall; a no-op at deployment scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, fmts = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                grid, fmt = _gray_grid(bytes(blob))
                ids.append(mid)
                hashes.append(_phash64(grid))
                fmts.append(fmt)
            yield pd.DataFrame(
                {"media_id": ids, "phash": hashes, "decode_fmt": fmts}
            )

    media = media.where(F.col("kind") == "image")
    return media.repartition(
        media.sparkSession.sparkContext.defaultParallelism, "media_id"
    ).mapInPandas(run, schema=_PHASH_SCHEMA)


def _bands(hashed: DataFrame) -> DataFrame:
    """(media_id, phash, band, bv): the 7×9-bit pigeonhole band table —
    the ONE Spark-side rendering of the band layout (batch pairs and the
    incremental matcher both consume it; _hash_ctes is its oracle twin)."""
    return hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), i -> "
                f"struct(i AS band, "
                f"shiftright(phash, i * {BAND_BITS}) & {2**BAND_BITS - 1} AS bv))"
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band", "b.bv")


def near_dup_pairs(hashed: DataFrame) -> DataFrame:
    """Hamming≤HAM_K pairs via band-equality blocking + verification.
    The band table is self-joined, so barrier the expensive hash pass
    (decode attempts + einsum) behind a lazy localCheckpoint — without it
    each join side re-runs the mapInPandas scan (the incremental matcher
    checkpoints for the same reason)."""
    bands = _bands(hashed.localCheckpoint(eager=False))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("a_id"),
            F.col("b.media_id").alias("b_id"),
            F.expr("CAST(bit_count(a.phash ^ b.phash) AS INT)").alias(
                "hamming"
            ),
        )
        .distinct()
        .where(F.col("hamming") <= HAM_K)
        .orderBy("a_id", "b_id")
    )


def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: pHash near-dup pairs over the synthetic media
    table (all-bytes-view corpus, so the integer pipeline is replayable
    end-to-end in DuckDB; the real-decode arm is pinned by round-trip
    pytest against the same hash function).

    Parity assumptions (pinned by
    test_gate_corpus_stays_in_the_bytes_view_ascii_arm): the corpus is
    pure ASCII (the Spark arm hashes utf-8 BYTES, the oracle hashes
    per-character code points — identical only for ASCII) and no blob is
    accepted by a real codec (the oracle never decodes)."""
    return near_dup_pairs(phash_images(synth_media(spark, sf_dir)))


def _q_sql() -> str:
    rows = ", ".join(
        "[" + ", ".join(str(v) for v in row) + "]" for row in DCT_Q
    )
    return f"[{rows}]"


def _hash_ctes() -> str:
    """CTE chain ``q, img, px, tmat, mmat, vals, h, bands`` — pHash +
    band table over the bytes-view image corpus; shared by the pair,
    resolution, and incremental oracles."""
    g = GRID
    return f"""q(m) AS (SELECT {_q_sql()}),
img AS (
  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 0),
px AS (
  SELECT media_id,
         [CAST(ascii(substr(text, k, 1)) AS BIGINT)
          for k in range(1, {g * g + 1})] AS p
  FROM img),
tmat AS (
  SELECT media_id,
         [[list_sum([m[u][x] * p[(x - 1) * {g} + y] for x in range(1, {g + 1})])
           for y in range(1, {g + 1})] for u in range(1, {LOWFREQ + 1})] AS t
  FROM px CROSS JOIN q),
mmat AS (
  SELECT media_id,
         [[list_sum([t[u][y] * m[v][y] for y in range(1, {g + 1})])
           for v in range(1, {LOWFREQ + 1})] for u in range(1, {LOWFREQ + 1})] AS mm
  FROM tmat CROSS JOIN q),
vals AS (
  SELECT media_id,
         [mm[1 + (k - 1) // {LOWFREQ}][1 + (k - 1) % {LOWFREQ}]
          for k in range(2, {LOWFREQ * LOWFREQ + 1})] AS v
  FROM mmat),
h AS (
  SELECT media_id,
         CAST(list_sum(
           [CASE WHEN v[j] > list_sort(v)[{(LOWFREQ * LOWFREQ - 1 + 1) // 2}]
                 THEN CAST(1 AS BIGINT) << (j - 1) ELSE 0 END
            for j in range(1, {LOWFREQ * LOWFREQ})]) AS BIGINT) AS phash
  FROM vals),
bands AS (
  SELECT media_id, phash, i AS band,
         (phash >> (i * {BAND_BITS})) & {2**BAND_BITS - 1} AS bv
  FROM h CROSS JOIN range(0, {N_BANDS}) r(i))"""


def _phash_oracle() -> str:
    return f"""
WITH {_hash_ctes()},
cand AS (
  SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id,
         CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id)
SELECT a_id, b_id, hamming FROM cand
WHERE hamming <= {HAM_K}
ORDER BY a_id, b_id
"""


PHASH_ORACLE = _phash_oracle()

register("media_phash_dedup", media_phash_dedup, PHASH_ORACLE)


def media_phash_reload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash pairs off a PERSISTED fingerprint index — the fifth reload
    cell (PQ codes, MinHash signatures, dup-cluster labels, IVF
    assignment, and now the image fingerprints): the (media_id, phash)
    table is what the Arrow-batched decode+DCT pass produces — by far
    the expensive stage of image dedup — so it is the artifact a media
    pipeline persists per corpus version; banding and pair verification
    re-run per query off the 16-byte rows.  Built once under a content
    key, loaded in a fresh ``newSession()`` (empty memo stores), served
    through the same ``near_dup_pairs`` band join; the oracle is
    media_phash_dedup's own, so reload parity is hash-checked."""
    import os as _os

    from . import persist

    docs = _os.path.join(sf_dir, "documents.parquet")
    key = persist.content_key(
        [docs],
        f"phash-fp|g{GRID}|lf{LOWFREQ}|b{N_BANDS}x{BAND_BITS}|mod3",
    )
    sib = spark.newSession()
    fps = persist.build_or_load(
        sib,
        "phash_fingerprints",
        key,
        lambda: phash_images(synth_media(spark, sf_dir)).select(
            "media_id", "phash"
        ),
    )
    return near_dup_pairs(fps)


register("media_phash_reload", media_phash_reload, PHASH_ORACLE)


# -- image near-dup resolution --------------------------------------------------
#
# The image lane's counterpart of quality_model.dedup_keep_best: connected
# components over the pHash pair graph, then one representative per cluster
# (largest blob wins — the "keep the highest-resolution copy" heuristic of
# crawled-image dedup; ties break to the lowest media_id).  Same machinery
# as the text clusters: distributed Hash-Min label propagation with a
# control-only driver loop, window over the (tiny) cluster frame.


def media_phash_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, kept_media_id, kept_bytes, n_members, n_dropped) per
    pHash near-dup cluster."""
    from pyspark.sql import Window

    from .corpus import _connected_components

    pairs = media_phash_dedup(spark, sf_dir)
    edges = pairs.select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
    clusters = _connected_components(edges).select(
        F.col("node").alias("media_id"), F.col("label").alias("cluster_id")
    )
    sizes = synth_media(spark, sf_dir).select(
        "media_id", F.expr("CAST(octet_length(content) AS BIGINT)").alias("n_bytes")
    )
    j = clusters.join(sizes, "media_id")
    by_cluster = Window.partitionBy("cluster_id")
    rank_w = by_cluster.orderBy(F.col("n_bytes").desc(), F.col("media_id"))
    return (
        j.withColumn("rk", F.row_number().over(rank_w))
        .withColumn("n_members", F.count(F.lit(1)).over(by_cluster))
        .where(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("media_id").alias("kept_media_id"),
            F.col("n_bytes").alias("kept_bytes"),
            F.col("n_members").cast("bigint").alias("n_members"),
            (F.col("n_members") - F.lit(1)).cast("bigint").alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


def _phash_resolve_oracle() -> str:
    return f"""
WITH RECURSIVE
p AS (SELECT a_id, b_id FROM ({PHASH_ORACLE}) t),
edges AS (SELECT a_id AS a, b_id AS b FROM p UNION SELECT b_id, a_id FROM p),
reach AS (
  SELECT a, a AS b FROM (SELECT DISTINCT a FROM edges) n
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clusters AS (
  SELECT a AS media_id, CAST(min(b) AS BIGINT) AS cluster_id
  FROM reach GROUP BY a),
sizes AS (
  SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents WHERE doc_id % 3 = 0),
m AS (SELECT c.cluster_id, c.media_id, s.n_bytes
      FROM clusters c JOIN sizes s USING (media_id))
SELECT cluster_id, media_id AS kept_media_id, n_bytes AS kept_bytes,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
       CAST(count(*) OVER (PARTITION BY cluster_id) - 1 AS BIGINT) AS n_dropped
FROM m
QUALIFY row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_bytes DESC, media_id) = 1
ORDER BY cluster_id
"""


register("media_phash_resolve", media_phash_resolve, _phash_resolve_oracle())


# -- incremental image dedup (new crawl batch vs existing corpus) ---------------
#
# The image lane's counterpart of dedup_incremental: per-crawl ingest
# checks ONLY the incoming batch against what is already kept — work is
# O(|new| · band-bucket occupancy), never all-pairs over everything.  The
# "incoming batch" is a deterministic slice like the text pipeline's
# (at deployment it is the crawl/partition id); mod 2 here so the split
# actually bisects the near-dup pairs at every test SF (image ids are all
# multiples of 3, and the sparse pair set straddles the even/odd split
# where a 1-in-7 slice misses it entirely at sf<=0.01).

PHASH_NEW_MOD = 2


def media_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, kind, match_id, hamming) for every new-batch image with
    a Hamming≤HAM_K match in the existing corpus: kind = 'exact' when the
    63-bit hashes are identical, else 'near'; match = lowest (hamming,
    media_id) existing neighbor."""
    from pyspark.sql import Window

    hashed = phash_images(synth_media(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    bands = _bands(hashed)
    is_new = F.col("media_id") % PHASH_NEW_MOD == 0
    cand = (
        bands.where(is_new)
        .alias("n")
        .join(
            bands.where(~is_new).alias("e"),
            (F.col("n.band") == F.col("e.band"))
            & (F.col("n.bv") == F.col("e.bv")),
        )
        .select(
            F.col("n.media_id").alias("media_id"),
            F.col("e.media_id").alias("match_id"),
            F.expr("CAST(bit_count(n.phash ^ e.phash) AS INT)").alias(
                "hamming"
            ),
        )
        .distinct()
        .where(F.col("hamming") <= HAM_K)
    )
    w = Window.partitionBy("media_id").orderBy("hamming", "match_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "media_id",
            F.when(F.col("hamming") == 0, "exact").otherwise("near").alias(
                "kind"
            ),
            "match_id",
            "hamming",
        )
        .orderBy("media_id")
    )


def _phash_incremental_oracle() -> str:
    return f"""
WITH {_hash_ctes()},
cand AS (
  SELECT DISTINCT n.media_id AS media_id, e.media_id AS match_id,
         CAST(bit_count(xor(n.phash, e.phash)) AS INT) AS hamming
  FROM bands n JOIN bands e ON n.band = e.band AND n.bv = e.bv
  WHERE n.media_id % {PHASH_NEW_MOD} = 0
    AND e.media_id % {PHASH_NEW_MOD} != 0
    AND bit_count(xor(n.phash, e.phash)) <= {HAM_K})
SELECT media_id,
       CASE WHEN hamming = 0 THEN 'exact' ELSE 'near' END AS kind,
       match_id, hamming
FROM cand
QUALIFY row_number() OVER (PARTITION BY media_id
                           ORDER BY hamming, match_id) = 1
ORDER BY media_id
"""


register(
    "media_phash_incremental",
    media_phash_incremental,
    _phash_incremental_oracle(),
)
