"""Inverted text index for catalog search — the write-time structure the
reference's backing store (Elasticsearch) actually builds for its analyzed
fields (data_catalog/configuration_const.py:21-84), re-expressed as a
postings parquet table.

The scan-based search path (search.py) evaluates the three text clauses as
regex/contains over every visible row — correct, codegen'd, but O(corpus)
per query.  This module is the scale path: a write-once postings table

    (field, gram, id)

with three posting families:

- ``title``      → character TRIGRAMS of the lowered title.  The title
  clause is a *substring* match (T1 wildcard semantics), so token postings
  cannot serve it; char n-grams can — ``q ⊆ title`` implies every trigram
  of q appears in the title, so probing ALL query trigrams and keeping ids
  that matched every one yields a candidate superset (ES's own
  ngram-analyzer wildcard acceleration).
- ``dataSample`` → standard-analyzer tokens.  The boundary-delimited regex
  the scan path uses is exactly token-set intersection
  (analyzers.token_match_pattern's equivalence guarantee), so token
  postings are lossless for this clause.
- ``sourceUri``  → uri-analyzer tokens, same argument.
- ``title_stem`` → PORTER-STEMMED standard-analyzer tokens of the title —
  the write-time shape of ES's `english` analyzer (reference
  configuration_const.py:26-29).  Stemmed-token-set intersection is
  token-equality over this family, so the probe is lossless; stemming
  moves off the per-query scan path (the r4 1.83 s regression) onto the
  write path, which is where ES itself pays it.

Candidates from the three clause arms union, then the EXACT compiled
predicate + scoring re-runs on the semi-joined candidates — the index
accelerates, never decides, so results are bit-identical to the scan path
and the same DuckDB oracle checks both.

Scale notes (100 TB): the postings table is partitioned by ``field``
(partition pruning per clause) and the gram probe is an IN-list pushed to
the parquet scan (row-group skipping on gram min/max); at deployment scale
it would additionally be bucketed by gram so probe joins co-locate, and the
ALL-trigrams title probe would use only the k rarest query grams (df stats)
— the candidate-superset property survives any gram subset.  A hot-gram
posting list is O(corpus); the title probe's count-match keeps the work per
candidate bounded by the query length, and the standard df-cutoff guard
(dedup.MAX_SHINGLE_DF shape) applies if degenerate grams dominate.

Queries whose title probe is shorter than one trigram (len < 3) fall back
to the scan path for that clause only — documented, and exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import analyzers, search
from .io import materialization_path
from .query.compiler import CompiledQuery

TITLE_GRAM = 3


def text_index_path(sf_dir: str) -> str:
    """Postings dir keyed by the source table's content stat — see
    io.materialization_path (datasets derive from part.parquet).  The
    kind carries an index-format version: v2 added the title_stem family,
    and a v1 dir on disk must not be reused (its probes would silently
    return zero candidates for stem queries)."""
    return materialization_path(sf_dir, "text-index-v2", "part.parquet")


def build_text_index(ds: DataFrame, path: str) -> None:
    """Write the postings table: one row per (field, gram, id), distinct.
    Map-only explode + a distinct per field — one shuffle on the slim
    (field, gram, id) triple; hive-partitioned by field."""
    # the length filter also guards the sub-trigram title edge: Spark's
    # sequence(1, 0) is the DESCENDING [1, 0], so a title shorter than one
    # trigram would otherwise emit junk sub-length grams into the index
    trigrams = F.expr(
        f"array_distinct(filter(transform(sequence(1, greatest(length(lower(title)) - "
        f"{TITLE_GRAM - 1}, 1)), i -> substring(lower(title), i, {TITLE_GRAM})), "
        f"x -> length(x) = {TITLE_GRAM}))"
    )
    std_tokens = F.expr(
        f"array_distinct(filter(split(lower(dataSample), "
        f"'{analyzers.STANDARD_SPLIT}'), x -> x != ''))"
    )
    uri_stop = ", ".join(f"'{w}'" for w in sorted(analyzers.URI_STOPWORDS))
    uri_tokens = F.expr(
        f"array_distinct(filter(split(lower(sourceUri), '{analyzers.URI_SPLIT}'), "
        f"x -> x != '' AND NOT array_contains(array({uri_stop}), x)))"
    )
    title_tokens = (
        f"filter(split(lower(title), '{analyzers.STANDARD_SPLIT}'), x -> x != '')"
    )
    stem_tokens = F.expr(
        f"array_distinct({analyzers.spark_stem_transform(title_tokens)})"
    )
    parts = [
        ds.select(F.lit("title").alias("field"), F.explode(trigrams).alias("gram"), "id"),
        ds.select(
            F.lit("dataSample").alias("field"), F.explode(std_tokens).alias("gram"), "id"
        ),
        ds.select(
            F.lit("sourceUri").alias("field"), F.explode(uri_tokens).alias("gram"), "id"
        ),
        ds.select(
            F.lit("title_stem").alias("field"), F.explode(stem_tokens).alias("gram"), "id"
        ),
    ]
    postings = parts[0]
    for p in parts[1:]:
        postings = postings.unionByName(p)
    postings.distinct().write.mode("overwrite").partitionBy("field").parquet(path)


def text_candidates(
    spark: SparkSession, index_path, text: str, scan_df: DataFrame
) -> DataFrame:
    """1-column (id) candidate frame — a SUPERSET of the docs any of the
    three text clauses can match, from postings probes only (plus the
    documented short-query scan fallback for the title clause).
    ``index_path``: a postings dir, or a live postings DataFrame (the
    SegmentedTextIndex read view)."""
    idx = (
        index_path
        if isinstance(index_path, DataFrame)
        else spark.read.parquet(index_path)
    )
    q = text.lower()
    arms: list[DataFrame] = []
    if len(q) >= TITLE_GRAM:
        grams = sorted({q[i : i + TITLE_GRAM] for i in range(len(q) - TITLE_GRAM + 1)})
        arms.append(
            idx.where((F.col("field") == "title") & F.col("gram").isin(grams))
            .groupBy("id")
            .agg(F.count_distinct("gram").alias("ng"))
            .where(F.col("ng") == len(grams))
            .select("id")
        )
    else:
        # sub-trigram probe: the index cannot serve a substring this short —
        # scan fallback for the title clause only
        arms.append(
            scan_df.where(F.lower(F.col("title")).contains(q)).select("id")
        )
    std = analyzers.standard_tokens(text)
    if std:
        arms.append(
            idx.where((F.col("field") == "dataSample") & F.col("gram").isin(std)).select("id")
        )
    uri = analyzers.uri_tokens(text)
    if uri:
        arms.append(
            idx.where((F.col("field") == "sourceUri") & F.col("gram").isin(uri)).select("id")
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.distinct()


def indexed_hits(
    spark: SparkSession, ds: DataFrame, index_path: str, cq: CompiledQuery
) -> DataFrame:
    """The scan-path hits pipeline over the index-narrowed candidate set:
    semi-join candidates into the datasets scan, then re-apply the EXACT
    compiled predicate + scoring — identical output contract (and oracle)
    to ``search.hits`` on the full scan."""
    if not cq.text:
        return search.hits(ds, cq)
    cand = text_candidates(spark, index_path, cq.text, ds)
    return search.hits(ds.join(cand, "id", "left_semi"), cq)


def stem_candidates(
    spark: SparkSession, index_path, stemmed_terms: list[str]
) -> DataFrame:
    """1-column (id) candidates for a stemmed-title match: ids with ANY
    posting in the title_stem family matching a probe term.  Because the
    family stores exactly the stemmed standard tokens, this probe is
    LOSSLESS for arrays_overlap(stemmed_tokens, probes) — the candidate
    set IS the answer set; the caller still re-applies the exact scan
    predicate on the semi-joined rows so the index can only ever
    accelerate, never decide."""
    idx = (
        index_path
        if isinstance(index_path, DataFrame)
        else spark.read.parquet(index_path)
    )
    return (
        idx.where((F.col("field") == "title_stem") & F.col("gram").isin(stemmed_terms))
        .select("id")
        .distinct()
    )


def indexed_hits_df(
    spark: SparkSession, ds: DataFrame, postings: DataFrame, cq: CompiledQuery
) -> DataFrame:
    """``indexed_hits`` over a live postings DataFrame (segmented-index
    read view) instead of a materialized dir."""
    if not cq.text:
        return search.hits(ds, cq)
    cand = text_candidates(spark, postings, cq.text, ds)
    return search.hits(ds.join(cand, "id", "left_semi"), cq)


# -- incremental (segmented) index -------------------------------------------
#
# The static materialization above serves an immutable corpus; a LIVE
# catalog needs the ES behavior — writes keep search in sync.  Lucene's
# answer is segments, re-expressed in parquet:
#
#   seg-000/postings/   (+ _ids.json, _tombstones.json)
#   seg-001/postings/   ...
#
# Each upsert batch becomes a NEW immutable segment holding the full
# postings of the affected docs; the batch's ids are tombstoned in every
# earlier segment that contains them (per-segment id lists make that an
# O(|batch| × segments) driver-side set operation — at deployment scale
# the id lists become bloom/roaring sidecars, same protocol).  The read
# view unions live rows of every segment, so queries see every committed
# write immediately; ``compact()`` folds the chain back to one segment,
# dropping dead postings — exactly Lucene's merge.


class SegmentedTextIndex:
    """Incremental postings index with Lucene-style segment + tombstone
    maintenance.  All postings reads are plain distributed scans; only id
    LISTS (bounded by batch sizes) touch the driver."""

    def __init__(self, spark: SparkSession, path: str):
        import os

        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- segment bookkeeping ---------------------------------------------

    def _segments(self) -> list[str]:
        import os

        return sorted(d for d in os.listdir(self.path) if d.startswith("seg-"))

    def _seg_dir(self, name: str) -> str:
        import os

        return os.path.join(self.path, name)

    def _read_meta(self, seg: str, fname: str) -> list[str]:
        import json
        import os

        try:
            with open(os.path.join(self._seg_dir(seg), fname)) as f:
                out = json.load(f)
                return out if isinstance(out, list) else []
        except OSError:
            return []
        # note: no ValueError catch — _write_meta is atomic (tmp+rename),
        # so invalid JSON here is real corruption and must surface

    def _write_meta(self, seg: str, fname: str, ids: list[str]) -> None:
        """Atomic metadata write (tmp + rename): a crash mid-write must
        leave the previous file intact — the module's crash contract is
        STALE, never broken."""
        import json
        import os
        import uuid

        final = os.path.join(self._seg_dir(seg), fname)
        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(sorted(set(ids)), f)
        os.replace(tmp, final)

    # -- writes -----------------------------------------------------------

    def _new_segment(self, ds_slice: DataFrame, ids: list[str]) -> None:
        import os

        name = f"seg-{len(self._segments()):03d}"
        build_text_index(ds_slice, os.path.join(self._seg_dir(name), "postings"))
        self._write_meta(name, "_ids.json", ids)
        self._write_meta(name, "_tombstones.json", [])

    def rebuild(self, ds: DataFrame) -> None:
        """Full (re)build as the single base segment."""
        import shutil

        for seg in self._segments():
            shutil.rmtree(self._seg_dir(seg))
        ids = [r.id for r in ds.select("id").collect()]
        self._new_segment(ds, ids)

    def upsert(self, ds_slice: DataFrame) -> None:
        """Index the docs in ``ds_slice`` (new or changed): one new
        segment with their postings; their old postings in earlier
        segments are tombstoned."""
        ids = [r.id for r in ds_slice.select("id").collect()]
        self.delete(ids)
        self._new_segment(ds_slice, ids)

    def delete(self, ids: list[str]) -> None:
        """Tombstone every existing posting of ``ids`` (pure metadata —
        no data file is rewritten)."""
        batch = set(ids)
        for seg in self._segments():
            hit = batch & set(self._read_meta(seg, "_ids.json"))
            if hit:
                self._write_meta(
                    seg,
                    "_tombstones.json",
                    self._read_meta(seg, "_tombstones.json") + sorted(hit),
                )

    # -- reads ------------------------------------------------------------

    def postings(self) -> DataFrame:
        """Live postings: union of segments minus each segment's
        tombstoned ids (the per-seg dead list is an isin filter —
        bounded by that segment's superseded batch sizes)."""
        import os

        parts = []
        for seg in self._segments():
            # explicit schema: an empty segment (zero-row upsert / compact
            # of an empty index) has no footers to infer from
            df = self.spark.read.schema("gram STRING, id STRING, field STRING").parquet(
                os.path.join(self._seg_dir(seg), "postings")
            )
            dead = self._read_meta(seg, "_tombstones.json")
            if dead:
                df = df.where(~F.col("id").isin(dead))
            parts.append(df.select("gram", "id", "field"))
        if not parts:
            return self.spark.createDataFrame(
                [], "gram string, id string, field string"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def compact(self) -> int:
        """Lucene merge: fold the segment chain into one segment holding
        only live postings; returns the resulting segment count (1)."""
        import os
        import shutil
        import uuid

        live = self.postings()
        ids = sorted({r.id for r in live.select("id").distinct().collect()})
        tmp = f"{self.path}.merge-{uuid.uuid4().hex}"
        merged = SegmentedTextIndex(self.spark, tmp)
        live.write.mode("overwrite").partitionBy("field").parquet(
            os.path.join(tmp, "seg-000", "postings")
        )
        merged._write_meta("seg-000", "_ids.json", ids)
        merged._write_meta("seg-000", "_tombstones.json", [])
        old = f"{self.path}.old-{uuid.uuid4().hex}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)
        return len(self._segments())
