"""Custom Python DataSource: the reference's paginated catalog export/import
as a first-class Spark connector.

The reference's only bulk-export path walks the index page by page with
``from``/``size`` (tools/elastic_migrate_tool.py:52-53) and its bulk import
replays a JSON array (elastic_admin.py:54-83).  Here that pagination contract
becomes an on-disk format — ordered JSON-lines page files plus a manifest of
per-page statistics — and a Spark 4 Python DataSource
(`pyspark.sql.datasource`) reads it back with:

- one input partition PER PAGE (parallel scan; the reference's walker is
  sequential),
- **filter pushdown** (`pushFilters`): equality/IN predicates on `orgUUID`
  prune whole pages via the manifest's per-page org set — partition pruning
  in a pure-Python source — and are then applied row-level inside `read`,
  so Spark never sees the filtered rows at all.

Scale notes: a Python data source pays one Arrow-batch hop per partition —
fine for catalog-sized metadata (the reference's domain), wrong for the
100 TB fact tables, which stay on the native parquet reader.  The export
writer streams pages via ``toLocalIterator`` (one partition in memory at a
time), mirroring the reference's sequential page walk instead of a
collect-everything export.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .schema import COLUMN_ORDER, DATASETS_SCHEMA

MANIFEST = "_manifest.json"
FORMAT_NAME = "paged_catalog"


def export_paged_json(df: DataFrame, out_dir: str, page_size: int = 100) -> int:
    """Write ``df`` (datasets schema) as ordered JSON-lines pages of
    ``page_size`` rows + a manifest with per-page org statistics.  Returns
    the page count.  Ordering by ``id`` makes the export deterministic —
    the same contract that makes the reference's from/size walk stable."""
    os.makedirs(out_dir, exist_ok=True)
    manifest: list[dict] = []
    page: list[dict] = []

    def flush() -> None:
        i = len(manifest)
        fname = f"page-{i:05d}.json"
        with open(os.path.join(out_dir, fname), "w") as f:
            for row in page:
                f.write(json.dumps(row) + "\n")
        manifest.append(
            {
                "file": fname,
                "n": len(page),
                # `is not None`, NOT truthiness: an empty-string orgUUID is a
                # legal value a pushed filter may target — dropping it from
                # the stats would prune pages that contain matching rows.
                "orgs": sorted({r["orgUUID"] for r in page if r["orgUUID"] is not None}),
            }
        )
        page.clear()

    ordered = df.select(*COLUMN_ORDER).orderBy("id")
    for r in ordered.toLocalIterator():
        page.append(r.asDict())
        if len(page) == page_size:
            flush()
    if page:
        flush()
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return len(manifest)


class _PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PagedCatalogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.org_values: set[str] | None = None  # pushed orgUUID constraint

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Claim equality/IN filters on orgUUID (page-prunable via the
        manifest); everything else is returned for Spark to evaluate.
        Multiple claimed filters are conjuncts — INTERSECT their value
        sets (keeping only the last would silently widen the result)."""

        def claim(values: set) -> None:
            self.org_values = (
                values if self.org_values is None else self.org_values & values
            )

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("orgUUID",):
                claim({f.value})
            elif isinstance(f, In) and f.attribute == ("orgUUID",):
                claim(set(f.value))
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        with open(os.path.join(self.path, MANIFEST)) as f:
            manifest = json.load(f)
        parts = []
        for entry in manifest:
            if self.org_values is not None and not (
                self.org_values & set(entry["orgs"])
            ):
                continue  # page pruned: no row can satisfy the predicate
            parts.append(_PagePartition(os.path.join(self.path, entry["file"])))
        return parts

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        with open(partition.path) as f:
            for line in f:
                row = json.loads(line)
                if self.org_values is not None and row["orgUUID"] not in self.org_values:
                    continue
                yield tuple(row[c] for c in COLUMN_ORDER)


class PagedCatalogStreamReader(SimpleDataSourceStreamReader):
    """Change-feed over the paged export: offset = number of pages consumed,
    each micro-batch reads the pages appended since the last offset.  This
    is the consumer the reference never had for its NATS "entry added"
    events (notifier.py:45-63 fires and forgets): the page log doubles as a
    durable, replayable queue, and `readBetweenOffsets` gives exact replay
    on recovery."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def _manifest(self) -> list[dict]:
        try:
            with open(os.path.join(self.path, MANIFEST)) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:
        return {"pages": 0}

    def _rows(self, start: int, end: int) -> Iterator[tuple]:
        manifest = self._manifest()
        for entry in manifest[start:end]:
            with open(os.path.join(self.path, entry["file"])) as f:
                for line in f:
                    row = json.loads(line)
                    yield tuple(row[c] for c in COLUMN_ORDER)

    def read(self, start: dict):
        # materialized list, not a generator: the runner caches the batch
        # (pickle) so a following readBetweenOffsets replay is free
        end = len(self._manifest())
        return list(self._rows(start["pages"], end)), {"pages": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(self._rows(start["pages"], end["pages"]))


class PagedCatalogDataSource(DataSource):
    """`spark.read.format("paged_catalog").option("path", dir).load()`
    (batch) / `spark.readStream...` (incremental change feed)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return DATASETS_SCHEMA

    def reader(self, schema) -> PagedCatalogReader:
        return PagedCatalogReader(self.options)

    def simpleStreamReader(self, schema) -> PagedCatalogStreamReader:
        return PagedCatalogStreamReader(self.options)


def register_paged_source(spark: SparkSession) -> None:
    # Python-source filter pushdown is gated off by default (Spark 4.1) and
    # required before a pushFilters reader is planned.  session.get_spark
    # sets it at build time; for sessions built elsewhere, set it here too —
    # documented session-wide effect of registering this source.
    if spark.conf.get("spark.sql.python.filterPushdown.enabled", "false") != "true":
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedCatalogDataSource)


def read_paged_catalog(spark: SparkSession, path: str) -> DataFrame:
    register_paged_source(spark)
    return spark.read.format(FORMAT_NAME).option("path", path).load()
