"""CRUD / DDL on the parquet-backed `datasets` catalog table.

Re-expresses the reference's document lifecycle (SURVEY §2.1, S2-S8):

- S2 point lookup      — metadata_entry.py:137-144, bases.py:51-63
- S3 upsert sink       — metadata_entry.py:169-181 (created vs updated)
- S4 partial update    — metadata_entry.py:238-260 (schema-keys-only patch)
- S5 delete by id      — metadata_entry.py:191-214, bases.py:65-83
- S6 bulk load         — elastic_admin.py:54-83 (skip invalid rows)
- S7/S8 create/drop    — app.py:89-112, elastic_admin.py:41-52

Storage model: a directory of parquet files + atomic directory swap per
commit (copy-on-write).  On a real deployment this class is a thin wrapper
over Delta/Iceberg ``MERGE INTO`` keyed on ``id`` — the call surface is
written so that swap-out is mechanical (each mutator builds the post-image
DataFrame; only ``_commit`` knows the storage).  The reference's explicit
index flush for read-your-writes (bases.py:82, R8) is a no-op here: a
committed parquet/Delta snapshot is immediately visible to new reads.

Scale notes (100 TB ingestion): mutations are expressed as *batch merges*
(anti-join + union), never per-row loops — ``bulk_upsert`` is the primitive
and single-entry ops delegate to it, so the same code path micro-batches.
At scale, partition by ``isPublic`` + bucket by ``orgUUID`` so the security
predicate of every search becomes partition pruning.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .errors import EntryNotFoundError, InvalidEntryError
from .schema import COLUMN_ORDER, DATASETS_SCHEMA, transform_entry, validate_entry


class DatasetsCatalog:
    """A parquet-backed catalog table with id-keyed upsert semantics."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- DDL ---------------------------------------------------------------

    def create_if_not_exists(self) -> None:
        """S7: idempotent create (reference swallows IndexAlreadyExists,
        app.py:101-109 / R9)."""
        if not self._exists():
            empty = self.spark.createDataFrame([], DATASETS_SCHEMA)
            self._commit(empty)

    def drop(self) -> None:
        """S8: drop the whole table (elastic_admin.py:41-52)."""
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)

    def _exists(self) -> bool:
        return self._latest_version() is not None

    # -- version log -------------------------------------------------------
    #
    # Each commit writes a NEW immutable snapshot directory and then
    # atomically repoints a VERSION file — the minimal shape of a
    # Delta/Iceberg transaction log.  Readers holding an old snapshot keep
    # a consistent view (snapshot isolation); ``df(version=n)`` is time
    # travel; ``vacuum`` is retention.

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, "snapshots", f"v{version:06d}")

    def _latest_version(self) -> int | None:
        vf = os.path.join(self.path, "VERSION")
        try:
            with open(vf) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def versions(self) -> list[int]:
        """All retained snapshot versions, oldest first."""
        snapdir = os.path.join(self.path, "snapshots")
        if not os.path.isdir(snapdir):
            return []
        out = []
        for name in os.listdir(snapdir):
            if name.startswith("v"):
                try:
                    out.append(int(name[1:]))
                except ValueError:
                    pass
        return sorted(out)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (never the
        current one); returns the versions removed."""
        keep_last = max(1, keep_last)
        vs = self.versions()
        current = self._latest_version()
        removed = []
        for v in vs[:-keep_last] if len(vs) > keep_last else []:
            if v == current:
                continue
            shutil.rmtree(self._snapshot_dir(v), ignore_errors=True)
            removed.append(v)
        return removed

    # -- reads -------------------------------------------------------------

    def df(self, version: int | None = None) -> DataFrame:
        """Current table, or a time-travel read of an older snapshot."""
        self.create_if_not_exists()
        if version is None:
            version = self._latest_version()
        snap = self._snapshot_dir(version)
        if not os.path.isdir(snap):
            raise EntryNotFoundError(f"version {version}")
        return self.spark.read.schema(DATASETS_SCHEMA).parquet(snap)

    def diff(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Change data capture between two snapshots: one row per changed
        id with ``change`` ∈ {insert, delete, update} (the time-travel
        complement — Delta CDF's read shape).  Full-outer join on id with
        a whole-row fingerprint; both sides are snapshot scans, so the
        diff is itself a plain distributed plan."""
        old = self.df(version=v_from)
        new = self.df(version=v_to)  # None → latest
        fp = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in COLUMN_ORDER]))
        o = old.select(F.col("id").alias("o_id"), fp.alias("o_fp"))
        n = new.select(F.col("id").alias("n_id"), fp.alias("n_fp"))
        j = o.join(n, o.o_id == n.n_id, "full_outer")
        return (
            j.select(
                F.coalesce("o_id", "n_id").alias("id"),
                F.when(F.col("o_id").isNull(), "insert")
                .when(F.col("n_id").isNull(), "delete")
                .when(F.col("o_fp") != F.col("n_fp"), "update")
                .alias("change"),
            )
            .where(F.col("change").isNotNull())
            .orderBy("id")
        )

    def get(self, entry_id: str) -> dict:
        """S2: point lookup by id; EntryNotFoundError -> 404."""
        rows = self.df().where(F.col("id") == F.lit(entry_id)).limit(1).collect()
        if not rows:
            raise EntryNotFoundError(entry_id)
        return rows[0].asDict()

    def count(self) -> int:
        return self.df().count()

    # -- writes ------------------------------------------------------------

    def upsert(self, entry_id: str, entry: dict) -> bool:
        """S3: insert-or-replace the whole document under ``id``.

        Returns True when created, False when updated (the reference's
        201-vs-200 distinction, metadata_entry.py:169-181).
        """
        created, _ = self.bulk_upsert([(entry_id, entry)])
        return entry_id in created

    def bulk_upsert(
        self, entries: list[tuple[str, dict]], *, skip_invalid: bool = False
    ) -> tuple[set, list]:
        """S6: micro-batched merge; returns (created_ids, rejects).

        With ``skip_invalid`` mirrors the admin bulk load (invalid rows are
        skipped and reported, elastic_admin.py:54-83); otherwise the first
        invalid entry raises (the PUT path).
        """
        rows, rejects = [], []
        for entry_id, entry in entries:
            try:
                body = transform_entry(entry)
            except InvalidEntryError as e:
                if not skip_invalid:
                    raise
                rejects.append((entry_id, str(e)))
                continue
            body["id"] = str(entry_id)
            rows.append(body)
        if not rows:
            return set(), rejects
        return self._merge_rows(rows), rejects

    def _merge_rows(self, rows: list[dict]) -> set:
        """MERGE post-validated full rows keyed on id; returns created ids.

        anti-join + union == WHEN MATCHED UPDATE / NOT MATCHED INSERT for
        whole-row replacement; plan size is independent of batch
        cardinality (no id-literal lists), so 10^6-row ingest batches keep
        the same plan shape.  Within a batch, last write wins per id — the
        reference's sequential-index semantics (elastic_admin.py:54-83).
        """
        last: dict[str, dict] = {}
        for r in rows:
            last[r["id"]] = r
        batch = self.spark.createDataFrame(
            [Row(**{c: r.get(c) for c in COLUMN_ORDER}) for r in last.values()],
            DATASETS_SCHEMA,
        )
        current = self.df()
        batch_ids = batch.select("id")
        # matched ids only — bounded by the batch size, never the table
        existing = {
            r["id"]
            for r in current.select("id").join(batch_ids, "id", "left_semi").collect()
        }
        merged = current.join(batch_ids, "id", "left_anti").unionByName(batch)
        self._commit(merged)
        return set(last) - existing

    def partial_update(self, entry_id: str, patch: dict) -> None:
        """S4: patch a subset of fields of one document.

        Unknown keys are rejected (metadata_entry.py:239-241); missing id
        raises EntryNotFoundError.
        """
        problems = validate_entry(patch, partial=True)
        if problems:
            raise InvalidEntryError("; ".join(problems))
        current = self.get(entry_id)  # raises if missing
        current.update(patch)
        # Bypass ingest validation: the stored row carries fields (storeType)
        # that PUT cannot set but a patch must preserve.
        self._merge_rows([current])

    def delete(self, entry_id: str) -> dict:
        """S5: delete one document; returns the deleted entry so the caller
        can run cascade hooks (dataset_delete.py:31-48 derives downstream
        delete targets from targetUri).  Read-your-writes is free (R8)."""
        entry = self.get(entry_id)
        self._commit(self.df().where(F.col("id") != F.lit(entry_id)))
        return entry

    # -- storage -----------------------------------------------------------

    def _commit(self, df: DataFrame) -> None:
        """Versioned copy-on-write commit: write the post-image as a new
        immutable snapshot, then atomically repoint the VERSION file
        (write-temp + rename).  Old snapshots stay readable until
        ``vacuum`` — genuine snapshot isolation, the single-node shape of a
        Delta/Iceberg commit.
        """
        os.makedirs(os.path.join(self.path, "snapshots"), exist_ok=True)
        new_version = (self._latest_version() or 0) + 1
        snap = self._snapshot_dir(new_version)
        tmp = os.path.join(
            tempfile.mkdtemp(dir=os.path.join(self.path, "snapshots")),
            f"commit-{uuid.uuid4().hex}",
        )
        df.write.mode("overwrite").parquet(tmp)
        # an orphan snap dir (commit crashed after the move but before the
        # VERSION repoint) was never referenced — clear it, else
        # shutil.move would nest the new data INSIDE it
        if os.path.isdir(snap):
            shutil.rmtree(snap)
        shutil.move(tmp, snap)
        shutil.rmtree(os.path.dirname(tmp), ignore_errors=True)
        vtmp = os.path.join(self.path, f".VERSION.{uuid.uuid4().hex}")
        with open(vtmp, "w") as f:
            f.write(str(new_version))
        os.replace(vtmp, os.path.join(self.path, "VERSION"))
