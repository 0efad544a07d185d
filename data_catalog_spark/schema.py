"""The `datasets` metadata-entry schema + ingest validation.

Logical schema = the reference's Cerberus validation schema
(data_catalog/metadata_entry.py:41-52) ∪ the ES physical mapping
(data_catalog/configuration_const.py:21-66) + ``id`` (the ES ``_id``,
data_catalog/metadata_entry.py:149, data_catalog/search.py:127-129).

Fixed schema, declared not inferred (SURVEY §1.2): a constant StructType.
``creationTime`` is kept as an ISO-8601 *string* exactly like the reference
stores it — ISO strings order lexicographically == chronologically, which is
what the range filter relies on (data_catalog/query_translation.py:278-291).
"""

from __future__ import annotations

from datetime import datetime
from urllib.parse import urlparse

from pyspark.sql import types as T

from .errors import InvalidEntryError

# Fields a user may filter on == keys of the Cerberus schema
# (data_catalog/query_translation.py:258 checks `filter_type in CERBERUS_SCHEMA`).
FILTERABLE_FIELDS = frozenset(
    {
        "category",
        "creationTime",
        "dataSample",
        "format",
        "isPublic",
        "orgUUID",
        "recordCount",
        "size",
        "sourceUri",
        "targetUri",
        "title",
    }
)

ORG_UUID_FIELD = "orgUUID"
CREATION_TIME_FIELD = "creationTime"
IS_PUBLIC_FIELD = "isPublic"

# Required at ingest (all Cerberus fields except creationTime, which is
# defaulted — data_catalog/metadata_entry.py:88-94).
REQUIRED_FIELDS = frozenset(FILTERABLE_FIELDS - {CREATION_TIME_FIELD})

_STRING_FIELDS = frozenset(
    {"category", "dataSample", "format", "sourceUri", "targetUri", "title", "orgUUID"}
)
_LONG_FIELDS = frozenset({"recordCount", "size"})

DATASETS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("title", T.StringType(), nullable=False),
        T.StructField("category", T.StringType(), nullable=False),
        T.StructField("dataSample", T.StringType(), nullable=False),
        T.StructField("format", T.StringType(), nullable=False),
        T.StructField("recordCount", T.LongType(), nullable=False),
        T.StructField("size", T.LongType(), nullable=False),
        T.StructField("sourceUri", T.StringType(), nullable=False),
        T.StructField("targetUri", T.StringType(), nullable=False),
        # In the physical mapping only — not writable via PUT
        # (data_catalog/configuration_const.py:52-54).
        T.StructField("storeType", T.StringType(), nullable=True),
        T.StructField("isPublic", T.BooleanType(), nullable=False),
        T.StructField("orgUUID", T.StringType(), nullable=False),
        T.StructField("creationTime", T.StringType(), nullable=True),
    ]
)

COLUMN_ORDER = [f.name for f in DATASETS_SCHEMA.fields]


def validate_target_uri(uri: object) -> bool:
    """targetUri must have a scheme and a non-trivial path.

    Reference: data_catalog/metadata_entry.py:82-86 — the exact condition
    is ``scheme and path and path != '/'`` over ``urlparse`` (NOT
    urlsplit: for ``uses_params`` schemes urlparse strips ``;params``
    from the last path segment first, so ``http://host/;a`` has path
    ``'/'`` and is rejected while ``hdfs://host/;a`` keeps ``'/;a'`` and
    passes).  Rejects e.g. ``//onet.pl/``, ``hdfs://onet.pl/``,
    ``http://``, ``some_path`` (tests/test_metadata_entries.py:321-333);
    accepts single-char paths like ``mailto:a`` (path truthy, not '/').
    """
    if not isinstance(uri, str):
        return False
    parsed = urlparse(uri)
    return bool(parsed.scheme) and bool(parsed.path) and parsed.path != "/"


def validate_entry(entry: dict, *, partial: bool = False) -> list[str]:
    """Return a list of validation problems (empty == valid).

    Mirrors the Cerberus schema semantics (data_catalog/metadata_entry.py:41-52):
    unknown keys rejected (Cerberus 0.9.2 default allow_unknown=False, and
    explicitly for partial updates at metadata_entry.py:239-241), type checks,
    required-field checks (skipped when ``partial``).
    """
    problems: list[str] = []
    if not isinstance(entry, dict):
        return ["entry body must be a JSON object"]
    for key, value in entry.items():
        if key not in FILTERABLE_FIELDS:
            problems.append(f"unknown field: {key}")
            continue
        if key in _STRING_FIELDS or key == CREATION_TIME_FIELD:
            if not isinstance(value, str):
                problems.append(f"field {key} must be a string")
        elif key in _LONG_FIELDS:
            if isinstance(value, bool) or not isinstance(value, int):
                problems.append(f"field {key} must be an integer")
        elif key == IS_PUBLIC_FIELD:
            if not isinstance(value, bool):
                problems.append(f"field {key} must be a boolean")
    if not partial:
        for req in sorted(REQUIRED_FIELDS):
            if req not in entry:
                problems.append(f"missing required field: {req}")
    if "targetUri" in entry and not validate_target_uri(entry.get("targetUri")):
        problems.append("targetUri must have a scheme and a non-trivial path")
    return problems


def transform_entry(entry: dict) -> dict:
    """Validate + apply ingest defaults; raise InvalidEntryError on problems.

    Mirrors MetadataIndexingTransformer.transform
    (data_catalog/metadata_entry.py:64-94): validation, then the
    ``creationTime`` default (now().isoformat()).
    """
    problems = validate_entry(entry)
    if problems:
        raise InvalidEntryError("; ".join(problems))
    out = dict(entry)
    if not out.get(CREATION_TIME_FIELD):
        out[CREATION_TIME_FIELD] = datetime.now().isoformat(timespec="seconds")
    out.setdefault("storeType", None)
    return out
