"""data_catalog_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of trustedanalytics/data-catalog.

The reference (/root/reference) is a Flask compiler targeting ElasticSearch;
this package re-expresses its semantics Spark-first:

- ``schema``     — the `datasets` metadata-entry schema + ingest validation
                   (reference: data_catalog/metadata_entry.py:41-94).
- ``analyzers``  — the english/standard/uri text analyzers as deterministic
                   tokenizers (reference: data_catalog/configuration_const.py:21-84).
- ``query``      — the Data-Catalog JSON query compiler: filter segregation,
                   security-predicate injection, text scoring
                   (reference: data_catalog/query_translation.py).
- ``search``     — plan execution: hits / total / facets on a DataFrame
                   (reference: data_catalog/search.py).
- ``catalog``    — CRUD / DDL on the parquet-backed catalog table
                   (reference: data_catalog/metadata_entry.py, elastic_admin.py).
- ``operators``  — scale-path data-pipeline operators beyond the reference
                   surface: dedup (exact/minhash/simhash/jaccard/embedding),
                   similarity search, text analysis, sessionization, multimodal.
- ``streaming``  — Structured Streaming over the events table.
"""

__version__ = "0.1.0"
