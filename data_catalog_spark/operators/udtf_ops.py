"""Python UDTF operator — keyword-in-context (KWIC) concordance.

Showcases Spark's user-defined TABLE function extension point (the clean
home for row → many-rows transforms that built-ins can't express): a
`@udtf` class registered and invoked via SQL `LATERAL`.  The executor
fans the lateral join out per input partition — no driver involvement, no
explode-then-filter detour materialising every word.

KWIC itself: every occurrence of a query term in every document, with the
±3-word context window — the classic concordance view used for corpus
inspection before filtering decisions.  The DuckDB oracle re-expresses it
relationally (split → unnest-with-ordinality → slice), so the UDTF's
Python logic is value-checked against an independent engine.

Scale: the UDTF is row-local (no state, no shuffle); cost is one scan.
For a hot path this compiles to the same shape as posexplode + window
slicing, but the UDTF keeps the window arithmetic in one readable place.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..io import read_table
from .registry import register

KWIC_TERM = "merge"
KWIC_WINDOW = 3


@udtf(returnType="pos: int, context: string")
class KwicUDTF:
    """Emit (1-based word position, ±KWIC_WINDOW-word context) per
    occurrence of ``term`` in ``text``."""

    def eval(self, text: str, term: str):  # noqa: D102 — UDTF contract
        if not text:
            return
        words = re.split(r"\s+", text)
        for i, w in enumerate(words):
            if w == term:
                lo = max(0, i - KWIC_WINDOW)
                hi = min(len(words), i + KWIC_WINDOW + 1)
                yield i + 1, " ".join(words[lo:hi])


def docs_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("kwic", KwicUDTF)
    return spark.sql(
        f"""
        SELECT d.doc_id, k.pos, k.context
        FROM documents d, LATERAL kwic(d.text, '{KWIC_TERM}') k
        ORDER BY d.doc_id, k.pos
        """
    )


KWIC_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS arr FROM documents
), u AS (
  SELECT doc_id, unnest(arr) AS word,
         generate_subscripts(arr, 1) AS pos, arr
  FROM w
)
SELECT doc_id,
       CAST(pos AS INTEGER) AS pos,
       array_to_string(
         arr[greatest(1, pos - {KWIC_WINDOW}):least(len(arr), pos + {KWIC_WINDOW})],
         ' ') AS context
FROM u
WHERE word = '{KWIC_TERM}'
ORDER BY doc_id, pos
"""


register("docs_kwic", docs_kwic, KWIC_ORACLE)
