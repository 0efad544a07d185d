"""Registry-wide physical-plan lint — the generalization of audit_joins.py
the r8 verdict asked for: green value hashes can hide plans that die at
100× (the ppl_bucket_profile ntile(3) OVER () was exactly that), so scan
every registered query's executed plan for the scale anti-patterns:

- ``cartesian``      CartesianProduct / BroadcastNestedLoopJoin (the
                     audit_joins.py check, folded in)
- ``global-window``  WindowExec with an EMPTY partitionSpec whose input
                     subtree has no limit — Spark moves the entire input
                     to one task for such a window
- ``single-partition-shuffle``  ShuffleExchange to SinglePartition that
                     is neither the final leg of a global aggregate
                     (partial agg directly below) nor over limited input
- ``coalesce-1``     CoalesceExec to 1 partition over unlimited input
- ``repeated-scan``  the same file relation scanned more than
                     _SCAN_REPEAT_MAX times in one executed plan with no
                     exchange reuse — the r9 web_corpus_funnel defect (28
                     parquet scans of documents behind a green hash);
                     a redundant-scan plan is a constant-factor killer at
                     100 TB even when no single task funnels

Every hit must be adjudicated in ALLOWED below (the audit_joins
discipline: broadcast scalar/query-set, declared ground-truth baseline,
model-sized frame) — pytest (tests/test_plan_audit.py) fails on ANY hit
not listed there, so reintroducing a global ntile is a suite failure,
and on ALLOWED entries that no longer hit (stale adjudications rot).
Adjudications carry the MAX allowed instance count per category (r9
ADVICE: a query already adjudicated for one cartesian must not silently
gain a second, unrelated one), so a NEW instance of an allowed category
still fails the suite.

Usage: python scripts/audit_plans.py [sf_dir]   (default sf0.001 — plan
shape only for batch entries; stream-backed entries do run their
micro-batches to produce a plannable result, as in audit_joins)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Nodes that bound the rows reaching a downstream single-task stage.
_LIMIT_NODES = (
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "WindowGroupLimitExec",  # rank-filter pushdown: caps rows per partition
)
_AGG_NODES = ("HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec")

# A plan may legitimately read a relation a handful of times (both sides
# of a self-join, a totals leg); more than this many scans of the SAME
# files in one plan means a CTE chain is being re-derived per consumer.
_SCAN_REPEAT_MAX = 4


# name -> {category: (max_count, reason)}.  A query may hit several
# categories; every (query, category) pair must be justified here — with
# the number of node instances it is allowed — or the audit fails.
_SCALAR_BCAST = (
    "scalar-broadcast pattern: crossJoin(F.broadcast(·)) of a 1-row "
    "(or few-row bounds) aggregate into the fact scan (ARCHITECTURE.md "
    "join-audit table)"
)
_QUERY_SET_BCAST = (
    "broadcast QUERY/seed SET × partitioned corpus scan — the scanned "
    "side is never duplicated (ARCHITECTURE.md join-audit table)"
)
_SMALL_AGG_WINDOW = (
    "window over a grouped-aggregate frame whose key cardinality is "
    "bounded by the schema (|nation|≤25 / |month|≤84 / |source|≈20), "
    "not by the data volume — model-sized at any SF"
)
ALLOWED: dict[str, dict[str, tuple[int, str]]] = {
    # ---- declared ground-truth baselines (the all-pairs exact twins the
    # banded/bucketed operators are measured against; audit_joins carries
    # the same adjudication) ----
    "embedding_cluster_quality": {
        "cartesian": (1, "labeled ground-truth |labels|^2 Davies-Bouldin matrix"),
    },
    "dedup_embedding_cosine": {
        "cartesian": (1, "declared O(n^2) ground truth; scale path is dedup_embedding_lsh"),
    },
    "range_band_join_quantity": {
        "cartesian": (1, "inherently non-equi band predicate over a constant-size "
        "broadcast band dim; equi-key rewrite noted in its docstring"),
    },
    # ---- broadcast query/seed sets against a partitioned corpus scan ----
    "ann_bruteforce_topk": {"cartesian": (1, _QUERY_SET_BCAST)},
    "ann_pq_topk": {"cartesian": (1, _QUERY_SET_BCAST)},
    "ann_pq_trained_topk": {"cartesian": (1, _QUERY_SET_BCAST)},
    # same ADC scan as ann_pq_topk, corpus side read from the persisted
    # parquet code table instead of the in-session memo
    "ann_pq_reload_topk": {"cartesian": (1, _QUERY_SET_BCAST)},
    # same ADC scan, corpus side = persisted base codes ∪ O(|new|) delta
    "ann_pq_index_append": {"cartesian": (1, _QUERY_SET_BCAST)},
    "ann_int8_topk": {"cartesian": (1, _QUERY_SET_BCAST)},
    "hybrid_search_rrf": {"cartesian": (1, _QUERY_SET_BCAST)},
    "hybrid_search_rrf_bm25": {"cartesian": (1, _QUERY_SET_BCAST)},
    "hard_negative_mining": {"cartesian": (1, _QUERY_SET_BCAST)},
    # ---- repeated reads of WRITTEN process-scratch derived tables ----
    # io.process_scratch_table (r12, r11 verdict ask #7): the memoized
    # signature / fingerprint / probe-union tables are parquet on disk,
    # not executor blocks, so every view reference is a FileScan.  The
    # lint exists to catch re-DERIVATION of a CTE per consumer; these are
    # bounded columnar reads of materialized state — the deployment shape
    # for probe-side tables — with zero recomputation behind them.
    "dedup_incremental": {
        "repeated-scan": (
            2,
            "exact-fp + signature scratch tables read per arm of the "
            "one-statement report (materialized state, no recompute)",
        ),
    },
    "dedup_incremental_indexed": {
        "repeated-scan": (
            2,
            "probe-side union scratch tables read per arm of the "
            "one-statement report (materialized state, no recompute)",
        ),
    },
    # ---- broadcast 1-row totals / scalar thresholds ----
    "bigram_lm_perplexity": {"cartesian": (1, _SCALAR_BCAST)},
    # the scalar |exact-pairs| count crossed onto the 3-row layout
    # literal table (r11 single-pass rewrite) — 1×3 by construction
    "dedup_lsh_tuning_report": {
        "cartesian": (1, _SCALAR_BCAST),
        "repeated-scan": (
            1,
            "the one memoized signature scratch table (written parquet, "
            "io.process_scratch_table) read by the banding pass and the "
            "scoring joins (materialized state, no recompute)",
        ),
    },
    # two 1-row totals (corpus NLL + boost normalizer) over the
    # checkpointed |sources|-row frame; Catalyst folds them into 1-2
    # broadcast nested loops depending on stats
    "doremi_source_weights": {"cartesian": (2, _SCALAR_BCAST)},
    "ppl_bucket_profile": {"cartesian": (1, _SCALAR_BCAST)},
    "cat_more_like_this": {"cartesian": (1, _SCALAR_BCAST)},
    "cat_significant_categories": {"cartesian": (1, _SCALAR_BCAST)},
    "docs_significant_terms": {"cartesian": (1, _SCALAR_BCAST)},
    "dsir_select_topk": {"cartesian": (1, _SCALAR_BCAST)},
    "events_rolling_wau": {"cartesian": (1, _SCALAR_BCAST)},
    "events_value_deciles_eqdepth": {"cartesian": (1, _SCALAR_BCAST)},
    "orders_dow_seasonality": {"cartesian": (1, _SCALAR_BCAST)},
    "q11_important_part_share": {"cartesian": (1, _SCALAR_BCAST)},
    "q22_idle_rich_customers": {"cartesian": (1, _SCALAR_BCAST)},
    "users_hll_mergeable": {"cartesian": (1, _SCALAR_BCAST)},
    # ---- unpartitioned windows over bounded aggregate frames ----
    "nation_revenue_share": {
        "global-window": (1, _SMALL_AGG_WINDOW),
        "single-partition-shuffle": (1, _SMALL_AGG_WINDOW),
    },
    "orders_monthly_growth": {
        "global-window": (1, _SMALL_AGG_WINDOW),
        "single-partition-shuffle": (1, _SMALL_AGG_WINDOW),
    },
    "vocab_growth_heaps": {
        # cumulative-curve window over the FIXED 100-row bucket grid
        # (HEAPS_BUCKETS — arithmetic id-range bucketing, no global row
        # ordering of the corpus feeds it)
        "global-window": (1, _SMALL_AGG_WINDOW),
        "single-partition-shuffle": (1, _SMALL_AGG_WINDOW),
    },
    "source_temperature_mix": {
        # two OVER () sums (natural-share total + temperature renorm),
        # both over the same |source|-row grouped frame
        "global-window": (2, _SMALL_AGG_WINDOW),
        "single-partition-shuffle": (1, _SMALL_AGG_WINDOW),
    },
    "docs_pack_shards": {
        "global-window": (1, "phase 2 of the two-phase prefix sum: the window "
        "runs over per-bucket totals only, and the adaptive bucket width "
        "caps that frame at PACK_MAX_BUCKETS=4096 rows at any corpus size"),
        "single-partition-shuffle": (1, "same phase-2 totals frame (<=4096 rows)"),
    },
}


def _walk(node, fn, depth=0):
    fn(node, depth)
    ch = node.children()
    for i in range(ch.length()):
        _walk(ch.apply(i), fn, depth + 1)


def _subtree_has(node, names: tuple[str, ...]) -> bool:
    found = []

    def probe(n, _d):
        if n.getClass().getSimpleName() in names:
            found.append(True)

    _walk(node, probe)
    return bool(found)


def _is_partial_global_agg(node) -> bool:
    cn = node.getClass().getSimpleName()
    if cn not in _AGG_NODES:
        return False
    try:
        return node.groupingExpressions().isEmpty()
    except Exception:
        return False


def _scan_key(n) -> str | None:
    """Stable identity for a file-relation scan node, None for non-file
    scans (in-memory / RDD / local relations are cheap to re-read)."""
    cn = n.getClass().getSimpleName()
    if cn == "FileSourceScanExec":
        try:
            return "file:" + n.relation().location().rootPaths().mkString(",")
        except Exception:
            return "file:" + n.nodeName()
    if cn == "BatchScanExec":  # DSv2 twin of the same defect class
        try:
            return "v2:" + n.table().name()
        except Exception:
            return "v2:" + n.nodeName()
    return None


def audit_plan(plan) -> dict[str, tuple[int, str]]:
    """category -> (instance_count, example detail) for one executed
    SparkPlan (AQE-unwrapped).  Counts are per NODE INSTANCE so an
    adjudicated query cannot silently gain a second instance of the same
    anti-pattern (r9 ADVICE)."""
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()
    hits: list[tuple[str, str]] = []
    scans: dict[str, int] = {}

    def check(n, _depth):
        cn = n.getClass().getSimpleName()
        key = _scan_key(n)
        if key is not None:
            scans[key] = scans.get(key, 0) + 1
            return
        if cn in ("CartesianProductExec", "BroadcastNestedLoopJoinExec"):
            hits.append(("cartesian", cn))
            return
        if cn == "WindowExec" and n.partitionSpec().isEmpty():
            if not _subtree_has(n, _LIMIT_NODES):
                hits.append(("global-window", "unpartitioned WindowExec"))
            return
        if cn == "ShuffleExchangeExec":
            part = n.outputPartitioning().toString()
            if part == "SinglePartition":
                ch = n.children()
                child = ch.apply(0) if ch.length() else None
                if child is not None and _is_partial_global_agg(child):
                    return  # final leg of a global aggregate: 1 row/task in
                if not _subtree_has(n, _LIMIT_NODES):
                    hits.append(
                        ("single-partition-shuffle", "exchange to 1 partition")
                    )
            return
        if cn == "CoalesceExec":
            try:
                npart = n.numPartitions()
            except Exception:
                return
            if npart == 1 and not _subtree_has(n, _LIMIT_NODES):
                hits.append(("coalesce-1", "coalesce to 1 partition"))

    _walk(plan, check)
    for key, cnt in sorted(scans.items()):
        if cnt > _SCAN_REPEAT_MAX:
            rel = key.split("/")[-1].rstrip(",)") or key
            hits.append(("repeated-scan", f"{rel} scanned {cnt}x, no reuse"))
    out: dict[str, tuple[int, str]] = {}
    for cat, detail in hits:
        n, first = out.get(cat, (0, detail))
        out[cat] = (n + 1, first)
    return out


def audit_registry(spark, sf_dir: str, queries: dict) -> tuple[dict, dict]:
    """Run the lint over every registered query.

    Returns (hits, errors): hits maps name -> {category: (count, detail)}
    for queries with ≥1 anti-pattern; errors maps name -> first error line.
    """
    hits: dict[str, dict[str, tuple[int, str]]] = {}
    errors: dict[str, str] = {}
    for name in sorted(queries):
        try:
            plan = queries[name](spark, sf_dir)._jdf.queryExecution().executedPlan()
            found = audit_plan(plan)
        except Exception as ex:
            errors[name] = str(ex).splitlines()[0][:120]
            continue
        if found:
            hits[name] = found
    return hits, errors


def adjudicate(hits: dict) -> tuple[list, list]:
    """Split registry hits into (allowed, bad) rows given ALLOWED.  A hit
    is adjudicated only when its category is listed AND its instance
    count does not exceed the allowed max — a second cartesian on a
    1-cartesian adjudication is a failure, not a free ride."""
    allowed_rows, bad_rows = [], []
    for name, cats in sorted(hits.items()):
        for cat, (cnt, detail) in sorted(cats.items()):
            exp = ALLOWED.get(name, {}).get(cat)
            if exp is not None and cnt <= exp[0]:
                allowed_rows.append((name, cat, cnt, detail, exp[1]))
            else:
                bad_rows.append((name, cat, cnt, detail, exp))
    return allowed_rows, bad_rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as e
    from data_catalog_spark.session import get_spark

    spark = get_spark(app_name="audit-plans")
    spark.sparkContext.setLogLevel("ERROR")
    hits, errors = audit_registry(spark, sf_dir, e.queries())
    allowed_rows, bad_rows = adjudicate(hits)
    for name, cat, cnt, detail, why in allowed_rows:
        print(f"ALLOWED  {name}: {cat} x{cnt} ({detail}) [{why}]")
    for name, cat, cnt, detail, exp in bad_rows:
        over = f" — exceeds allowed max {exp[0]}" if exp is not None else ""
        print(f"HIT  {name}: {cat} x{cnt} ({detail}){over}")
    n_bad = len(bad_rows)
    stale = [
        (name, cat)
        for name, cats in ALLOWED.items()
        for cat in cats
        if cat not in hits.get(name, {})
    ]
    for name, cat in stale:
        print(f"STALE allowlist entry: {name}: {cat}")
    for name, err in sorted(errors.items()):
        print(f"SKIP {name}: {err}")
    print(
        f"\n{len(hits)} queries with hits, {n_bad} unadjudicated, "
        f"{len(stale)} stale allowlist rows, {len(errors)} skipped"
    )
    spark.stop()
    sys.exit(1 if (n_bad or stale) else 0)


if __name__ == "__main__":
    main()
