"""Repo-wide physical-plan lint: build every registry query against
sf0.001 and flag scale anti-patterns in the EXECUTED plan —
SinglePartition exchanges (a serial stage), CartesianProduct (unbounded
products), BroadcastNestedLoopJoin (keyless joins — legal only for
metadata-sized literal sides), row-at-a-time/Arrow Python evaluation
(legal only where semantics genuinely need Python), sort-merge joins
(at toy SF everything broadcastable should broadcast; SMJs that appear
only at scale are AQE's call, not the plan's), and — r9 — physical
Window operators (a data-key window cannot partial-aggregate, so a hot
partition key funnels through one task with no AQE rescue; allowed only
where per-key cardinality is bounded by construction).

Findings are printed one JSON line per (query, pattern); the exit code is
1 if any finding is NOT in the ALLOWLIST below.  tests/test_plan_audit.py
runs this as the repo-wide invariant — per-family plan gates pin specific
shapes, this catches the query nobody wrote a gate for.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATTERNS = (
    "Exchange SinglePartition",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "SortMergeJoin",
    "Window",
)

#: (query, pattern) -> reason.  Every entry is a DOCUMENTED exception.
ALLOWLIST: dict[tuple[str, str], str] = {
    (
        "docs_payload_features",
        "MapInPandas",
    ): "multimodal byte decoding is genuinely Python (mapInPandas contract)",
    (
        "docs_payload_audio",
        "MapInPandas",
    ): "multimodal audio decoding is genuinely Python (mapInPandas "
    "contract; the row runs a real WAV encode-decode cycle per row)",
    (
        "docs_payload_video",
        "MapInPandas",
    ): "multimodal video decoding is genuinely Python (mapInPandas "
    "contract; the row assembles and decodes a real MJPEG AVI per "
    "payload — RIFF walk + per-frame baseline JPEG — with the 1-to-N "
    "frame fan-out inside the Arrow batch)",
    (
        "dlt_udf_safe_map",
        "ArrowEvalPython",
    ): "the operator IS the Python error-capture surface (Arrow-batched "
    "pandas_udf wrapper — reference op #3's general form)",
    (
        "emb_pca_covariance",
        "MapInArrow",
    ): "r17 optimization (guide §4.2/§8): the exact-integer gram build "
    "runs as one numpy int64 matmul pass per task instead of the "
    "N x d(d+1)/2 posexplode — same <= d^2 partial cells cross the "
    "shuffle, bit-identical values (parity pinned in tests/test_pca.py); "
    "the Arrow hop moves only the quantized vectors",
    (
        "docs_bpe_token_counts_full",
        "ArrowEvalPython",
    ): "large-vocabulary BPE is the documented Python-legal surface "
    "(functions/bpe.py: the JVM replace chain is O(len*M) and "
    "StackOverflows past ~1k merges — SCALE.md cost curve); the row "
    "cross-validates the Arrow tokenizer against the symbolic oracle",
    (
        "docs_neardup_keepers",
        "SortMergeJoin",
    ): "band/pair joins are fact-fact (both sides corpus-derived) — SMJ is "
    "the right strategy at scale; the checkpointed CC frames carry no "
    "stats for AQE to broadcast at toy SF",
    (
        "emb_pq_batch_topk",
        "BroadcastNestedLoopJoin",
    ): "keyless crossJoin against the broadcast Q-row ADC table literal "
    "(Q queries x m*k ints — metadata, bounded by config)",
    (
        "events_zorder_cells",
        "BroadcastNestedLoopJoin",
    ): "crossJoin against the broadcast 1-row dimension-bounds aggregate",
    (
        "events_kmv_set_ops",
        "BroadcastNestedLoopJoin",
    ): "1-row assembly crossJoins: broadcast side-sketch stats x union "
    "stats x exact-truth aggregate — each side is a single metadata row",
    (
        "events_hist_quantiles",
        "Window",
    ): "cumulative-sum/total windows over the METADATA-sized histogram "
    "sketch (<= 256 bins per group) — never over event rows",
    (
        "emb_semantic_decontaminated",
        "BroadcastNestedLoopJoin",
    ): "crossJoin against the broadcast EVAL BENCHMARK batch — an "
    "external eval set is fixed-size by definition (the % selector is "
    "the testdata stand-in), so the scan is O(N x const), the "
    "emb_multi_query_topk batch shape; the production-scale composition "
    "is the LSH-bucketed ann_filter, which this row's semantics pin",
    (
        "q22_dormant_high_balance",
        "BroadcastNestedLoopJoin",
    ): "crossJoin against the broadcast 1-row (sum,count) balance "
    "aggregate — the decorrelated global scalar subquery",
    (
        "docs_nb_lang_confusion",
        "BroadcastNestedLoopJoin",
    ): "crossJoin against the broadcast C-row class table (C = #languages "
    "— every class must score every doc; the model join itself is a "
    "broadcast hash join)",
    (
        "docs_quality_funnel",
        "BroadcastNestedLoopJoin",
    ): "the NB language-gate stage's crossJoin against the broadcast "
    "C-row class table (counted twice: reused across the scoring and "
    "argmin subtrees)",
    (
        "docs_quality_funnel",
        "SortMergeJoin",
    ): "per-doc verdict assembly joins the NB-pred and perplexity-score "
    "aggregates on the UNIQUE doc id — both sides corpus-derived, "
    "neither broadcastable at scale; a unique-key SMJ has no skew by "
    "construction",
    # ── Window allowlist (r9): every entry must be bounded-cardinality-
    # per-partition-key BY CONSTRUCTION, not by data luck.  A window that
    # partitions on a data key with unbounded per-key multiplicity (a
    # dedup fingerprint, a line value) is a violation — use the partial-
    # agg groupBy shape (operators/lines.py).
    **{
        (q, "Window"): "two-phase prefix-sum (operators/prefix.py:93): the "
        "window partitions on (group, bucket) where the bucket count is a "
        "config knob — per-key rows ~ N/n_buckets by construction; the "
        "global cumulative sum this replaces would be SinglePartition"
        for q in (
            "docs_token_budget_sample",
            "docs_source_mixture_sample",
            "docs_temperature_mixture",
            "docs_global_packing",
            "docs_vocab_ids",
            "docs_bpe_token_ids",
            "docs_source_capped",
            "docs_epoch_order",
            "docs_pretraining_pipeline",
        )
    },
    **{
        (q, "Window"): "two-phase top-k: the local window partitions on "
        "(pid, query_id) — one physical partition's rows; the global "
        "window on query_id sees only the <= n_partitions*k local winners"
        for q in (
            # emb_multi_query_topk retired r14 (folded into the IVF row);
            # its two-phase plan gate lives in tests/test_plan_quality.py
            "emb_ivf_batch_topk",
            "emb_pq_batch_topk",
            "emb_ivfpq_batch_topk",
            # docs_bm25_topk retired r14 (the served twin shares its
            # oracle verbatim; served ≡ scanned pinned in tests/test_bm25.py)
            "docs_bm25_served_topk",
            # events_kmv_distinct_users retired r14 (its streamed twin
            # oracles the same one-shot SQL); the one-shot path stays
            # pytest-pinned in tests/test_cms.py / tests/test_kmv_store.py
            # KMV set ops: per-side two-phase cut on (pid, side)/(side),
            # then the union re-cut over the <= 2K retained hashes —
            # every window input is sketch metadata
            "events_kmv_set_ops",
            # projected-space nearest neighbors (r12 deflation row):
            # same shape, ranked by integer squared-L2 ascending
            "emb_pca_deflated_neighbors",
            # KMV served from the streamed store (r12): the same
            # two-phase K-smallest cut over the merged per-batch mins
            "events_kmv_streamed_distinct",
        )
    },
    (
        "window_functions_showcase",
        "Window",
    ): "the query IS SURVEY §2.2's window-function coverage; partitions "
    "on o_custkey — one customer's order history, bounded per key by the "
    "domain (TPC-H: <= ~40 orders/customer at any SF)",
    **{
        (q, "Window"): "AS-OF join (operators/asof.py:135): partitions on "
        "the join entity key — one entity's merged event timeline, the "
        "operator's documented per-entity-history contract"
        for q in ("events_asof_purchase_click", "events_asof_left_tolerance")
    },
}


def _window_node_lines(plan_lines: list[str]) -> list[int]:
    """Indices of physical Window / WindowGroupLimit operator nodes.  A
    Window.partitionBy(<data key>) funnels EVERY occurrence of a hot key
    through one task's sort — it cannot partial-aggregate, so unlike a
    skewed join or groupBy there is no map-side collapse and no AQE
    rescue (the shape r8 purged from line dedup and r9 from the
    clean-corpus pipeline; this pattern exists so the class cannot
    reappear unreviewed).  Allowlisted windows must be bounded-cardinality
    -per-key BY CONSTRUCTION.  Matched on the node name at line start
    (after tree-drawing chars) so lowercase `window` COLUMNS from
    F.window() time-bucketing don't false-positive."""
    out = []
    for i, ln in enumerate(plan_lines):
        node = ln.lstrip(" :+-|*()0123456789")
        if node.startswith("Window"):
            out.append(i)
    return out


def _benign_scalar_agg_exchange(plan_lines: list[str], i: int) -> bool:
    """A SinglePartition exchange DIRECTLY below a keyless final aggregate
    and above a partial aggregate is the canonical scalar-agg shape: the
    exchange moves <= #partitions pre-aggregated rows, not data.  Any
    other SinglePartition is a serial stage and a violation."""
    below = " ".join(plan_lines[i + 1 : i + 3])
    # SortAggregate(key=[]) is the same scalar-final shape: Spark picks it
    # over HashAggregate when an agg function lacks a hash buffer (e.g.
    # MAX over a STRING column — the KMV kth hex hashes)
    return "partial_" in below and (
        "HashAggregate(keys=[]" in below or "SortAggregate(key=[]" in below
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("plan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    for name, q in QUERIES.items():
        try:
            plan = (
                q.spark(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "error": f"{type(e).__name__}: {e}"[:200]}))
            bad += 1
            continue
        lines = plan.splitlines()
        for pat in PATTERNS:
            if pat not in plan:
                continue
            count = plan.count(pat)
            if pat == "Exchange SinglePartition":
                flagged = [
                    i
                    for i, ln in enumerate(lines)
                    if pat in ln and not _benign_scalar_agg_exchange(lines, i)
                ]
                if not flagged:
                    continue  # all occurrences are scalar-agg finals
                count = len(flagged)
            elif pat == "Window":
                flagged = _window_node_lines(lines)
                if not flagged:
                    continue  # only lowercase window COLUMNS, no operator
                count = len(flagged)
            allowed = ALLOWLIST.get((name, pat))
            print(
                json.dumps(
                    {
                        "query": name,
                        "pattern": pat,
                        "count": count,
                        "allowed": bool(allowed),
                        "reason": allowed,
                    }
                )
            )
            if not allowed:
                bad += 1
    print(json.dumps({"violations": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
