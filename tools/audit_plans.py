"""Repo-wide physical-plan lint: build every registry query against
sf0.001 and flag scale anti-patterns in the EXECUTED plan —
SinglePartition exchanges (a serial stage), CartesianProduct (unbounded
products), BroadcastNestedLoopJoin (keyless joins — legal only for
metadata-sized literal sides), row-at-a-time/Arrow Python evaluation
(legal only where semantics genuinely need Python), and sort-merge joins
(at toy SF everything broadcastable should broadcast; SMJs that appear
only at scale are AQE's call, not the plan's).

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
    "SortMergeJoin",
)

#: (query, pattern) -> reason.  Every entry is a DOCUMENTED exception.
ALLOWLIST: dict[tuple[str, str], str] = {
    (
        "docs_payload_features",
        "MapInPandas",
    ): "multimodal byte decoding is genuinely Python (mapInPandas contract)",
    (
        "dlt_udf_safe_map",
        "ArrowEvalPython",
    ): "the operator IS the Python error-capture surface (Arrow-batched "
    "pandas_udf wrapper — reference op #3's general form)",
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
}


def _benign_scalar_agg_exchange(plan_lines: list[str], i: int) -> bool:
    """A SinglePartition exchange DIRECTLY below a keyless final aggregate
    and above a partial aggregate is the canonical scalar-agg shape: the
    exchange moves <= #partitions pre-aggregated rows, not data.  Any
    other SinglePartition is a serial stage and a violation."""
    below = " ".join(plan_lines[i + 1 : i + 3])
    return "partial_" in below and "HashAggregate(keys=[]" in below


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
