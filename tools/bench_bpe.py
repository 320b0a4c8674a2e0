"""Measure the BPE executor cost curve: JVM chained-replace (O(len×M)
string scans per row) vs the Arrow word-cached tokenizer (M-independent),
at growing merge-table sizes — the measurement behind
``functions.bpe.BPE_EXPR_MAX_MERGES``.

Tables beyond the fixture-saturated 89 trained merges are padded with
WELL-NESTED no-op merges over a control character that never occurs in
text (``\\x01`` chains): a padding merge never fires, but the expression
executor still pays one full replace() scan per entry — exactly the cost
shape of a production vocabulary whose tail merges rarely fire — while
the Arrow path's per-word rank lookups don't grow.  Counts are asserted
IDENTICAL across engines and table sizes (padding is semantics-free).

Usage: python tools/bench_bpe.py [sf_dir] [reps]
Prints one JSON line per (engine, M) with seconds, then a summary.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def padded_table(base: tuple, m_total: int) -> tuple:
    """base + a well-nested chain of never-firing \\x01 merges."""
    pad = []
    prod = "\x01"
    for _ in range(m_total - len(base)):
        pad.append((prod, "\x01"))
        prod = prod + "\x01"
    return tuple(base) + tuple(pad)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        TRAINED_MERGES_FULL,
        bpe_token_count,
        bpe_token_count_arrow,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .appName("bench-bpe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    docs = docs.persist()
    n_docs = docs.count()

    sizes = [16, 89, 256, 1024, 4096]
    results: dict[tuple[str, int], float] = {}
    checks: dict[tuple[str, int], int] = {}
    for m_total in sizes:
        table = padded_table(TRAINED_MERGES_FULL[: min(89, m_total)], m_total)
        for engine, fn in (("expr", bpe_token_count), ("arrow", bpe_token_count_arrow)):
            best, total = None, None
            try:
                for _ in range(reps):
                    t0 = time.monotonic()
                    total = docs.agg(
                        F.sum(fn(F.col("text"), table)).alias("s")
                    ).first().s
                    dt = time.monotonic() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"engine": engine, "m": m_total,
                                  "error": f"{type(e).__name__}: {e}"[:160]}))
                continue
            results[(engine, m_total)] = best
            checks[(engine, m_total)] = total
            print(json.dumps({"engine": engine, "m": m_total,
                              "sec": round(best, 3), "sum_tokens": total,
                              "docs": n_docs}))
    # padding and engine choice must be semantics-free WITHIN a base table
    # (m=16 uses the 16-merge prefix, so its count legitimately differs
    # from the 89-merge-based sizes)
    for base in (16, 89):
        sums = {v for (e, m), v in checks.items()
                if (m == 16) == (base == 16)}
        assert len(sums) <= 1, f"count mismatch within base {base}: {checks}"
    cutover = None
    for m_total in sizes:
        e, a = results.get(("expr", m_total)), results.get(("arrow", m_total))
        if e is not None and a is not None and e > a:
            cutover = m_total
            break
    print(json.dumps({"summary": "bpe-cost-curve", "first_m_where_arrow_wins":
                      cutover, "sum_tokens": sums.pop()}))
    spark.stop()


if __name__ == "__main__":
    main()
