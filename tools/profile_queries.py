"""Per-query optimization harness (r17): time individual registry queries
through the noop sink with the SAME session configuration as bench.py, and
capture ``explain("formatted")`` for the plan-diff artifacts under
plans/r17/.

Unlike bench.py this tool exists for the inner optimization loop: pick a
few queries, run them N times back-to-back-per-pass (interleaved passes,
same methodology), print every sample + the median, and optionally write
``plans/r17/<name>_<suffix>.txt``.

Usage:
    python tools/profile_queries.py [--runs N] [--explain-suffix before]
        [--sf-dir DIR] [query ...]

With no query names: every bench-tagged registry query.  Streamed rows are
driven exactly as bench.py does for the ``*_drive`` entries when the name
ends in ``_drive`` (cache popped per pass, full fresh drive timed).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-suffix", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-queries")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256kb")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES
    from kafka_streams_dead_letter_publishing_spark.sources.tables import (
        TABLES,
        load_table,
    )

    # same warm-up as bench.py so sample 1 is comparable
    spark.range(1_000_000).select(F.sum("id")).collect()
    for t in TABLES:
        load_table(spark, args.sf_dir, t).limit(1).count()

    drive_caches = _drive_caches()
    names = args.queries or [n for n, q in QUERIES.items() if "bench" in q.tags]
    samples: dict[str, list[float]] = {n: [] for n in names}
    for pass_idx in range(args.runs):
        for name in names:
            if name.endswith("_drive"):
                row, cache = drive_caches[name]
                _pop(cache, args.sf_dir)
            else:
                row = name
            spark.sparkContext.setJobDescription(f"profile:{name}#{pass_idx}")
            t0 = time.time()
            QUERIES[row].spark(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)

    out_dir = (
        pathlib.Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLAN_DUMP_DIR", "r18")
    )
    if args.explain_suffix:
        out_dir.mkdir(parents=True, exist_ok=True)
        import contextlib
        import io

        for name in names:
            row = drive_caches[name][0] if name.endswith("_drive") else name
            df = QUERIES[row].spark(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{args.explain_suffix}.txt").write_text(buf.getvalue())

    for name in names:
        s = samples[name]
        print(
            f"{statistics.median(s):8.3f}  min={min(s):7.3f}  {name}  "
            f"samples={s}"
        )
    spark.stop()


def _drive_caches():
    from kafka_streams_dead_letter_publishing_spark.plans import (
        multimodal as mm,
        relational as rel,
        similarity as sim,
        text as txt,
    )

    return {
        "events_asof_streamed_drive": ("events_asof_streamed", rel._ASOF_STREAM_CACHE),
        "events_interval_streamed_drive": (
            "events_interval_streamed",
            rel._INTERVAL_STREAM_CACHE,
        ),
        "events_sessionization_drive": (
            "events_sessionization",
            rel._SESSION_STREAM_CACHE,
        ),
        "docs_media_ingest_streamed_drive": (
            "docs_media_ingest_streamed",
            mm._MEDIA_INGEST_CACHE,
        ),
        "docs_doc_ingest_streamed_drive": ("docs_doc_ingest_streamed", txt._DOC_INGEST_CACHE),
        "docs_budget_ingest_streamed_drive": (
            "docs_budget_ingest_streamed",
            txt._BUDGET_INGEST_CACHE,
        ),
        "emb_ann_ingest_streamed_drive": ("emb_ann_ingest_streamed", sim._EMB_INGEST_CACHE),
    }


def _pop(cache: dict, sf_dir: str) -> None:
    import importlib

    bench = importlib.import_module("bench")
    bench._pop_drive_cache(cache, sf_dir)


if __name__ == "__main__":
    main()
