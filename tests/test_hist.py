"""Histogram quantile sketch (operators/hist.py): Python-reference
parity, the cell-SUM merge law, rank semantics, epoch-SET crash-retry,
and the streamed-store registry row."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.hist import (
    HIST_BINS,
    HIST_LO,
    HIST_WIDTH,
    hist_append,
    hist_build,
    hist_compact,
    hist_merge,
    hist_quantile_bins,
    hist_read,
)

ROWS = [
    ("a", 0.0), ("a", 3.9), ("a", 4.0), ("a", 17.2), ("a", 1023.0),
    ("a", 5000.0),      # clamps into the top bin
    ("a", -3.0),        # clamps into bin 0
    ("a", None),        # drops
    ("b", 8.1), ("b", 8.2), ("b", 12.0),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "event_type string, value double")


def _py_sketch(rows):
    out: dict[tuple[str, int], int] = {}
    for g, v in rows:
        if v is None:
            continue
        b = min(max(int(math.floor((v - HIST_LO) / HIST_WIDTH)), 0), HIST_BINS - 1)
        out[(g, b)] = out.get((g, b), 0) + 1
    return out


def _cells(df):
    return {(r.group, r.bin): r.cnt for r in df.collect()}


def test_build_matches_python_reference(spark):
    assert _cells(hist_build(_df(spark), "event_type", "value")) == _py_sketch(ROWS)


def test_clamping_and_null_semantics(spark):
    cells = _cells(hist_build(_df(spark), "event_type", "value"))
    assert cells[("a", 0)] == 3          # 0.0, 3.9 and the clamped -3.0
    assert cells[("a", HIST_BINS - 1)] == 2  # 1023.0 and the clamped 5000.0
    assert sum(c for (g, _), c in cells.items() if g == "a") == 7  # NULL dropped


def test_merge_equals_combined_build(spark):
    h1, h2 = ROWS[:5], ROWS[5:]
    merged = hist_merge(
        hist_build(_df(spark, h1), "event_type", "value"),
        hist_build(_df(spark, h2), "event_type", "value"),
    )
    assert _cells(merged) == _py_sketch(ROWS)


def test_quantile_bins_exact_integer_ranks(spark):
    """min(bin | cum >= ceil(n*P/100)) against a hand walk."""
    sk = hist_build(_df(spark), "event_type", "value")
    got = {r.group: r for r in hist_quantile_bins(sk).collect()}
    py = _py_sketch(ROWS)

    def walk(g, p):
        items = sorted((b, c) for (gg, b), c in py.items() if gg == g)
        n = sum(c for _, c in items)
        rank = -(-n * p // 100)  # ceil
        cum = 0
        for b, c in items:
            cum += c
            if cum >= rank:
                return b
        raise AssertionError

    for g in ("a", "b"):
        assert got[g].p50_bin == walk(g, 50)
        assert got[g].p90_bin == walk(g, 90)
        assert got[g].p99_bin == walk(g, 99)
    assert got["a"].n == 7 and got["b"].n == 3


def test_streamed_equals_one_shot(spark, tmp_path):
    path = str(tmp_path / "hist")
    df = _df(spark)
    for b in range(3):
        hist_append(
            df.filter(F.pmod(F.xxhash64("value"), F.lit(3)) == b),
            path,
            "event_type",
            "value",
        )
    # NULL value rows hash to NULL and reach no batch — same as dropping
    assert _cells(hist_read(spark, path)) == _py_sketch(ROWS)


def test_orphan_epochs_invisible_and_retry_heals(spark, tmp_path):
    """The epoch-SET crash-retry contract: cells written without a stats
    row are invisible, and a retry allocates ABOVE the orphan."""
    path = str(tmp_path / "hist")
    df = _df(spark)
    hist_append(df.filter(F.col("value") < 10), path, "event_type", "value")
    # simulate a crash: epoch-1 cells land, stats row never does
    orphan = hist_build(
        df.filter(F.col("value") >= 10), "event_type", "value"
    ).withColumn("epoch", F.lit(1).cast("long"))
    orphan.write.mode("append").parquet(f"{path}/cells")
    before = _cells(hist_read(spark, path))
    assert before == _py_sketch([(g, v) for g, v in ROWS if v is not None and v < 10])
    # the retry must allocate epoch 2 (above the orphan), never collide
    e = hist_append(df.filter(F.col("value") >= 10), path, "event_type", "value")
    assert e == 2
    assert _cells(hist_read(spark, path)) == _py_sketch(ROWS)


def test_compact_preserves_quantiles_and_drops_orphans(spark, tmp_path):
    path, dst = str(tmp_path / "h"), str(tmp_path / "h2")
    df = _df(spark)
    hist_append(df, path, "event_type", "value")
    hist_build(df, "event_type", "value").withColumn(
        "epoch", F.lit(7).cast("long")
    ).write.mode("append").parquet(f"{path}/cells")  # orphan
    hist_compact(spark, path, dst)
    assert _cells(hist_read(spark, dst)) == _py_sketch(ROWS)


def test_empty_store_raises(spark, tmp_path):
    with pytest.raises(Exception):
        hist_read(spark, str(tmp_path / "h"))


def test_registry_row_matches_direct_composition(spark):
    from kafka_streams_dead_letter_publishing_spark.operators.hist import (
        hist_derive_bounds,
    )
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {r.event_type: r for r in QUERIES["events_hist_quantiles"].spark(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    lo, w = hist_derive_bounds(ev, "value")
    sk = hist_build(ev, "event_type", "value", lo=lo, width=w)
    direct = {r.group: r for r in hist_quantile_bins(sk).collect()}
    assert set(rows) == set(direct)
    for g, r in rows.items():
        assert (r.p50_bin, r.p90_bin, r.p99_bin, r.n_events) == (
            direct[g].p50_bin, direct[g].p90_bin, direct[g].p99_bin, direct[g].n
        )
        # the sketch's p50 bin contains the CEIL-RANK order statistic
        # (the quantity the sketch actually ranks — the interpolated
        # exact_p50 can straddle a bin edge by the interpolation step,
        # which is why the artifact carries both)
        vals = sorted(
            x.value
            for x in ev.filter(
                (F.col("event_type") == g) & F.col("value").isNotNull()
            ).collect()
        )
        rank_stat = vals[(len(vals) * 50 + 99) // 100 - 1]
        hi_edge = lo + (r.p50_bin + 1) * w
        assert lo + r.p50_bin * w <= rank_stat
        assert rank_stat < hi_edge or (
            r.p50_bin == HIST_BINS - 1 and rank_stat <= lo + HIST_BINS * w
        )


def test_derive_bounds_matches_python_and_edge_domains(spark):
    from kafka_streams_dead_letter_publishing_spark.operators.hist import (
        hist_derive_bounds,
    )

    df = spark.createDataFrame(
        [(1, 3.5), (2, -2.0), (3, None), (4, 10.0)], "id long, v double"
    )
    lo, w = hist_derive_bounds(df, "v")
    assert lo == -2.0 and w == (10.0 - -2.0) / HIST_BINS
    # the derived grid spans the data: min → bin 0, max → the top edge
    # clamped into the last bin
    sk = {(r.group, r.bin): r.cnt for r in hist_build(
        df.withColumn("g", F.lit("a")), "g", "v", lo=lo, width=w).collect()}
    assert sk[("a", 0)] == 1 and sk[("a", HIST_BINS - 1)] == 1
    # single-point domain: width degrades to 1.0, everything in bin 0
    one = spark.createDataFrame([(1, 7.0), (2, 7.0)], "id long, v double")
    assert hist_derive_bounds(one, "v") == (7.0, 1.0)
    # all-NULL / empty: no bounds to derive
    assert hist_derive_bounds(df.filter("v IS NULL"), "v") is None
    assert hist_derive_bounds(df.filter("id < 0"), "v") is None


def test_event_ingest_hist_store_lockstep(spark, tmp_path):
    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        EventIngest,
    )

    rows = [(f"t{i % 2}", i, float((i * 7) % 300)) for i in range(120)]
    ingest = EventIngest(str(tmp_path / "ev"), k=8, hist_store=True)
    for bid, (lo, hi) in enumerate(((0, 50), (50, 120))):
        ingest.process_batch(
            spark.createDataFrame(
                rows[lo:hi], "event_type string, user_id long, value double"
            ),
            bid,
        )
    full = spark.createDataFrame(
        rows, "event_type string, user_id long, value double"
    )
    want = _cells(hist_build(full, "event_type", "value"))
    assert _cells(hist_read(spark, ingest.hist_path)) == want

    compacted = ingest.compact(str(tmp_path / "ev2"))
    assert _cells(hist_read(spark, compacted.hist_path)) == want
