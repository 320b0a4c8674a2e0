"""Token-budget corpus sampling (``operators/budget.py``): greedy
hash-ordered take-until-budget via the distributed two-phase prefix-sum
— values vs a pure-Python reference, plan gated single-partition-free,
budget edges."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.budget import (
    token_budget_sample,
)


def _py_reference(rows, budget):
    """(id, n_tokens) rows -> {id: running} for the kept prefix."""
    order = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    out, run = {}, 0
    for i, n in order:
        run += n
        if run > budget:
            break
        out[i] = run
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_budget_sample_matches_python_reference(spark):
    rows = [(i, (i * 37) % 50 + 1) for i in range(500)]
    total = sum(n for _, n in rows)
    for budget in (0, total // 3, total // 2, total - 1, total, total + 10):
        got = {
            r.doc_id: r.running_tokens
            for r in token_budget_sample(_df(spark, rows), "n_tokens", budget).collect()
        }
        assert got == _py_reference(rows, budget), budget


def test_budget_sample_is_deterministic_and_prefix_closed(spark):
    """Smaller budgets select PREFIXES of larger budgets' selections (the
    reproducibility contract a mixture pipeline relies on)."""
    rows = [(i, 10) for i in range(300)]
    small = {
        r.doc_id
        for r in token_budget_sample(_df(spark, rows), "n_tokens", 500).collect()
    }
    large = {
        r.doc_id
        for r in token_budget_sample(_df(spark, rows), "n_tokens", 2000).collect()
    }
    assert small < large
    again = {
        r.doc_id
        for r in token_budget_sample(_df(spark, rows), "n_tokens", 500).collect()
    }
    assert small == again


def test_budget_sample_plan_has_no_single_partition_window(spark):
    """The scale contract: the running sum must come from bucket-
    partitioned windows + a broadcast offset join, never the naive
    global-order window's Exchange SinglePartition."""
    rows = [(i, 5) for i in range(100)]
    df = token_budget_sample(_df(spark, rows), "n_tokens", 200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def test_budget_sample_empty_input(spark):
    assert token_budget_sample(_df(spark, []), "n_tokens", 100).count() == 0


def test_budget_registry_row_totals(spark):
    """The registered row fills (close to) half the corpus's tokens and
    never exceeds it."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["docs_token_budget_sample"].spark(spark, sf)
    rows = out.collect()
    assert rows, "sample must be non-empty"
    from kafka_streams_dead_letter_publishing_spark.functions.text import (
        norm_text,
        tokens,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    total = docs.select(
        F.sum(F.size(tokens(norm_text(F.col("text"))))).cast("long").alias("t")
    ).collect()[0]["t"]
    budget = total // 2
    top = max(r.running_tokens for r in rows)
    assert top <= budget
    # greedy cut: the next doc would overflow, so the fill is within one
    # max-doc-size of the budget
    max_doc = max(r.n_tokens for r in rows)
    assert top > budget - 2 * max_doc


def _py_grouped_reference(rows, budgets):
    """(group, id, n_tokens) rows + {group: budget} -> {id: running}."""
    out = {}
    groups = {g for g, _, _ in rows}
    for g in groups:
        if g is None:
            continue
        b = budgets.get(g, 0) if isinstance(budgets, dict) else budgets
        sub = [(i, n) for gg, i, n in rows if gg == g]
        out.update(_py_reference(sub, b))
    return out


def test_grouped_budget_sample_matches_python_reference(spark):
    rows = [("web", i, (i * 13) % 40 + 1) for i in range(200)] + [
        ("books", 1000 + i, (i * 7) % 90 + 10) for i in range(100)
    ] + [("code", 2000 + i, 5) for i in range(50)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    # mapping budgets: one generous, one tight, one ABSENT (=> excluded)
    budgets = {"web": 900, "books": 333}
    got = {
        r.doc_id: r.running_tokens
        for r in token_budget_sample(
            df, "n_tokens", budgets, group_col="source"
        ).collect()
    }
    assert got == _py_grouped_reference(rows, budgets)
    assert not any(i >= 2000 for i in got)  # absent group excluded

    # scalar budget applies to every group
    got_scalar = {
        r.doc_id: r.running_tokens
        for r in token_budget_sample(
            df, "n_tokens", 250, group_col="source"
        ).collect()
    }
    assert got_scalar == _py_grouped_reference(rows, 250)


def test_grouped_budget_sample_null_group_excluded(spark):
    rows = [("web", 1, 10), (None, 2, 10), ("web", 3, 10)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    got = {
        r.doc_id
        for r in token_budget_sample(
            df, "n_tokens", 1000, group_col="source"
        ).collect()
    }
    assert got == {1, 3}


def test_mixture_registry_row_balances_sources(spark):
    """Every source fills (close to) the same per-source budget — the
    equal-weights mixture contract."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    out = QUERIES["docs_source_mixture_sample"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    per_source_top = {}
    per_source_max_doc = {}
    for r in out:
        per_source_top[r.source] = max(per_source_top.get(r.source, 0), r.running_tokens)
        per_source_max_doc[r.source] = max(per_source_max_doc.get(r.source, 0), r.n_tokens)
    budget = None
    for s, top in per_source_top.items():
        if budget is None:
            budget = top  # all sources share one budget; tops differ only
        # by the granularity of the last doc
        assert abs(top - budget) <= per_source_max_doc[s] + max(per_source_max_doc.values())


def test_hash_split_is_deterministic_disjoint_and_growth_stable(spark):
    from kafka_streams_dead_letter_publishing_spark.operators.budget import hash_split

    rows = [(i, 1) for i in range(4000)]
    df = _df(spark, rows)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.doc_id: r.split for r in hash_split(df, fr).collect()}
    # exhaustive: every row labeled with a known label
    assert set(got.values()) <= set(fr)
    # proportions within sampling tolerance
    n = len(rows)
    for label, f in fr.items():
        share = sum(1 for v in got.values() if v == label) / n
        assert abs(share - f) < 0.03, (label, share)
    # deterministic across partitionings
    again = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(7), fr).collect()
    }
    assert got == again
    # growth-stable: labels of existing ids unchanged when corpus doubles
    grown = {
        r.doc_id: r.split
        for r in hash_split(_df(spark, rows + [(10_000 + i, 1) for i in range(1000)]), fr).collect()
    }
    assert all(grown[i] == got[i] for i in got)

    import pytest

    with pytest.raises(ValueError):
        hash_split(df, {"a": 0.5, "b": 0.4})


def test_budget_sample_null_values_and_tied_order_keys(spark):
    """NULL token counts must not crash the driver prefix (SUM over an
    all-NULL bucket is NULL) and count as 0; duplicate ids (tied md5
    order keys, e.g. an at-least-once redelivery inside one batch) must
    each be counted ONCE — the default RANGE frame would give both
    copies the combined running sum."""
    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, 7)], "doc_id long, n_tokens long"
    )
    got = token_budget_sample(df, "n_tokens", 100).collect()  # no TypeError
    assert {r.doc_id for r in got} == {1, 2, 3}

    dup = spark.createDataFrame([(1, 5), (1, 5)], "doc_id long, n_tokens long")
    kept = token_budget_sample(dup, "n_tokens", 5).collect()
    # ROWS frame: first copy runs to 5 (admitted), second to 10 (dropped);
    # a RANGE frame would give both 10 and admit neither
    assert len(kept) == 1 and kept[0].running_tokens == 5


def test_source_cap_matches_python_reference(spark):
    """source_cap keeps exactly the first `cap` docs of each group in
    md5(id) order — including a deliberately hot group 100× the cap — with
    no SinglePartition in the plan and per-group ranks 1..cap."""
    import hashlib

    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        source_cap,
    )

    rows = [(i, "hot") for i in range(500)] + [
        (1000 + i, f"cold{i % 3}") for i in range(9)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = source_cap(docs, cap=5).collect()

    expect = {}
    for src in {s for _, s in rows}:
        ids = sorted(
            (d for d, s in rows if s == src),
            key=lambda d: hashlib.md5(str(d).encode()).hexdigest(),
        )[:5]
        for rank, d in enumerate(ids, start=1):
            expect[d] = (src, rank)
    assert {r.doc_id: (r.source, r.rank_in_group) for r in got} == expect
    # hot group contributes exactly cap rows
    assert sum(1 for r in got if r.source == "hot") == 5

    plan = (
        source_cap(docs, cap=5)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_source_cap_mapping_budgets(spark):
    """Per-group caps via a mapping; groups absent from the mapping are
    dropped entirely (cap 0)."""
    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        source_cap,
    )

    docs = spark.createDataFrame(
        [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(10)],
        "doc_id long, source string",
    )
    got = source_cap(docs, cap={"a": 3}).collect()
    assert sum(1 for r in got if r.source == "a") == 3
    assert sum(1 for r in got if r.source == "b") == 0


def test_quality_weighted_keep_tracks_score(spark):
    """Statistical contract: keep rate over many ids approximates the
    score; determinism contract: pure function of (id, score); edges:
    score 0 keeps nothing, score ≥ 1 keeps ~everything, negative clamps."""
    import hashlib

    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        quality_weighted_keep,
    )

    n = 4000
    df = spark.createDataFrame(
        [(i, 0.3) for i in range(n)]
        + [(10_000 + i, 0.0) for i in range(200)]
        + [(20_000 + i, 1.0) for i in range(200)]
        + [(30_000 + i, -0.5) for i in range(50)],
        "doc_id long, score double",
    )
    out = quality_weighted_keep(df, "score").collect()
    by_band = {}
    for r in out:
        by_band.setdefault(r.score, []).append(r)
    rate = sum(r.kept for r in by_band[0.3]) / n
    assert abs(rate - 0.3) < 0.03, rate
    assert not any(r.kept for r in by_band[0.0])
    assert all(r.kept for r in by_band[1.0])  # 2^-52 miss chance per row
    assert not any(r.kept for r in by_band[-0.5])

    # pure function of (id, score): python reference agrees row-for-row
    for r in out[:500]:
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:13]
        thr = format(
            min(max(int(r.score * (1 << 52)), 0), (1 << 52) - 1), "013x"
        )
        assert r.kept == (h < thr), r


def test_epoch_order_is_a_fresh_permutation_per_epoch(spark):
    import hashlib

    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        epoch_order,
    )

    items = spark.createDataFrame([(i,) for i in range(300)], "seq_id long")
    e0 = {r.seq_id: r.position for r in epoch_order(items, 0).collect()}
    e1 = {r.seq_id: r.position for r in epoch_order(items, 1).collect()}
    # each epoch is a complete 1..N permutation
    assert sorted(e0.values()) == list(range(1, 301))
    assert sorted(e1.values()) == list(range(1, 301))
    # epochs are decorrelated (identical orders would agree everywhere)
    agree = sum(1 for k in e0 if e0[k] == e1[k])
    assert agree < 30
    # pure function of (epoch, id): python reference agrees
    ref = {
        i: rank + 1
        for rank, i in enumerate(
            sorted(
                range(300),
                key=lambda i: hashlib.md5(f"0:{i}".encode()).hexdigest(),
            )
        )
    }
    assert e0 == ref
    # re-run is identical; empty input yields the typed empty frame
    assert {r.seq_id: r.position for r in epoch_order(items, 0).collect()} == e0
    empty = epoch_order(spark.createDataFrame([], "seq_id long"), 3)
    assert empty.count() == 0 and set(empty.columns) == {"seq_id", "epoch", "position"}

    plan = epoch_order(items, 0)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_temperature_budgets_integer_exact():
    """alpha=1/2 allocation: integer isqrt weights, floor allocation,
    NULL groups excluded, degenerate cases safe."""
    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        temperature_budgets,
    )

    b = temperature_budgets({"a": 100, "b": 400}, 1000)
    assert b == {"a": 333, "b": 666}  # 10/30 and 20/30, floored
    # upsampling property: the rare source's share EXCEEDS its mass share
    assert b["a"] / 1000 > 100 / 500
    assert temperature_budgets({"a": 0, "b": 0}, 100) == {"a": 0, "b": 0}
    assert temperature_budgets({None: 100, "a": 4}, 10) == {"a": 10}
    assert temperature_budgets({}, 100) == {}
