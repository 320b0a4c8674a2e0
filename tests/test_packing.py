"""Global cross-document sequence packing (``operators/packing.py``):
segment-map values vs a pure-Python reference, tiling invariants, plan
gated single-partition-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.packing import (
    pack_corpus_segments,
)


def _py_reference(rows, seq_len):
    """(id, n) rows -> {(seq_id, id): (tok_start, n_toks)} in id order."""
    out, off = {}, 0
    for i, n in sorted(rows):
        if n > 0:
            for seq in range(off // seq_len, (off + n - 1) // seq_len + 1):
                start = max(off, seq * seq_len)
                end = min(off + n, (seq + 1) * seq_len)
                out[(seq, i)] = (start, end - start)
        off += n
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_packing_matches_python_reference(spark):
    # mix: tiny docs packing many-per-sequence, one giant doc spanning
    # several sequences, an empty doc contributing nothing
    rows = [(i, (i * 31) % 17 + 1) for i in range(100)] + [
        (200, 500), (201, 0), (202, 3)
    ]
    got = {
        (r.seq_id, r.doc_id): (r.tok_start, r.n_toks)
        for r in pack_corpus_segments(_df(spark, rows), "n_tokens", 64).collect()
    }
    assert got == _py_reference(rows, 64)


def test_packing_tiles_the_stream_exactly(spark):
    rows = [(i, (i * 7) % 40 + 1) for i in range(200)]
    total = sum(n for _, n in rows)
    segs = pack_corpus_segments(_df(spark, rows), "n_tokens", 64).collect()
    # every sequence except the last is completely full
    per_seq = {}
    for r in segs:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_toks
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # contiguous seq ids
    for s, n in per_seq.items():
        assert n == 64 if s < last else 0 < n <= 64, (s, n)
    assert sum(per_seq.values()) == total
    # segments are disjoint and cover [0, total)
    spans = sorted((r.tok_start, r.tok_start + r.n_toks) for r in segs)
    assert spans[0][0] == 0 and spans[-1][1] == total
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_packing_plan_has_no_single_partition_window(spark):
    rows = [(i, 10) for i in range(50)]
    df = pack_corpus_segments(_df(spark, rows), "n_tokens", 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_packing_empty_and_invalid(spark):
    import pytest

    assert pack_corpus_segments(_df(spark, []), "n_tokens", 64).count() == 0
    with pytest.raises(ValueError):
        pack_corpus_segments(_df(spark, [(1, 1)]), "n_tokens", 0)


def test_packing_registry_row_smoke(spark):
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    out = QUERIES["docs_global_packing"].spark(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    # cross-document packing actually happens: some sequence holds >1 doc
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append(r.doc_id)
    assert any(len(v) > 1 for v in by_seq.values())


def test_packing_huge_and_negative_ids(spark):
    """Bucket arithmetic is exact integer floor division (r7 verdict #5):
    ids above 2⁵³ (where float division double-rounds adjacent ids into
    the wrong bucket) and negative ids (where trunc-toward-zero makes
    bucket 0 double-width) must still tile the stream in exact id order."""
    big = 1 << 60
    rows = (
        [(-big + i, 3) for i in range(5)]
        + [(-7, 3), (-1, 3), (0, 3), (5, 3)]
        + [(big + i, 3) for i in range(5)]  # adjacent ids straddling 2^53+
    )
    segs = pack_corpus_segments(
        _df(spark, rows), "n_tokens", 4, bucket_size=3
    ).collect()
    got = {(r.seq_id, r.doc_id): (r.tok_start, r.n_toks) for r in segs}
    assert got == _py_reference(rows, 4)


def test_floor_div_matches_python_floordiv(spark):
    from kafka_streams_dead_letter_publishing_spark.operators.packing import (
        _floor_div,
    )

    ids = [-(1 << 60) - 1, -1025, -1024, -1023, -1, 0, 1, 1023, 1024,
           (1 << 53) + 1, (1 << 60) + 7]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.bk
        for r in df.withColumn("bk", _floor_div("doc_id", 1024)).collect()
    }
    assert got == {i: i // 1024 for i in ids}


def test_packing_duplicate_ids_tile_exactly(spark):
    """Tied order keys (duplicate ids) still tile the stream: each copy
    counted once, segments disjoint — the default RANGE window frame
    would give both copies the same inclusive sum and overlapping
    offsets."""
    dup = spark.createDataFrame([(1, 5), (1, 5)], "doc_id long, n_tokens long")
    segs = pack_corpus_segments(dup, "n_tokens", 4).collect()
    spans = sorted((r.tok_start, r.tok_start + r.n_toks) for r in segs)
    assert spans[0][0] == 0 and spans[-1][1] == 10
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
