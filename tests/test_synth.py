"""Contract tests for the synthetic scale-probe corpora
(``sources/synth.py``): deterministic, prefix-stable, schema-compatible
with the testdata loaders, and carrying planted near-dups at the declared
rate — the properties ``tools/scale_probe.py`` relies on to measure
operator growth instead of generator noise."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.sources.synth import (
    synth_documents,
    synth_embeddings,
)


def test_synth_documents_deterministic_and_prefix_stable(spark):
    a = sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in synth_documents(spark, 200).collect())
    b = sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in synth_documents(spark, 200).collect())
    assert a == b
    # a smaller corpus is a strict prefix of a bigger one (same seeds)
    big = sorted((r.doc_id, r.text) for r in synth_documents(spark, 400).collect())
    assert [t[:2] for t in a] == big[:200]
    # schema matches the testdata documents table
    assert [f.name for f in synth_documents(spark, 1).schema] == [
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
    ]
    rows = dict((r.doc_id, r) for r in synth_documents(spark, 50).collect())
    assert all(r.n_chars == len(r.text) for r in rows.values())


def test_synth_documents_planted_neardups(spark):
    rows = {r.doc_id: r.text for r in synth_documents(spark, 100, planted_every=5).collect()}
    for did in range(5, 100, 5):
        base, dup = rows[did - 1], rows[did]
        assert dup == base + " wx"  # previous text + one word => Jaccard near 1
    # non-planted neighbors are not trivially identical
    assert rows[1] != rows[2]


def test_synth_embeddings_deterministic_with_planted_cosine_dups(spark):
    df = synth_embeddings(spark, 100, planted_every=10)
    a = {r.vec_id: list(r.embedding) for r in df.collect()}
    b = {r.vec_id: list(r.embedding) for r in synth_embeddings(spark, 100, planted_every=10).collect()}
    assert a == b
    assert all(len(v) == 64 for v in a.values())
    import math

    for vid in range(10, 100, 10):
        x, y = a[vid - 1], a[vid]
        dot = sum(p * q for p, q in zip(x, y))
        cos = dot / (math.sqrt(sum(p * p for p in x)) * math.sqrt(sum(q * q for q in y)))
        assert cos > 0.999999, (vid, cos)  # same direction scaled
    # a random pair is not near-duplicate
    x, y = a[1], a[2]
    dot = sum(p * q for p, q in zip(x, y))
    cos = dot / (math.sqrt(sum(p * p for p in x)) * math.sqrt(sum(q * q for q in y)))
    assert abs(cos) < 0.9


def test_synth_generation_is_a_narrow_distributed_map(spark):
    """Scale posture: generation must be shuffle-free (a pure map over
    spark.range) so a 100x corpus costs 100x map work on the cluster."""
    for df in (synth_documents(spark, 1000), synth_embeddings(spark, 1000)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert df.rdd.getNumPartitions() > 1  # range splits across workers


def test_synth_feeds_the_text_and_ann_operators(spark):
    """The probe's actual usage: the ingest filters run end-to-end on a
    synthetic corpus and reject (only) the planted near-dups' batch rows
    that collide with the reference slice."""
    from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
        ann_filter,
        build_ann_index,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.neardup_filter import (
        build_neardup_index,
        neardup_filter,
    )

    docs = synth_documents(spark, 300, planted_every=5).persist()
    ref = docs.filter(F.col("doc_id") % 5 != 0)  # originals
    batch = docs.filter(F.col("doc_id") % 5 == 0)  # planted dups of ref docs
    kept = neardup_filter(batch, build_neardup_index(ref))
    # planted dups share all but one shingle with their base => Jaccard
    # >= 0.6 and LSH-bandable: the filter must reject the vast majority
    assert kept.count() < batch.count() * 0.2
    docs.unpersist()

    emb = synth_embeddings(spark, 300, planted_every=10).persist()
    ref_v = emb.filter(F.col("vec_id") % 10 != 0)
    batch_v = emb.filter(F.col("vec_id") % 10 == 0)
    kept_v = ann_filter(batch_v, build_ann_index(ref_v), min_cos=0.9)
    # cosine of a planted pair is ~1; sign-LSH recall at dup grade ~0.99
    assert kept_v.count() <= batch_v.count() * 0.2
    emb.unpersist()


def test_ann_filter_scaled_depth_keeps_dup_grade_recall(spark):
    """The r7 depth knob (planes_per_table_for): a DEEPER index must still
    reject planted cosine~1 dups — dup-grade per-plane collision p ~ 0.86
    stays OR-amplified across tables — while cutting random-pair candidate
    volume (the quadratic term) by ~2^(b-4)."""
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        planes_per_table_for,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
        ann_filter,
        build_ann_index,
    )

    emb = synth_embeddings(spark, 400, planted_every=10).persist()
    ref = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    b = planes_per_table_for(400)
    assert b >= 5  # genuinely deeper than the oracle default 4
    deep = build_ann_index(ref, planes_per_table=b)
    kept = ann_filter(batch, deep, min_cos=0.9)
    n_batch = batch.count()
    assert kept.count() <= n_batch * 0.35, (kept.count(), n_batch)
    # candidate volume shrinks vs the default-depth index on the same data
    def n_cands(idx):
        from pyspark.sql import functions as FF
        from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
            lsh_table_keys_int,
        )

        banded = batch.select(
            "vec_id",
            FF.explode(
                lsh_table_keys_int(FF.col("embedding"), idx.n_tables, idx.planes_per_table)
            ).alias("bk"),
        )
        return banded.join(idx.buckets, "bk").select("vec_id", "ref_id").distinct().count()

    shallow = build_ann_index(ref)
    assert n_cands(deep) < n_cands(shallow) * 0.6
    emb.unpersist()


# ── planted low-rank embeddings (r13, r12 verdict #7) ────────────────────


def test_lowrank_synth_is_deterministic_and_prefix_stable(spark):
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        synth_embeddings_lowrank,
    )

    big = {r.vec_id: r.embedding for r in synth_embeddings_lowrank(spark, 400).collect()}
    small = synth_embeddings_lowrank(spark, 150).collect()
    assert len(big) == 400
    assert all(big[r.vec_id] == r.embedding for r in small)  # prefix == smaller corpus
    again = {r.vec_id: r.embedding for r in synth_embeddings_lowrank(spark, 400).collect()}
    assert big == again


def test_lowrank_synth_concentrates_variance(spark):
    """The planted structure is real: top-rank eigenvalues carry ≥ 0.9 of
    variance (vs ~0.16 at r=8 on the isotropic generator)."""
    import numpy as np

    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        LOWRANK_RANK,
        synth_embeddings_lowrank,
    )

    x = np.array(
        [r.embedding for r in synth_embeddings_lowrank(spark, 600).collect()],
        dtype=np.float64,
    )
    xc = x - x.mean(0)
    vals = np.sort(np.linalg.eigvalsh(xc.T @ xc))[::-1]
    assert vals[:LOWRANK_RANK].sum() / vals.sum() >= 0.9


def test_lowrank_recall_through_integer_route_beats_isotropic(spark):
    """The SCALE.md study's pytest floor: r=8 projection through the
    ORACLED power_directions path keeps ≥ 0.5 of full-space top-10
    neighbors on the planted table, and < 0.3 on the isotropic one —
    the variance-explained gate's GO/NO-GO cases on engine data."""
    import numpy as np

    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_directions,
        scaled_covariance,
        second_moments,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        synth_embeddings,
        synth_embeddings_lowrank,
    )

    def recall(df, n):
        rows = df.orderBy("vec_id").collect()
        x = np.array([r.embedding for r in rows], dtype=np.float64)
        dirs = np.array(
            power_directions(scaled_covariance(second_moments(df)).collect(), 8),
            dtype=np.float64,
        )
        y = x @ dirs.T

        def topk(m, qid, k=10):
            q = m[qid]
            nv = np.linalg.norm(m, axis=1) * np.linalg.norm(q)
            s = (m @ q) / np.where(nv > 0, nv, 1.0)
            s[qid] = -2
            return set(np.lexsort((np.arange(len(s)), -s))[:k].tolist())

        probes = [7 * i + 3 for i in range(10)]
        return float(
            np.mean([len(topk(x, q) & topk(y, q)) / 10 for q in probes])
        )

    n = 600
    assert recall(synth_embeddings_lowrank(spark, n), n) >= 0.5
    assert recall(synth_embeddings(spark, n, planted_every=10**9), n) < 0.3


# ── planted-Zipf events (r14, r13 verdict #6) ────────────────────────────


def test_zipf_synth_deterministic_prefix_stable_and_skewed(spark):
    import math

    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        ZIPF_USERS,
        synth_events_zipf,
    )

    a = sorted(tuple(r) for r in synth_events_zipf(spark, 500).collect())
    b = sorted(tuple(r) for r in synth_events_zipf(spark, 500).collect())
    assert a == b
    big = sorted(tuple(r) for r in synth_events_zipf(spark, 1000).collect())
    assert a == big[:500]  # prefix-stable: pure function of (event_id, seed)
    assert [f.name for f in synth_events_zipf(spark, 1).schema] == [
        "event_id", "user_id", "event_type", "value",
    ]
    # the planted law: rank 1's share ≈ ln(2)/ln(N) (~6% at N=1e5) — a
    # genuinely hot key; and the tail is long (many distinct users)
    n = 100_000
    counts = {
        r.user_id: r.cnt
        for r in synth_events_zipf(spark, n)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt")).limit(3).collect()
    }
    share = max(counts.values()) / n
    want = math.log(2) / math.log(ZIPF_USERS)
    assert want * 0.7 < share < want * 1.4, (share, want)
    assert min(counts) >= 1 and max(counts) <= 3  # hot ranks are the small ids
    n_distinct = (
        synth_events_zipf(spark, n).select("user_id").distinct().count()
    )
    assert n_distinct > 10_000  # long tail, not a two-key degenerate


def test_zipf_synth_is_a_narrow_distributed_map(spark):
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        synth_events_zipf,
    )

    plan = (
        synth_events_zipf(spark, 1000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # narrow: generation never shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ── image-like payloads with planted near-copies (r15) ───────────────────


def test_imagelike_synth_bytes_copies_and_pigeonhole(spark):
    """Generator contract for the dHash near-pair gate: md5-derived bytes
    match a Python replay exactly, each planted copy differs from its
    base in EXACTLY one pixel triple, the copy's dHash is within Hamming
    2 of its base (one cell → two comparisons), and — the pigeonhole the
    registry row leans on — every pair within Hamming 3 shares at least
    one 16-bit band."""
    import hashlib

    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        dhash_reference,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        IMAGELIKE_COPY_EVERY,
        IMAGELIKE_COPY_OFFSET,
        synth_docs_imagelike,
    )

    n_bytes, n_px = 864, 288
    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    got = {
        r.doc_id: bytes(r.payload)
        for r in synth_docs_imagelike(docs, n_bytes, n_px).collect()
    }

    def ref_byte(base: int, p: int) -> int:
        # chunked generation: hex pair (p % 16) of md5("<base>:<p DIV 16>")
        h = hashlib.md5(f"{base}:{p // 16}".encode()).hexdigest()
        return int(h[2 * (p % 16) : 2 * (p % 16) + 2], 16)

    # exact Python replay of a base payload
    assert got[3] == bytes(ref_byte(3, p) for p in range(n_bytes))
    # copies exist exactly for ids % COPY_EVERY == 0
    copies = [i for i in got if i >= IMAGELIKE_COPY_OFFSET]
    assert sorted(copies) == [
        i + IMAGELIKE_COPY_OFFSET for i in range(20) if i % IMAGELIKE_COPY_EVERY == 0
    ]
    for cid in copies:
        base = cid - IMAGELIKE_COPY_OFFSET
        diff = [p for p in range(n_bytes) if got[cid][p] != got[base][p]]
        k = base % n_px
        assert diff and set(diff) <= {3 * k, 3 * k + 1, 3 * k + 2}
        hb, cb = dhash_reference(got[base]), dhash_reference(got[cid])
        ham = bin(hb[0] ^ cb[0]).count("1") + bin(hb[1] ^ cb[1]).count("1")
        assert ham <= 2
        # pigeonhole: <= 3 differing bits leave a band untouched
        bands_b = (hb[0] >> 16, hb[0] & 0xFFFF, hb[1] >> 16, hb[1] & 0xFFFF)
        bands_c = (cb[0] >> 16, cb[0] & 0xFFFF, cb[1] >> 16, cb[1] & 0xFFFF)
        assert any(x == y for x, y in zip(bands_b, bands_c))


def test_imagelike_synth_is_narrow_and_python_free(spark):
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        synth_docs_imagelike,
    )

    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    plan = (
        synth_docs_imagelike(docs, 864, 288)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
