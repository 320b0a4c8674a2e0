"""Empirical scaling probe: measure how the scale-critical operators GROW.

The driver's fixed testdata stops at sf0.1 (5k docs / 2k vectors) — enough
to verify correctness, not to observe cost curves.  This probe generates
seeded synthetic corpora (``sources/synth.py``) at 1×/4×/16× the bench SF
and times each operator at every size, then fits the growth exponent
alpha in t ≈ c·N^alpha (least squares over log-log).  alpha ≈ 1 means the
plan's work scales with the data (what a 1000-executor cluster can
absorb); alpha ≈ 2 is the quadratic cliff the banded/bucketed designs
exist to avoid.

Probed (composed from the same operator APIs the registry rows use):

* exact_dedup           — md5-fingerprint groupBy (hash agg, linear)
* neardup_pairs_cc      — minhash → LSH bands → candidate equi-join →
                          Jaccard verify → connected components (the full
                          in-corpus near-dup clustering pipeline)
* neardup_ingest_filter — 10% micro-batch vs prebuilt index (serving path)
* token_budget_sample   — hash-order greedy token-budget fill via the
                          two-phase prefix-sum (expected ≈linear; the
                          naive global window would serialize)
* global_packing        — corpus-order packing into fixed sequences
                          (same prefix-sum machinery; expected ≈linear)
* line_dedup_partial_agg — corpus-wide first-occurrence line dedup (r8
                          partial-agg plan) on a skewed corpus: one
                          boilerplate line in 50% of docs + a blank line
                          per doc (expected ≈linear, parallel)
* line_dedup_window_r7  — inline replica of the replaced r7 window plan
                          on the same corpus (the hot line and the blank
                          lines each serialize through one task)
* ann_pairs_fixed4      — in-corpus cosine≥0.9 pairs, oracle 6×4-plane
                          config: EXPECTED ≈quadratic (the probe's point —
                          fixed depth does not survive scale; capped at 4×)
* ann_pairs_scaled      — same with planes_per_table_for(N) depth:
                          expected ≈linear
* ann_ingest_filter     — 10% micro-batch vs scaled-depth index
* ivf_build             — quantized k-means fit on the 1/4 sample + full
                          assignment + partitionBy(cluster) persist
* ivf_batch_serve       — 4-query batch from the persisted index (warm,
                          partition-pruned)
* brute_topk            — 4-query exact cosine top-10 (linear reference)

Usage: python tools/scale_probe.py [factor ...]   (default: 1 4 16)
Prints one JSON line per measurement and a final ``summary`` line with
fitted exponents.  Results are recorded/discussed in SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# sf0.1 table sizes; env-overridable so the contract test can exercise the
# whole probe in seconds at toy sizes (measurement runs use the defaults)
BASE_DOCS = int(os.environ.get("SPARK_GRAFT_PROBE_BASE_DOCS", "5000"))
BASE_VECS = int(os.environ.get("SPARK_GRAFT_PROBE_BASE_VECS", "2000"))
JACCARD_PCT = 60
MIN_COS = 0.9
#: fixed-depth ANN pairs are ~quadratic; past this factor the probe would
#: spend its whole budget demonstrating a slope two points already show
FIXED_DEPTH_MAX_FACTOR = 4

#: SemDeDup scale contract: k grows so cells stay ~this many rows
SEMDEDUP_TARGET_CELL = 250


def _timed(fn, runs: int = 2) -> float:
    best = math.inf
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_CPUS='*' is valid for the master string but not for
    # shuffle partitions (same class as bench.py's startup validation)
    try:
        shuffle_parts = int(cpus)
    except ValueError:
        shuffle_parts = 32

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dead-letter-engine-scale-probe")
        # local mode puts driver AND all 32 executor threads in ONE JVM
        # whose default heap is 1g — the 16x fixed-depth candidate distinct
        # OOMs it.  The probe box has 128 GiB; on a real cluster this is
        # ordinary per-executor memory, not a knob the plan depends on.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256kb")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        dot,
        lsh_table_keys_int,
        planes_per_table_for,
    )
    from kafka_streams_dead_letter_publishing_spark.functions.text import (
        band_keys_from_minhash,
        minhash_array,
        norm_text,
        shingles,
        tokens,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
        ann_filter,
        build_ann_index,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.components import (
        connected_components,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        indexable,
        ivf_search_batch,
        kmeans_fit_quantized,
        nearest_cluster_quantized,
        quantize_embedding,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        token_budget_sample,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.lines import (
        corpus_line_first_occurrence,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.neardup_filter import (
        build_neardup_index,
        neardup_filter,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.packing import (
        pack_corpus_segments,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        synth_documents,
        synth_embeddings,
    )

    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warm-up

    results: dict[str, dict[int, float]] = {}
    extras: dict[str, dict[int, int]] = {}

    def record(op: str, n: int, sec: float, **extra) -> None:
        results.setdefault(op, {})[n] = sec
        for k, v in extra.items():
            extras.setdefault(f"{op}.{k}", {})[n] = v
        print(json.dumps({"op": op, "n": n, "sec": sec, **extra}))
        sys.stdout.flush()

    def staged_docs(docs):
        return docs.select(
            "doc_id", shingles(tokens(norm_text(F.col("text")))).alias("sh")
        )

    def neardup_pairs(staged):
        banded = staged.select(
            "doc_id",
            F.size("sh").alias("n_sh"),
            minhash_array(F.col("sh")).alias("mh"),
        ).select(
            "doc_id",
            F.explode(band_keys_from_minhash(F.col("mh"), F.col("n_sh"))).alias("bk"),
        )
        cands = (
            banded.alias("a")
            .join(banded.alias("b"), "bk")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        n_common = F.size(F.array_intersect("a.sh", "b.sh"))
        return (
            cands.join(staged.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
            .join(staged.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
            .select(
                "doc_a",
                "doc_b",
                n_common.alias("nc"),
                (F.size("a.sh") + F.size("b.sh")).alias("nab"),
            )
            .filter(F.col("nc") * 100 >= (F.col("nab") - F.col("nc")) * JACCARD_PCT)
            .select("doc_a", "doc_b")
        )

    def ann_pairs(emb, planes_per_table):
        base = emb.select(
            "vec_id",
            "embedding",
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        ).filter(F.col("nrm") > 0)
        keys = base.select(
            "vec_id",
            F.explode(
                lsh_table_keys_int(F.col("embedding"), 6, planes_per_table)
            ).alias("bk"),
        )
        cands = (
            keys.alias("a")
            .join(keys.alias("b"), "bk")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
            .distinct()
        )
        verified = (
            cands.join(
                base.select(
                    F.col("vec_id").alias("va"),
                    F.col("embedding").alias("ea"),
                    F.col("nrm").alias("na"),
                ),
                "va",
            )
            .join(
                base.select(
                    F.col("vec_id").alias("vb"),
                    F.col("embedding").alias("eb"),
                    F.col("nrm").alias("nb"),
                ),
                "vb",
            )
            .select(
                "va",
                "vb",
                F.try_divide(
                    dot(F.col("ea"), F.col("eb")), F.col("na") * F.col("nb")
                ).alias("cos"),
            )
            .filter(F.col("cos") >= MIN_COS)
        )
        return cands, verified

    for f in factors:
        n_docs, n_vecs = BASE_DOCS * f, BASE_VECS * f

        # ── text family ────────────────────────────────────────────────
        docs = synth_documents(spark, n_docs).persist()
        docs.count()

        record(
            "exact_dedup",
            n_docs,
            _timed(
                lambda: _noop(
                    docs.groupBy(F.md5("text").alias("fp")).agg(
                        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper")
                    )
                )
            ),
        )

        staged = staged_docs(docs).persist()
        staged.count()
        pair_count = {}

        def run_neardup_cc():
            pairs = neardup_pairs(staged)
            cc = connected_components(pairs)
            pair_count["n"] = cc.count()

        record("neardup_pairs_cc", n_docs, _timed(run_neardup_cc), clustered_nodes=pair_count["n"])

        # global running totals via the two-phase prefix-sum: the
        # sampling/packing family must stay ~linear (the naive global
        # window would serialize on one task and the probe would show it)
        scored = docs.select(
            "doc_id",
            F.size(tokens(norm_text(F.col("text")))).cast("long").alias("n_tokens"),
        ).persist()
        total = int(scored.agg(F.sum("n_tokens")).collect()[0][0] or 0)
        record(
            "token_budget_sample",
            n_docs,
            _timed(lambda: _noop(token_budget_sample(scored, "n_tokens", total // 2))),
        )
        record(
            "global_packing",
            n_docs,
            _timed(lambda: _noop(pack_corpus_segments(scored, "n_tokens", 64))),
        )
        scored.unpersist()

        # corpus-wide line dedup on a DELIBERATELY skewed corpus: ONE
        # boilerplate line planted in half the docs plus one blank line
        # per doc — the workload whose hot keys killed the r7 window plan.
        # Probe both the r8 partial-agg plan and an inline replica of the
        # replaced r7 window plan: the r8 exponent should track ~1 with a
        # flat gap, the window replica's wall time is bounded below by
        # (hot-line rows + all blank lines) through two tasks and grows
        # with the plant no matter the core count.
        lined = docs.withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.lit("\nsubscribe to our newsletter today"),
                ).otherwise(F.lit("")),
                F.lit("\n"),
            ),
        ).persist()
        lined.count()
        lines = lined.select(
            "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
        )
        record(
            "line_dedup_partial_agg",
            n_docs,
            _timed(lambda: _noop(corpus_line_first_occurrence(lines))),
        )

        def run_window_replica():
            from pyspark.sql import Window

            w = Window.partitionBy("line").orderBy("doc_id", "pos")
            _noop(
                lines.withColumn(
                    "keep",
                    (F.length(F.trim("line")) == 0)
                    | (F.row_number().over(w) == 1),
                )
            )

        record("line_dedup_window_r7", n_docs, _timed(run_window_replica))
        lined.unpersist()

        # ── r8 sampling/selection family: expected ~linear ────────────
        # decontamination: the eval benchmark stays FIXED-size while the
        # corpus grows (that is the production shape — eval sets are
        # static); cost should be corpus-linear with a constant broadcast
        from kafka_streams_dead_letter_publishing_spark.operators.budget import (
            source_cap,
        )
        from kafka_streams_dead_letter_publishing_spark.operators.decontaminate import (
            decontaminate,
        )
        from kafka_streams_dead_letter_publishing_spark.operators.dsir import (
            dsir_sample,
        )
        from kafka_streams_dead_letter_publishing_spark.operators.vocab import (
            vocab_ids,
        )

        eval_docs = synth_documents(spark, BASE_DOCS // 10, seed=99).persist()
        eval_docs.count()
        record(
            "decontaminate",
            n_docs,
            _timed(lambda: _noop(decontaminate(docs, eval_docs, k=5))),
        )
        eval_docs.unpersist()
        record(
            "dsir_sample",
            n_docs,
            _timed(
                lambda: _noop(
                    dsir_sample(
                        docs, None, n=100,
                        target_pred=F.col("doc_id") % 5 == 0,
                    )
                )
            ),
        )
        record(
            "vocab_ids",
            n_docs,
            _timed(lambda: _noop(vocab_ids(docs))),
        )
        from kafka_streams_dead_letter_publishing_spark.operators.perplexity import (
            perplexity_buckets,
        )

        # expected ~linear: LM fit is partial-agg + driver-bounded
        # TakeOrdered; scoring is two broadcast joins + per-doc sum
        # (includes the one metadata-scalar driver read per call)
        record(
            "perplexity_buckets",
            n_docs,
            _timed(
                lambda: _noop(
                    perplexity_buckets(docs, F.col("doc_id") % 5 == 0)
                )
            ),
        )
        record(
            "source_cap",
            n_docs,
            _timed(lambda: _noop(source_cap(docs, cap=BASE_DOCS // 40))),
        )

        # ── r9 substring family: expected ~linear (explode + partial-agg
        # count + skew-splittable join-back; the gram blow-up is the
        # method's honest k-independent row-count price) ────────────────
        from kafka_streams_dead_letter_publishing_spark.operators.substrings import (
            dup_ngram_stats,
            remove_dup_spans,
        )

        tok_staged = docs.select(
            "doc_id", tokens(norm_text(F.col("text"))).alias("toks")
        ).persist()
        tok_staged.count()
        record(
            "dup_ngram_stats",
            n_docs,
            _timed(lambda: _noop(dup_ngram_stats(tok_staged, 8))),
        )
        record(
            "dup_span_removal",
            n_docs,
            _timed(lambda: _noop(remove_dup_spans(tok_staged, 8))),
        )
        tok_staged.unpersist()

        # ── r9 BM25 retrieval: expected ~linear (broadcast query terms
        # into the exploded scan, partial-agg tf, two-phase top-k; the
        # only corpus-sized shuffle is the (query,term,doc) tf groupBy)
        from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
            bm25_topk,
        )

        record(
            "bm25_topk",
            n_docs,
            _timed(lambda: _noop(bm25_topk(docs))),
        )

        # ── r9 NB classifier: train (two partial-agg counts + driver
        # model) and classify (broadcast model, doc-id-keyed agg) —
        # both expected ~linear with broadcast-size constants
        from kafka_streams_dead_letter_publishing_spark.operators.nbayes import (
            nb_classify,
            nb_train,
        )

        model_box = {}

        def run_nb_train():
            model_box["m"] = nb_train(
                docs.filter(F.col("doc_id") % 5 != 0), "lang"
            )

        record("nb_train", n_docs, _timed(run_nb_train, runs=1))
        record(
            "nb_classify",
            n_docs,
            _timed(lambda: _noop(nb_classify(docs, model_box["m"]))),
        )

        nd_idx = build_neardup_index(docs.filter(F.col("doc_id") % 10 != 0))
        nd_idx = nd_idx._replace(
            bands=nd_idx.bands.persist(), shingles=nd_idx.shingles.persist()
        )
        nd_idx.bands.count(), nd_idx.shingles.count()
        nd_batch = docs.filter(F.col("doc_id") % 10 == 0).persist()
        nd_batch.count()
        record(
            "neardup_ingest_filter",
            n_docs,
            _timed(lambda: _noop(neardup_filter(nd_batch, nd_idx))),
        )
        for df in (staged, nd_idx.bands, nd_idx.shingles, nd_batch, docs):
            df.unpersist()

        # ── embedding family ───────────────────────────────────────────
        emb = synth_embeddings(spark, n_vecs).persist()
        emb.count()

        if f <= FIXED_DEPTH_MAX_FACTOR:
            counts = {}

            def run_fixed():
                cands, verified = ann_pairs(emb, 4)
                counts["cands"] = cands.count()
                counts["dups"] = verified.count()

            record(
                "ann_pairs_fixed4",
                n_vecs,
                _timed(run_fixed),
                candidates=counts["cands"],
                dup_pairs=counts["dups"],
            )
        else:
            print(
                json.dumps(
                    {
                        "op": "ann_pairs_fixed4",
                        "n": n_vecs,
                        "skipped": f"fixed 4-plane depth is ~quadratic; factor {f} "
                        "omitted by design (see exponent from the smaller sizes)",
                    }
                )
            )

        b = planes_per_table_for(n_vecs)
        counts = {}

        def run_scaled():
            cands, verified = ann_pairs(emb, b)
            counts["cands"] = cands.count()
            counts["dups"] = verified.count()

        record(
            "ann_pairs_scaled",
            n_vecs,
            _timed(run_scaled),
            candidates=counts["cands"],
            dup_pairs=counts["dups"],
            planes_per_table=b,
        )

        ann_idx = build_ann_index(
            emb.filter(F.col("vec_id") % 10 != 0), planes_per_table=b
        )
        ann_idx = ann_idx._replace(
            buckets=ann_idx.buckets.persist(), vectors=ann_idx.vectors.persist()
        )
        ann_idx.buckets.count(), ann_idx.vectors.count()
        ann_batch = emb.filter(F.col("vec_id") % 10 == 0).persist()
        ann_batch.count()
        record(
            "ann_ingest_filter",
            n_vecs,
            _timed(lambda: _noop(ann_filter(ann_batch, ann_idx, min_cos=MIN_COS))),
        )
        for df in (ann_idx.buckets, ann_idx.vectors, ann_batch):
            df.unpersist()

        # IVF lifecycle: sampled fit + full assign + partitioned persist,
        # then warm batch serving from the pruned index
        idx_dir = tempfile.mkdtemp(prefix="scale-probe-ivf-")
        cents_box = {}

        def run_ivf_build():
            clean = emb.filter(indexable(F.col("embedding"), 64))
            cents = kmeans_fit_quantized(
                clean.filter(F.col("vec_id") % 4 == 0), k=8, iters=3
            )
            assigned = clean.select(
                "vec_id",
                "embedding",
                nearest_cluster_quantized(
                    cents, quantize_embedding(F.col("embedding"))
                ).alias("cluster"),
            )
            assigned.repartition("cluster").write.mode("overwrite").partitionBy(
                "cluster"
            ).parquet(idx_dir)
            cents_box["c"] = cents

        record("ivf_build", n_vecs, _timed(run_ivf_build, runs=1))

        # ── r9 SemDeDup: the within-cell pairwise is (N/k)² per cell, so
        # FIXED k is expected ~quadratic (probed only at small factors,
        # like fixed-depth LSH) and the scale contract is k ∝ N — cells
        # stay ~SEMDEDUP_TARGET_CELL rows and cost stays ~linear.  The
        # quantizer fit itself rides the ivf_build row above.
        from kafka_streams_dead_letter_publishing_spark.operators.semdedup import (
            semdedup_flags,
        )

        clean_emb = emb.filter(indexable(F.col("embedding"), 64))
        if f <= FIXED_DEPTH_MAX_FACTOR:
            cents_fixed = kmeans_fit_quantized(
                clean_emb.filter(F.col("vec_id") % 4 == 0), k=8, iters=2
            )
            record(
                "semdedup_fixed_k",
                n_vecs,
                _timed(lambda: _noop(semdedup_flags(clean_emb, cents_fixed, 0.9))),
                k=8,
            )
        else:
            print(json.dumps({
                "op": "semdedup_fixed_k", "n": n_vecs,
                "skipped": "fixed-k cells grow with N -> ~quadratic pair "
                f"search; factor {f} omitted by design",
            }))
        k_scaled = max(8, n_vecs // SEMDEDUP_TARGET_CELL)
        cents_scaled = kmeans_fit_quantized(
            clean_emb.filter(F.col("vec_id") % 4 == 0), k=k_scaled, iters=2
        )
        record(
            "semdedup_scaled_k",
            n_vecs,
            _timed(
                lambda: _noop(
                    semdedup_flags(clean_emb, cents_scaled, 0.9, routing="flat")
                )
            ),
            k=k_scaled,
        )
        # r11: two-level routing over the SAME scaled centroids — the
        # O(sqrt k) fold that replaces the flat O(k) fold past the
        # SEMDEDUP_FLAT_MAX_K refusal guard; with k ∝ N the flat fold's
        # compute is O(N²/cell) (measured 1.27) while two-level is
        # O(N·sqrt(N/cell)) — expected exponent ≈ 1.1 at probe sizes
        record(
            "semdedup_two_level_scaled_k",
            n_vecs,
            _timed(
                lambda: _noop(
                    semdedup_flags(
                        clean_emb, cents_scaled, 0.9, routing="two_level"
                    )
                )
            ),
            k=k_scaled,
        )
        # r12: the hot-cell occupancy cap — the residual super-linear term
        # in both semdedup rows is the within-cell O(|cell|²) pair search
        # (exponent 1.06 measured r11); with pair work bounded by N·cap
        # the expected exponent is ~1.0
        record(
            "semdedup_capped_scaled_k",
            n_vecs,
            _timed(
                lambda: _noop(
                    semdedup_flags(
                        clean_emb,
                        cents_scaled,
                        0.9,
                        routing="two_level",
                        max_cell_occupancy=4 * SEMDEDUP_TARGET_CELL,
                    )
                )
            ),
            k=k_scaled,
        )

        queries = [
            [float(x) for x in r.embedding]
            for r in emb.filter(F.col("vec_id").isin([1, 3, 5, 7])).collect()
        ]
        q_micro = [[math.floor(x * 1_000_000) for x in q] for q in queries]
        idx_df = spark.read.parquet(idx_dir)
        record(
            "ivf_batch_serve",
            n_vecs,
            _timed(
                lambda: _noop(
                    ivf_search_batch(
                        idx_df, cents_box["c"], queries, nprobe=3, k=10,
                        route_queries=q_micro,
                    )
                )
            ),
        )
        shutil.rmtree(idx_dir, ignore_errors=True)

        # linear reference: brute-force 4-query top-10 (two-phase)
        from pyspark.sql import Window

        qm = F.expr(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in q) + ")"
                for q in queries
            )
            + ")"
        )

        def run_brute():
            scored = (
                emb.select(
                    "vec_id", F.posexplode(qm).alias("query_id", "qv"), "embedding"
                )
                .select(
                    "query_id",
                    "vec_id",
                    F.try_divide(
                        dot(F.col("embedding"), F.col("qv")),
                        F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                        * F.sqrt(dot(F.col("qv"), F.col("qv"))),
                    ).alias("cos"),
                )
                .filter(F.col("cos").isNotNull())
            )
            staged2 = scored.withColumn("pid", F.spark_partition_id())
            w_local = Window.partitionBy("pid", "query_id").orderBy(
                F.desc("cos"), F.asc("vec_id")
            )
            local = (
                staged2.withColumn("rn", F.row_number().over(w_local))
                .filter(F.col("rn") <= 10)
                .drop("pid", "rn")
            )
            w_g = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
            _noop(
                local.withColumn("rnk", F.row_number().over(w_g)).filter(
                    F.col("rnk") <= 10
                )
            )

        record("brute_topk", n_vecs, _timed(run_brute))

        # r9 PCA: the covariance build explodes d(d+1)/2 products per
        # vector but partial-aggregates to <= d^2 cells per partition —
        # expected ~linear in N with a d^2 constant
        from kafka_streams_dead_letter_publishing_spark.operators.pca import (
            scaled_covariance,
            second_moments,
        )

        record(
            "pca_covariance",
            n_vecs,
            _timed(lambda: _noop(scaled_covariance(second_moments(emb)))),
        )

        # PQ tier (r8): joint codebook fit + encode (build, runs=1) and
        # warm ADC shortlist serving — the memory-bounded scan should
        # track brute_topk's shape at a fraction of the bytes
        from kafka_streams_dead_letter_publishing_spark.operators.pq import (
            l2_normalize,
            pq_encode,
            pq_fit,
            pq_search_batch,
        )

        dim = len(queries[0])
        pq_dir = tempfile.mkdtemp(prefix="scale-probe-pq-")
        books_box = {}

        def run_pq_build():
            norm = l2_normalize(emb)
            books = pq_fit(norm, dim, m=16, k=16, iters=3)
            pq_encode(norm, books, dim).write.mode("overwrite").parquet(pq_dir)
            books_box["b"] = books

        record("pq_build", n_vecs, _timed(run_pq_build, runs=1))
        codes_df = spark.read.parquet(pq_dir)
        unit_queries = [
            [x / math.sqrt(sum(v * v for v in q)) for x in q] for q in queries
        ]
        record(
            "pq_adc_serve",
            n_vecs,
            _timed(
                lambda: _noop(
                    pq_search_batch(codes_df, books_box["b"], unit_queries, k_top=50)
                )
            ),
        )
        shutil.rmtree(pq_dir, ignore_errors=True)
        emb.unpersist()

    # ── fitted exponents: slope of log t over log n ────────────────────
    summary = {}
    for op, pts in results.items():
        if len(pts) < 2:
            summary[op] = {"points": pts, "exponent": None}
            continue
        xs = [math.log(n) for n in sorted(pts)]
        ys = [math.log(max(pts[n], 1e-3)) for n in sorted(pts)]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        summary[op] = {"points": pts, "exponent": round(slope, 2)}
    print(json.dumps({"summary": summary, "extras": extras, "factors": factors}))
    spark.stop()


if __name__ == "__main__":
    main()
