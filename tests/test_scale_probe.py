"""Contract test for tools/scale_probe.py: the probe must run end-to-end
and emit a parseable summary with fitted exponents — exercised at toy
corpus sizes via the env overrides so the whole tool (corpus synthesis,
every composed operator, the log-log fit) stays protected from bitrot
without a multi-minute measurement run."""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

PROBE_OPS = (
    "exact_dedup",
    "neardup_pairs_cc",
    "token_budget_sample",
    "global_packing",
    "line_dedup_partial_agg",
    "line_dedup_window_r7",
    "neardup_ingest_filter",
    "decontaminate",
    "dsir_sample",
    "vocab_ids",
    "perplexity_buckets",
    "source_cap",
    "dup_ngram_stats",
    "dup_span_removal",
    "bm25_topk",
    "nb_train",
    "nb_classify",
    "pca_covariance",
    "semdedup_fixed_k",
    "semdedup_scaled_k",
    "semdedup_two_level_scaled_k",
    "semdedup_capped_scaled_k",
    "ann_pairs_fixed4",
    "ann_pairs_scaled",
    "ann_ingest_filter",
    "ivf_build",
    "pq_build",
    "pq_adc_serve",
    "ivf_batch_serve",
    "brute_topk",
)


def test_scale_probe_runs_and_fits_exponents():
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_PROBE_BASE_DOCS="300",
        SPARK_GRAFT_PROBE_BASE_VECS="240",
        SPARK_GRAFT_DRIVER_MEM="2g",
    )
    out = subprocess.run(
        [sys.executable, "tools/scale_probe.py", "1", "2"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        check=True,
    ).stdout
    lines = [l for l in out.splitlines() if l.startswith("{")]
    summary = json.loads(lines[-1])["summary"]
    assert set(summary) == set(PROBE_OPS)
    for op, d in summary.items():
        assert len(d["points"]) == 2, op  # both factors measured
        assert d["exponent"] is not None, op
        assert all(v > 0 for v in d["points"].values()), op
    # the planted-dup recall invariant rides the extras: both ANN variants
    # must find every planted pair at both sizes
    extras = json.loads(lines[-1])["extras"]
    assert extras["ann_pairs_scaled.dup_pairs"] == {"240": 23, "480": 47}
    assert extras["ann_pairs_fixed4.dup_pairs"] == {"240": 23, "480": 47}
