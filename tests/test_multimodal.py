"""Multimodal operator tests: the Arrow-batched binary-column pipeline
(payload attach → feature extract / frame sample / resize) with pure-Python
expected values, plus plan shape (Arrow-only, narrow — no shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
    CHECKSUM_MOD,
    CHECKSUM_PREFIX,
    FRAME_BYTES,
    FRAME_SAMPLE_LEN,
    RESIZE_FACTOR,
    decode_image,
    extract_features,
    resize_payload,
    sample_frames,
    with_payload,
)


@pytest.fixture()
def payload_df(spark):
    rows = [
        (1, "a" * 2500),              # 2 full frames + remainder
        (2, "xy"),                    # shorter than a frame → no frame rows
        (3, "b" * (FRAME_BYTES * 3)),  # exactly 3 frames
    ]
    return with_payload(spark.createDataFrame(rows, "doc_id long, text string"))


def test_extract_features_matches_python(spark, payload_df):
    got = {r.doc_id: r for r in extract_features(payload_df).collect()}
    for doc_id, text in ((1, "a" * 2500), (2, "xy"), (3, "b" * 3000)):
        raw = text.encode()
        assert got[doc_id].n_bytes == len(raw)
        assert got[doc_id].checksum == sum(raw[:CHECKSUM_PREFIX]) % CHECKSUM_MOD
        assert got[doc_id].n_frames == len(raw) // FRAME_BYTES


def test_sample_frames_fans_out_per_stride(spark, payload_df):
    rows = sample_frames(payload_df).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc.get(1, [])) == 2 and len(by_doc.get(3, [])) == 3
    assert 2 not in by_doc  # sub-frame payloads produce no frames
    f0 = next(r for r in by_doc[1] if r.frame_idx == 0)
    assert bytes(f0.frame) == b"a" * FRAME_SAMPLE_LEN
    assert f0.frame_checksum == (ord("a") * FRAME_SAMPLE_LEN) % CHECKSUM_MOD
    f2 = next(r for r in by_doc[3] if r.frame_idx == 2)
    assert bytes(f2.frame) == b"b" * FRAME_SAMPLE_LEN


def test_resize_payload_downsamples_bytes(spark, payload_df):
    got = {r.doc_id: r for r in resize_payload(payload_df).collect()}
    raw = ("a" * 2500).encode()
    assert bytes(got[1].payload) == raw[::RESIZE_FACTOR]
    assert got[1].orig_bytes == 2500
    assert got[1].resized_bytes == len(raw[::RESIZE_FACTOR])
    # output keeps the binary-plus-metadata shape for downstream stages
    assert dict(resize_payload(payload_df).dtypes)["payload"] == "binary"


def test_multimodal_plans_are_arrow_and_narrow(spark, payload_df):
    for op in (extract_features, sample_frames, resize_payload):
        plan = op(payload_df)._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, op.__name__
        assert "BatchEvalPython" not in plan, op.__name__  # Arrow, not per-row
        assert "Exchange" not in plan, op.__name__  # narrow: no shuffle


def test_decode_stub_is_explicit(spark):
    with pytest.raises(NotImplementedError, match="image codec"):
        decode_image(b"\x89PNG")


def test_frame_sampling_composes_with_resize(spark, payload_df):
    """resize → frame-sample chains inside one narrow Arrow pipeline (the
    media-preprocessing composition); frame counts follow the RESIZED
    byte length."""
    resized = resize_payload(payload_df)
    frames = sample_frames(resized.select("doc_id", "payload"))
    n = frames.filter(F.col("doc_id") == 3).count()
    assert n == (3 * FRAME_BYTES // RESIZE_FACTOR) // FRAME_BYTES
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
