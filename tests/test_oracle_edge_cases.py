"""Engine-vs-oracle agreement on inputs the driver's synthetic data never
produces — the r2/r3 ADVICE latent-divergence classes, pinned BY
CONSTRUCTION instead of by dataset luck:

* NULL ``events.value`` / NULL ``props`` through the dead-letter derivation
  (the engine routes NULL values to the process channel as NullValueError;
  the oracle CTE needs its explicit NULL arm to agree);
* non-ASCII documents through the gear-hash CDC (codepoint-mod-256 gear
  indexing must match on both engines — an un-modded lookup NULL-poisons
  the Spark rolling hash for the rest of the document);
* JSON props keys containing '.' (the oracle's JSONPath must quote the key
  where Spark reads the map entry directly).

Each test writes a tiny synthetic parquet table and runs the REGISTERED
query + its REGISTERED oracle over it — the same comparison the driver's
correctness gate performs, on adversarial rows.
"""

from __future__ import annotations

import datetime
import math
import struct

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_dead_letter_publishing_spark.plans import QUERIES, RETIRED


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack(">d", v).hex()  # floats compare bitwise
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def assert_query_matches_oracle(
    spark, sf_dir: str, name: str, tables: tuple[str, ...] = ("events", "documents")
) -> list:
    # RETIRED rows keep their oracle pair runnable here without
    # consuming a driver-rotation slot (plans/registry.py r15)
    q = QUERIES.get(name) or RETIRED[name]
    sdf = q.spark(spark, sf_dir).toPandas()
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        odf = con.sql(q.oracle).df()
    finally:
        con.close()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), name
    srows = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in sdf.to_dict("records")), key=repr
    )
    orows = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in odf.to_dict("records")), key=repr
    )
    assert srows == orows, f"{name}: first diff {next((a, b) for a, b in zip(srows, orows) if a != b) if len(srows) == len(orows) else (len(srows), len(orows))}"
    return srows


def _write_events(path: str, rows: list[dict]) -> None:
    # ts as TIMESTAMP(NANOS) to mirror the driver's events.parquet (the
    # loader reads nanos-as-long and rebuilds microsecond NTZ)
    base = datetime.datetime(2024, 1, 1)
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(minutes=i) for i in range(len(rows))],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([r["props"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)


def _write_documents(path: str, rows: list[dict]) -> None:
    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["test"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r["text"]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture()
def null_events_dir(tmp_path):
    """Events rows exercising every routing arm INCLUDING NULL value/props —
    the class of input the driver's corpus never contains (r2/r3 ADVICE)."""
    rows = [
        # happy path: n = pmod(floor(value*10), 4096)
        {"event_id": 1, "user_id": 3, "event_type": "click", "value": 12.5, "props": '{"k": 1}'},
        # NULL value, default branch → n NULL → NullValueError process route
        {"event_id": 2, "user_id": 3, "event_type": "click", "value": None, "props": '{"k": 2}'},
        # NULL value on the %7 branch → still NULL n
        {"event_id": 3, "user_id": 7, "event_type": "click", "value": None, "props": '{"k": 3}'},
        # NULL value on the %11 branch: n does NOT depend on value → prod route
        {"event_id": 4, "user_id": 11, "event_type": "click", "value": None, "props": '{"k": 4}'},
        # NULL props + event_type=error: NOT the deser arm (props IS NULL) —
        # value = int32be(n), normal routing
        {"event_id": 5, "user_id": 3, "event_type": "error", "value": 7.0, "props": None},
        # NULL props AND NULL value together
        {"event_id": 6, "user_id": 5, "event_type": "error", "value": None, "props": None},
        # deser route: error + props of length != 4
        {"event_id": 7, "user_id": 2, "event_type": "error", "value": 3.0, "props": '{"k": 77}'},
        # negative n (%7 branch, value >= 0)
        {"event_id": 8, "user_id": 14, "event_type": "click", "value": 5.0, "props": '{"k": 8}'},
        # too-large n (%11 branch)
        {"event_id": 9, "user_id": 22, "event_type": "click", "value": 1.0, "props": '{"k": 9}'},
        # NON-ASCII props, 2 chars / 4 UTF-8 BYTES: the deser guard must
        # count BYTES — this encodes to a value the int32 deserializer
        # accepts, so it routes by the decoded n, NOT to the deser channel
        # (a char-counting guard marks it deser and every dlt row diverges)
        {"event_id": 10, "user_id": 3, "event_type": "error", "value": 2.0, "props": "€a"},
        # NON-ASCII props, 5 chars / 6 bytes: deser channel, and the size
        # header must say 6 (bytes received), never 5 (chars)
        {"event_id": 11, "user_id": 3, "event_type": "error", "value": 2.0, "props": "héllo"},
    ]
    _write_events(str(tmp_path / "events.parquet"), rows)
    _write_documents(str(tmp_path / "documents.parquet"), [{"doc_id": 1, "text": "x y z"}])
    return str(tmp_path)


@pytest.fixture()
def boundary_events_dir(tmp_path):
    """Event-time shapes the generated corpus is vanishingly unlikely to
    contain: inactivity gaps of EXACTLY 30:00 (the sessionization boundary
    — session_window vs the oracle's >= INTERVAL arithmetic must agree on
    which side starts a new session), duplicate timestamps, click/purchase
    ties at the same instant (as-of boundary), and single-event users."""
    base = datetime.datetime(2024, 3, 1)

    def ev(eid, uid, etype, minutes, micros=0):
        return {
            "event_id": eid,
            "user_id": uid,
            "event_type": etype,
            "value": float(eid),
            "props": '{"k": %d}' % eid,
            "ts": base + datetime.timedelta(minutes=minutes, microseconds=micros),
        }

    rows = [
        # user 1: gaps exactly 30:00 — every event its own session or one?
        ev(1, 1, "click", 0),
        ev(2, 1, "click", 30),
        ev(3, 1, "click", 60),
        # user 2: 29:59.999999 then 30:00.000001 gaps
        ev(4, 2, "click", 0),
        ev(5, 2, "click", 30, -1),
        ev(6, 2, "view", 60, 1),
        # user 3: duplicate timestamps + a purchase at the same instant as
        # a click (as-of 'most recent prior or equal' boundary + tie-break)
        ev(7, 3, "click", 0),
        ev(8, 3, "click", 0),
        ev(9, 3, "purchase", 0),
        ev(10, 3, "purchase", 5),
        # user 4: single event; user 5: purchase with NO prior click
        ev(11, 4, "view", 0),
        ev(12, 5, "purchase", 0),
        ev(13, 5, "click", 10),
    ]
    # custom writer: ts provided explicitly per row
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([r["props"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    _write_documents(str(tmp_path / "documents.parquet"), [{"doc_id": 1, "text": "x y z"}])
    return str(tmp_path)


BOUNDARY_EVENT_QUERIES = (
    "events_sessionization",
    "events_hourly_stats",
    "events_asof_purchase_click",
    "events_asof_left_tolerance",
    "events_salted_type_counts",
    # user-3 rows give pairs at gap EXACTLY 5:00 (`<=` includes) and at
    # the same instant (`>` excludes) — the interval join's two edges
    "events_interval_self_join",
)


@pytest.mark.parametrize("name", BOUNDARY_EVENT_QUERIES)
def test_event_time_boundaries_agree(spark, boundary_events_dir, name):
    assert_query_matches_oracle(spark, boundary_events_dir, name)


NULL_SENSITIVE_QUERIES = (
    "dlt_route_counts",
    "dlt_output_lengths",
    "dlt_process_channel",
    "dlt_deser_channel",
    "dlt_prod_channel",
    "dlt_udf_safe_map",
    "serde_roundtrip_int32",
)


@pytest.mark.parametrize("name", NULL_SENSITIVE_QUERIES)
def test_dead_letter_oracles_agree_on_null_values(spark, null_events_dir, name):
    assert_query_matches_oracle(spark, null_events_dir, name)


def test_null_values_route_to_process_channel(spark, null_events_dir):
    """The three NULL-n rows (event 2, 3, 6) must land on the process
    channel as NullValueError — not fall through to output (the exact
    divergence the oracle's NULL arm now prevents by construction)."""
    rows = QUERIES["dlt_process_channel"].spark(spark, null_events_dir).collect()
    null_rows = [r for r in rows if r.err == "NullValueError: null"]
    assert sorted(r.key_str for r in null_rows) == ["3-2", "5-6", "7-3"]
    assert all(r.original_value is None for r in null_rows)


def test_deser_guard_counts_bytes_not_chars(spark, null_events_dir):
    """Event 10 ('€a', 2 chars / 4 bytes) must NOT reach the deser channel —
    its encoded value decodes as an int32, so the engine routes it by n;
    event 11 ('héllo', 5 chars / 6 bytes) must, and its size header must
    report 6 BYTES received."""
    deser = QUERIES["dlt_deser_channel"].spark(spark, null_events_dir).collect()
    keys = {r.key_str for r in deser}
    assert "3-10" not in keys  # 4-byte props decodes cleanly: routed by n
    row11 = next(r for r in deser if r.key_str == "3-11")
    assert row11.raw_value == "héllo"
    assert "is 6, expected 4" in row11.err, row11.err


@pytest.fixture()
def non_ascii_docs_dir(tmp_path):
    """Documents with codepoints far past U+00FF, placed EARLY so most of
    the rolling hash runs after them (the r3 ADVICE failure mode: an
    un-modded gear lookup NULLs the hash for the rest of the document).

    Deliberately EXCLUDED: Turkish İ (U+0130) and Greek final-position Σ.
    Java's conditional full case mapping (Spark ``lower``) and utf8proc's
    simple mapping (DuckDB ``lower``) genuinely differ there — probed:
    lower('İstanbul') is 'i̇stanbul' (combining dot) on Spark vs 'istanbul'
    on DuckDB, lower('ΣΟΦΟΣ') ends in ς vs σ — so any lower()-derived
    value (fingerprints, tokens) diverges BY LIBRARY SEMANTICS, not by a
    plan bug.  Everything else (accents, CJK, Cyrillic, ligatures, astral
    emoji, ß) maps identically and is covered below."""
    long_tail = " ".join(f"token{i} payload{i * 7}" for i in range(40))
    near_a = "日本語テキスト и русский текст " + " ".join(f"shared{i}" for i in range(30))
    rows = [
        {"doc_id": 1, "text": f"héllo wörld — caffè naïve {long_tail}"},
        {"doc_id": 2, "text": near_a},
        {"doc_id": 3, "text": f"plain ascii document {long_tail}"},
        {"doc_id": 4, "text": "ü"},  # single non-ASCII char, shorter than any window
        # near-dup of doc 2 differing by one token — the minhash/simhash
        # pipelines must band, verify, and cluster over non-ASCII shingles
        {"doc_id": 5, "text": near_a.replace("shared29", "changed29")},
        # astral-plane (surrogate-pair) codepoints: length/substring are
        # codepoint-based on BOTH engines (probed); gear index is cp % 256
        {"doc_id": 6, "text": f"emoji 😀🚀 prefix {long_tail}"},
    ]
    _write_documents(str(tmp_path / "documents.parquet"), rows)
    _write_events(str(tmp_path / "events.parquet"), [])
    return str(tmp_path)


def test_gear_cdc_agrees_on_non_ascii_text(spark, non_ascii_docs_dir):
    rows = assert_query_matches_oracle(spark, non_ascii_docs_dir, "docs_cdc_gear_chunks")
    # guard against vacuous agreement: the non-ASCII docs must still find
    # boundaries AFTER the non-ASCII prefix (a NULL-poisoned hash would
    # report 0 silently)
    by_id = {r[0]: r for r in rows}  # cols sorted: doc_id, first_boundary, n_boundaries
    assert by_id[1][2] > 0 and by_id[2][2] > 0


def test_md5_cdc_agrees_on_non_ascii_text(spark, non_ascii_docs_dir):
    assert_query_matches_oracle(spark, non_ascii_docs_dir, "docs_cdc_chunks")


def test_payload_features_agree_on_non_ascii_text(spark, non_ascii_docs_dir):
    """Engine features are over UTF-8 payload BYTES; the oracle must count
    bytes (octet_length + hex-pair checksum), not characters — chars ≠
    bytes on every doc in this fixture."""
    rows = assert_query_matches_oracle(spark, non_ascii_docs_dir, "docs_payload_features")
    # derive the sorted-column positions from the schema constant so new
    # feature columns can't silently shift these indices again (r15: two
    # added columns turned a hardcoded [5] into n_frames)
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        FEATURE_SCHEMA,
    )

    cols = sorted(f.split()[0] for f in FEATURE_SCHEMA.split(", "))
    by_id = {r[cols.index("doc_id")]: r for r in rows}
    assert by_id[4][cols.index("n_bytes")] == 2  # "ü": 1 char, 2 UTF-8 bytes


def test_text_family_agrees_on_non_ascii_docs(spark, non_ascii_docs_dir):
    """EVERY text-family query over the non-ASCII corpus — r3 only pinned
    the CDC pair and payload features; tokenize→minhash/simhash/lang-ID/
    quality paths route the same multi-byte text through lower/split/md5
    on both engines (md5 hashes UTF-8 bytes identically; \\s is the same
    ASCII class in Java and RE2 regex)."""
    for name in TEXT_FAMILY_QUERIES:
        assert_query_matches_oracle(spark, non_ascii_docs_dir, name)
    # guard against vacuous agreement: the planted non-ASCII near-dup pair
    # (docs 2/5) must actually survive banding + Jaccard verify + clustering
    pairs = QUERIES["docs_neardup_verified"].spark(spark, non_ascii_docs_dir).collect()
    assert any({r.doc_a, r.doc_b} == {2, 5} for r in pairs)


@pytest.fixture()
def degenerate_docs_dir(tmp_path):
    """Documents the driver corpus never contains: empty, whitespace-only,
    sub-shingle-length, all-stopword, mixed-whitespace — the degenerate
    shapes where tokenization/shingling/normalization semantics could
    silently diverge between the engines."""
    long_en = "the quick brown fox jumps over the lazy dog and then " * 4
    rows = [
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "   "},
        {"doc_id": 3, "text": "word"},
        {"doc_id": 4, "text": "the the the the"},
        {"doc_id": 5, "text": "tab\tseparated\nnewline text here"},
        {"doc_id": 6, "text": "a b"},
        {"doc_id": 7, "text": long_en},
        {"doc_id": 8, "text": long_en.upper().replace(" ", "  ")},  # exact dup mod formatting
    ]
    _write_documents(str(tmp_path / "documents.parquet"), rows)
    _write_events(str(tmp_path / "events.parquet"), [])
    return str(tmp_path)


TEXT_FAMILY_QUERIES = (
    "docs_lang_distribution",
    "docs_wordcount_top20",
    "docs_exact_dup_groups",
    "docs_neardup_verified",
    "docs_neardup_clusters",
    "docs_neardup_keepers",
    "docs_simhash_hamming_pairs",
    "docs_clean_corpus_pipeline",
    "docs_cdc_chunks",
    "docs_cdc_gear_chunks",
    "docs_payload_features",
    # r16 streamed ingest gate: the degenerate shapes hit the admission
    # filter (empty/whitespace/sub-shingle never enter the stores), the
    # intra-batch fp collapse, AND a cross-batch exact dup (docs 7/8
    # land in batches 1/2 — the later one must fall to the STORE filter
    # at Jaccard 1, not to the intra-batch collapse)
    "docs_doc_ingest_streamed",
)


@pytest.mark.parametrize("name", TEXT_FAMILY_QUERIES)
def test_text_family_agrees_on_degenerate_docs(spark, degenerate_docs_dir, name):
    assert_query_matches_oracle(spark, degenerate_docs_dir, name)


@pytest.fixture()
def degenerate_embeddings_dir(tmp_path):
    """Embedding shapes the generated corpus never contains: an all-zero
    vector (cosine 0/0 → NaN — both engines must agree on NaN production
    AND on where NaN sorts in top-k), exact duplicate vectors (cos == 1
    ties), and a tiny label so centroid/IVF groups get n=1."""
    import numpy as np

    rng = np.random.default_rng(42)
    vecs = [[float(x) for x in rng.standard_normal(64)] for _ in range(6)]
    rows = [
        (0, vecs[0], 0),
        (1, vecs[1], 0),
        (2, vecs[1], 0),      # exact duplicate of vec 1
        (3, [0.0] * 64, 1),   # zero vector: NaN cosine against anything
        (4, vecs[2], 1),
        (5, vecs[3], 2),      # singleton label
        (6, vecs[4], 0),
        (7, vecs[5], 2),
    ]
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    _write_events(str(tmp_path / "events.parquet"), [])
    _write_documents(str(tmp_path / "documents.parquet"), [{"doc_id": 1, "text": "x y z"}])
    return str(tmp_path)


EMB_FAMILY_QUERIES = (
    # emb_multi_query_topk retired r14 (folded into emb_ivf_batch_topk)
    "emb_ann_multitable_pairs",
    "emb_label_centroids_scale",
    "emb_ivf_batch_topk",
    # r16 streamed ingest gate: the zero vector must die at the non-zero-
    # norm admission on BOTH engines, and vecs 1/2 (bit-identical, in
    # batches 1/2) pin the cross-batch exact-dup path — the later one
    # falls to the store filter at cosine exactly 1
    "emb_ann_ingest_streamed",
)


@pytest.mark.parametrize("name", EMB_FAMILY_QUERIES)
def test_similarity_family_agrees_on_degenerate_vectors(spark, degenerate_embeddings_dir, name):
    # RETIRED rows keep their oracle pair runnable here without
    # consuming a driver-rotation slot (plans/registry.py r15)
    q = QUERIES.get(name) or RETIRED[name]
    sdf = q.spark(spark, degenerate_embeddings_dir).toPandas()
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{degenerate_embeddings_dir}/embeddings.parquet'"
        )
        odf = con.sql(q.oracle).df()
    finally:
        con.close()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), name
    srows = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in sdf.to_dict("records")), key=repr
    )
    orows = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in odf.to_dict("records")), key=repr
    )
    assert srows == orows, f"{name}: {srows[:3]} vs {orows[:3]}"


@pytest.fixture()
def dotted_key_events_dir(tmp_path):
    """Adversarial props: dotted first keys (a bare '$.' || key JSONPath
    would silently read the wrong thing, r3 ADVICE), plus NULL / malformed
    / array / scalar / non-numeric-value props — Spark's from_json NULLs
    them all, while unguarded DuckDB json functions return [] for arrays
    and RAISE on malformed input."""
    rows = [
        {"event_id": 1, "user_id": 1, "event_type": "click", "value": 1.0, "props": '{"a.b": 7, "k": 1}'},
        {"event_id": 2, "user_id": 2, "event_type": "click", "value": 2.0, "props": '{"a.b": 5}'},
        {"event_id": 3, "user_id": 3, "event_type": "view", "value": 3.0, "props": '{"k": 11, "x": 2}'},
        {"event_id": 4, "user_id": 4, "event_type": "view", "value": 4.0, "props": None},
        {"event_id": 5, "user_id": 5, "event_type": "view", "value": 5.0, "props": "not json at all"},
        {"event_id": 6, "user_id": 6, "event_type": "view", "value": 6.0, "props": "[1, 2, 3]"},
        {"event_id": 7, "user_id": 7, "event_type": "view", "value": 7.0, "props": "42"},
        {"event_id": 8, "user_id": 8, "event_type": "signup", "value": 8.0, "props": '{"k": "oops"}'},
        # numeric STRING k: struct parse yields NULL (no string→int coercion)
        {"event_id": 9, "user_id": 9, "event_type": "view", "value": 9.0, "props": '{"k": "7"}'},
        # json-null value: the map stays VALID (unlike a bad value)
        {"event_id": 10, "user_id": 10, "event_type": "view", "value": 10.0, "props": '{"k": null, "z": 4}'},
        # EMPTY json object: under Spark 4's default ANSI mode a bare
        # element_at on the empty map's keys RAISES — the engine must use
        # try_element_at and agree with the oracle's NULL first key/value
        {"event_id": 11, "user_id": 11, "event_type": "view", "value": 11.0, "props": "{}"},
    ]
    _write_events(str(tmp_path / "events.parquet"), rows)
    _write_documents(str(tmp_path / "documents.parquet"), [{"doc_id": 1, "text": "x y z"}])
    return str(tmp_path)


@pytest.fixture()
def null_key_events_dir(tmp_path):
    """NULL grouping/aggregation keys for the salted aggregation: a NULL
    event_type is still a GROUP (an inner join on the nullable key would
    silently drop it), and NULL user_id must NOT count as a distinct user
    (COUNT(DISTINCT) semantics)."""
    rows = [
        {"event_id": 1, "user_id": 1, "event_type": "click", "value": 1.0, "props": None},
        {"event_id": 2, "user_id": None, "event_type": "click", "value": 2.0, "props": None},
        {"event_id": 3, "user_id": 3, "event_type": None, "value": 3.0, "props": None},
        {"event_id": 4, "user_id": None, "event_type": None, "value": 4.0, "props": None},
        # a group whose ONLY users are NULL: cnt > 0, n_users = 0
        {"event_id": 5, "user_id": None, "event_type": "ghost", "value": 5.0, "props": None},
    ]
    _write_events(str(tmp_path / "events.parquet"), rows)
    _write_documents(str(tmp_path / "documents.parquet"), [{"doc_id": 1, "text": "x y z"}])
    return str(tmp_path)


def test_salted_counts_null_group_and_null_users(spark, null_key_events_dir):
    rows = assert_query_matches_oracle(
        spark, null_key_events_dir, "events_salted_type_counts"
    )
    # cols sorted = cnt, event_type, n_users
    by_type = {r[1]: (_uncanon_num(r[0]), _uncanon_num(r[2])) for r in rows}
    assert by_type[None] == (2, 1)  # NULL group kept; its one real user counted
    assert by_type["click"] == (2, 1)  # NULL user not a distinct user
    assert by_type["ghost"] == (1, 0)  # all-NULL-user group: present, 0 users


def _uncanon_num(v):
    """Nullable int aggregates canonize as float bit-hex (pandas promotes
    them to float64); map back to a number for assertions."""
    if isinstance(v, str) and len(v) == 16 and all(c in "0123456789abcdef" for c in v):
        return struct.unpack(">d", bytes.fromhex(v))[0]
    return v


def test_json_kpis_agree_on_adversarial_props(spark, dotted_key_events_dir):
    rows = assert_query_matches_oracle(spark, dotted_key_events_dir, "events_json_kpis")
    # the dotted-key group must actually sum the dotted values (7 + 5 = 12):
    # cols sorted = cnt, event_type, max_k, max_props, min_first_key, sum_first_val, sum_k
    click = next(r for r in rows if r[1] == "click")
    assert _uncanon_num(click[5]) == 12 and click[4] == "a.b"
    view = next(r for r in rows if r[1] == "view")
    assert view[0] == 8  # cnt counts ALL rows, junk + empty props included
    assert _uncanon_num(view[6]) == 11  # sum_k: only the integral k ("7"/null don't)
    assert _uncanon_num(view[3]) == 2  # max_props from the {"k": null, "z": 4} valid map


# ── empty-corpus blanket: every oracled query on zero-row tables ─────────

ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def empty_corpus_dir(tmp_path_factory):
    """Zero rows in every table, exact driver schemas (copied from the
    sf0.001 parquet footers).  The divergence classes this flushes out:
    global aggregates over nothing (one NULL row vs no row), grouping-set
    grand-total rows on empty input, NULL-propagating ratio arithmetic
    (q14-style 100*sum/sum), quantiles of an empty set, and any plan that
    ANSI-errors instead of returning empty."""
    d = tmp_path_factory.mktemp("empty_corpus")
    for t in ALL_TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


EMPTY_CORPUS_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", EMPTY_CORPUS_QUERIES)
def test_every_oracled_query_agrees_on_empty_corpus(spark, empty_corpus_dir, name):
    assert_query_matches_oracle(spark, empty_corpus_dir, name, tables=ALL_TABLES)


# ── boundary mini-TPC-H: rows ON every relational predicate edge ─────────


@pytest.fixture(scope="module")
def boundary_tpch_dir(tmp_path_factory):
    """A hand-built ~8-order corpus where ROWS SIT EXACTLY ON the
    boundaries the generated data only straddles by luck:

    * date edges: o_orderdate = 1998-03-15 (q3 `<` excludes), 1996-01-01 /
      1998-01-01 (q5 `>=`/`<` half-open), l_shipdate = 1998-09-01 (q1 `<=`
      includes), 1998-03-15 (q3 `>` excludes), 1997-09-01 / 1997-10-01
      (q14 half-open month);
    * q19 quantity bounds: PROMO 1 and 11 in, 11.5 / 12 out; ECONOMY 10
      and 20 in, 20.5 out; discount exactly 0.02 out of the `< 0.02` arm;
    * q17: part Brand#11/p4 lineitems {1, 1.5, 2, 25.5} ⇒ sum 30, count 4,
      so qty=1.5 lands EXACTLY on the cross-multiplied threshold
      (1.5·5·4 = 30, strict < excludes) while qty=1 is in;
    * price ties (three 100.00 orders in status F) for rank/dense_rank
      peers, argmax tie-break, and interpolated quantiles with exact
      binary fractions (100.25, 100.50);
    * customers covering every membership arm: c2 has F and P but no O
      (setop hit), c3 has no orders at all, c4 only O, a PROMO part p6
      with no lineitems (semi-join miss).
    """
    d = tmp_path_factory.mktemp("boundary_tpch")
    ts = lambda s: datetime.datetime.fromisoformat(s)

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA"], pa.string()),
    }), str(d / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["US", "JAPAN", "CHINA"], pa.string()),
        "n_regionkey": pa.array([0, 1, 1], pa.int32()),
    }), str(d / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, 6)], pa.string()),
        "c_nationkey": pa.array([0, 1, 2, 0, 1], pa.int32()),
        "c_acctbal": pa.array([10.0, -5.25, 0.0, 100.5, 7.75], pa.float64()),
        "c_mktsegment": pa.array(
            ["BUILDING", "AUTOMOBILE", "BUILDING", "MACHINERY", "BUILDING"],
            pa.string()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["Supplier#1", "Supplier#2"], pa.string()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([50.0, -1.5], pa.float64()),
    }), str(d / "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 6], pa.int64()),
        "p_name": pa.array([f"part {i}" for i in (1, 2, 3, 4, 6)], pa.string()),
        "p_brand": pa.array(
            ["Brand#11", "Brand#22", "Brand#33", "Brand#11", "Brand#66"],
            pa.string()),
        "p_type": pa.array(
            ["PROMO", "ECONOMY", "STANDARD", "PROMO", "PROMO"], pa.string()),
        "p_size": pa.array([39, 40, 45, 5, 10], pa.int32()),
        "p_retailprice": pa.array([100.0, 200.25, 300.5, 10.0, 1.0], pa.float64()),
    }), str(d / "part.parquet"))
    orders = [
        # (key, cust, status, totalprice, orderdate, priority)
        (100, 1, "O", 100.00, "1998-03-15", "1-URGENT"),   # q3 `<` edge: OUT
        (101, 1, "F", 100.00, "1998-03-14", "2-HIGH"),
        (102, 1, "F", 100.25, "1996-01-01", "3-MEDIUM"),
        (103, 2, "F", 200.00, "1998-01-01", "1-URGENT"),   # q5 `<` edge: OUT
        (104, 2, "P", 200.00, "1997-06-01", "2-HIGH"),
        (105, 4, "O", 300.00, "1997-01-01", "1-URGENT"),
        (106, 5, "F", 100.00, "1995-06-30", "3-MEDIUM"),
        (107, 2, "P", 100.50, "1996-01-01", "1-URGENT"),   # q5 `>=` edge: IN
    ]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        "o_orderstatus": pa.array([o[2] for o in orders], pa.string()),
        "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
        "o_orderdate": pa.array([ts(o[4]) for o in orders], pa.timestamp("ms")),
        "o_orderpriority": pa.array([o[5] for o in orders], pa.string()),
    }), str(d / "orders.parquet"))
    lines = [
        # (okey, pkey, skey, ln, qty, extprice, disc, tax, rf, ls, shipdate)
        (101, 1, 1, 1, 11.0, 110.25, 0.01, 0.02, "N", "O", "1998-03-16"),
        (100, 1, 1, 1, 1.0, 10.50, 0.00, 0.00, "N", "O", "1998-03-15"),
        (102, 2, 2, 1, 10.0, 100.00, 0.05, 0.01, "A", "F", "1998-09-01"),
        (103, 2, 2, 1, 20.0, 200.25, 0.01, 0.00, "R", "F", "1998-09-02"),
        (104, 3, 1, 1, 21.0, 210.00, 0.02, 0.03, "N", "O", "1997-08-31"),
        (105, 3, 2, 1, 5.0, 50.75, 0.01, 0.00, "N", "O", "1997-09-01"),
        (106, 1, 1, 1, 12.0, 120.00, 0.03, 0.01, "A", "F", "1997-10-01"),
        (104, 3, 2, 2, 7.0, 70.25, 0.01, 0.02, "N", "O", "1997-06-15"),
        (107, 1, 2, 1, 11.5, 115.50, 0.04, 0.00, "R", "F", "1996-02-01"),
        (104, 1, 2, 3, 3.0, 30.00, 0.00, 0.01, "N", "O", "1997-09-15"),
        (100, 4, 1, 2, 1.0, 10.00, 0.01, 0.00, "N", "O", "1998-01-01"),
        (100, 4, 1, 3, 1.5, 15.25, 0.00, 0.00, "N", "O", "1998-01-02"),
        (100, 4, 2, 4, 2.0, 20.00, 0.02, 0.01, "N", "O", "1998-01-03"),
        (100, 4, 2, 5, 25.5, 255.00, 0.01, 0.00, "N", "O", "1998-01-04"),
        (105, 2, 2, 2, 20.5, 205.25, 0.01, 0.02, "N", "O", "1997-01-15"),
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
        "l_partkey": pa.array([l[1] for l in lines], pa.int64()),
        "l_suppkey": pa.array([l[2] for l in lines], pa.int64()),
        "l_linenumber": pa.array([l[3] for l in lines], pa.int32()),
        "l_quantity": pa.array([l[4] for l in lines], pa.float64()),
        "l_extendedprice": pa.array([l[5] for l in lines], pa.float64()),
        "l_discount": pa.array([l[6] for l in lines], pa.float64()),
        "l_tax": pa.array([l[7] for l in lines], pa.float64()),
        "l_returnflag": pa.array([l[8] for l in lines], pa.string()),
        "l_linestatus": pa.array([l[9] for l in lines], pa.string()),
        "l_shipdate": pa.array([ts(l[10]) for l in lines], pa.timestamp("ms")),
    }), str(d / "lineitem.parquet"))
    for t in ("events", "documents", "embeddings"):
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


RELATIONAL_BOUNDARY_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    # r9 subquery battery: q4's quarter filter catches the 1997-01-01
    # `>=` edge (order 105 IN); q22's positive-balance average excludes
    # the exactly-0.00 balance (c3); q18/q21/q6 go empty on this corpus —
    # agreement on empty IS the edge for them (HAVING/EXISTS over nothing)
    "q4_late_order_priority",
    "q18_large_volume_customers",
    "q21_latest_shipper",
    "q22_dormant_high_balance",
    "q6_forecast_revenue",
    "q15_top_supplier",
    "rollup_order_stats",
    "grouping_analytics_order_stats",
    "pivot_status_by_priority",
    "unpivot_lineitem_measures",
    "setop_finished_partial_not_open",
    "semi_promo_parts_shipped",
    "anti_customers_no_open_orders",
    "window_functions_showcase",
    "scalar_function_showcase",
    "orders_price_quantiles",
)


@pytest.mark.parametrize("name", RELATIONAL_BOUNDARY_QUERIES)
def test_relational_family_agrees_on_boundary_rows(spark, boundary_tpch_dir, name):
    assert_query_matches_oracle(spark, boundary_tpch_dir, name, tables=ALL_TABLES)


def test_boundary_corpus_hits_the_edges(spark, boundary_tpch_dir):
    """Guard the fixture itself: the boundary rows must actually sit on
    both sides of each predicate, or the parametrized tests above prove
    nothing."""
    rows = assert_query_matches_oracle(
        spark, boundary_tpch_dir, "q17_small_quantity_revenue", tables=ALL_TABLES
    )
    by_brand = {r[1]: r for r in rows}  # cols sorted: n_small, p_brand, small_revenue
    # Brand#11 = p1 (qty 1 passes: 1·5·5 < 38.5) + p4 (only qty 1 of
    # {1, 1.5, 2, 25.5} passes; 1.5 lands exactly on the threshold)
    assert by_brand["Brand#11"][0] == 2, rows
    q19 = assert_query_matches_oracle(
        spark, boundary_tpch_dir, "q19_disjunctive_revenue", tables=ALL_TABLES
    )
    # PROMO in: qty 1, 11, 1, 1.5, 2, 3 (six) — 11.5, 12, 25.5 out;
    # ECONOMY in: qty 10, 20 — 20.5 out; size-≥40 disc<0.02 arm in: p3
    # lines disc 0.01 (qty 5, 7) plus the p2 qty-20.5 line disc 0.01 that
    # BOTH quantity bounds reject — disc exactly 0.02 out; the p2 qty-20
    # line satisfies ECONOMY and size arms at once but OR counts it once
    assert q19[0][0] == 11, q19  # cols sorted: n_lines, revenue
    setop = assert_query_matches_oracle(
        spark, boundary_tpch_dir, "setop_finished_partial_not_open", tables=ALL_TABLES
    )
    assert [r[0] for r in setop] == [2]  # only c2: F and P, never O


@pytest.fixture()
def unindexable_embeddings_dir(tmp_path):
    """Rows violating the learned-IVF indexable contract: a NaN component
    (would make DuckDB's BIGINT cast raise and leave Spark's argmin
    sentinel at -1), a NULL element, a ±inf component, and a short vector —
    plus clean rows.  Both engines must EXCLUDE the bad rows identically
    and still agree on the served top-k over the clean rest."""
    import numpy as np

    rng = np.random.default_rng(99)
    clean = [[float(x) for x in rng.standard_normal(64)] for _ in range(10)]
    nan_vec = [1.0] * 64
    nan_vec[7] = float("nan")
    inf_vec = [1.0] * 64
    inf_vec[3] = float("inf")
    null_vec = [1.0] * 64
    null_vec[5] = None
    rows = (
        [(i, clean[i], 0) for i in range(10)]
        + [
            (100, nan_vec, 1),
            (101, inf_vec, 1),
            (102, null_vec, 1),
            (103, [1.0] * 63, 1),  # wrong length
        ]
    )
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    _write_events(str(tmp_path / "events.parquet"), [])
    _write_documents(str(tmp_path / "documents.parquet"), [{"doc_id": 1, "text": "x y z"}])
    return str(tmp_path)


def test_learned_ivf_excludes_unindexable_rows_identically(
    spark, unindexable_embeddings_dir
):
    name = "emb_ivf_batch_topk"
    # RETIRED rows keep their oracle pair runnable here without
    # consuming a driver-rotation slot (plans/registry.py r15)
    q = QUERIES.get(name) or RETIRED[name]
    sdf = q.spark(spark, unindexable_embeddings_dir).toPandas()
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{unindexable_embeddings_dir}/embeddings.parquet'"
        )
        odf = con.sql(q.oracle).df()
    finally:
        con.close()
    # none of the contract-violating vec_ids may be served by either engine
    assert not ({100, 101, 102, 103} & set(sdf.vec_id)), sorted(sdf.vec_id)
    assert not ({100, 101, 102, 103} & set(odf.vec_id)), sorted(odf.vec_id)
    assert len(sdf) > 0  # the clean rows still serve
    cols = sorted(sdf.columns)
    srows = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in sdf.to_dict("records")), key=repr
    )
    orows = sorted(
        (tuple(_canon(r[c]) for c in cols) for r in odf.to_dict("records")), key=repr
    )
    assert srows == orows
