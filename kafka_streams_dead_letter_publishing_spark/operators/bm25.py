"""Exact-integer BM25 ranked retrieval over the documents corpus.

The operator the reference lacks and a training-data pipeline wants for
query-driven corpus selection (retrieve-then-filter, eval-set curation,
topic probes).  Classic BM25 is transcendental (ln in the IDF) and
float-summed — both cross-engine hash-unstable (libm last-bit drift;
shuffle-order-dependent double addition).  This implementation keeps the
RANKING function but makes every step exact integer arithmetic, the same
policy as operators/dsir.py (integer-ratio weights) and
operators/perplexity.py (floor-log2 via ``bin()``):

* **IDF** — the Lucene-shaped non-negative idf ``log(1 + (N-df+.5)/(df+.5))
  = log((2N+2)/(2df+1))`` is computed in base 2 with 10 fractional bits by
  linear mantissa interpolation::

      r    = (num * 1024) DIV den          -- >= 1024 since num >= den
      e    = length(bin(r)) - 11           -- floor(log2 r) - 10
      mant = r DIV (1 << e)                -- in [1024, 2048)
      idf_mb = e*1024 + mant - 1024        -- "millibits", exact BIGINT

  Monotone in num/den (exact rational compare feeding a monotone fixed-
  point map), identical in Spark SQL and DuckDB (integer DIV + bin()).
  Using log2 instead of ln is a constant positive factor — rank-neutral.

* **TF normalization** — with the standard k1=1.2, b=0.75 written as
  rationals (6/5, 3/4), ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
  multiplies out to ``22000*tf / (10000*tf + 3000 + 9*ratio_milli)``
  where ``ratio_milli = (1000*dl*N) DIV T`` quantizes dl/avgdl to milli
  units (documented rank-affecting quantization, same contract as DSIR's
  integer-ratio deviation from log-sum: deterministic and monotone, not
  bit-identical to float BM25).

* **Score** — each term's contribution ``(idf_mb * 22000 * tf) DIV
  (10000*tf + 3000 + 9*ratio_milli)`` is one BIGINT; the per-(query,doc)
  score is a SUM of BIGINTs — order-independent, safe to shuffle.

Scale shape (the 100 TB plan): the query-term table broadcasts into the
exploded token scan (corpus never shuffles on a token key), tf is a
partial-agg groupBy keyed by (query, term, doc), document frequencies
partial-aggregate down to <= |query terms| rows and broadcast back, and
the final ranking is the repo's two-phase top-k (partition-local window
on (pid, query_id), global window over the <= P*k survivors).  (N, T)
corpus stats are one metadata-sized driver row folded in as literals —
the perplexity module's V-scalar pattern.

Magnitude audit (BIGINT overflow): idf_mb <= ~64*1024; 22000*tf with
tf <= dl <= ~1e6 gives 2.2e10; product <= 1.5e15 << 2^63.  ratio_milli
uses 1000*dl*N which at N=1e12 docs and dl=1e6 would overflow — so the
ratio is computed as 1000*dl DIV avg_dl_int with avg-first rounding on
the giant-corpus path.  The cutover keys on the ACTUAL overflow bound
``1000 * max(dl) * N >= 2^62`` (one extra MAX scalar from the stats
aggregate), not on total tokens: a skewed corpus — few docs, one huge
one — overflows long before T does (r9 advisory), while a uniform short
corpus with astronomic doc COUNT was being degraded needlessly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import norm_text, tokens

#: (query_id, terms) probes used by the registry row — drawn from the
#: synthetic documents' vocabulary so every query matches a real subset.
DEFAULT_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("spark", "join", "broadcast")),
    (1, ("window", "agg", "stream")),
    (2, ("hash", "table", "scan")),
)

DEFAULT_TOPK = 10

# giant-corpus cutover for the dl/avgdl quantization (see module doc):
# precise path while 1000 * max(dl) * n_docs stays under 2^62 (a 2x
# margin below the BIGINT line, exact in driver-side Python ints)
_RATIO_GUARD = 1 << 62


def _ratio_sql(n_docs: int, total_t: int, max_dl: int) -> str:
    """Spark-SQL fragment for ratio_milli = quantized 1000*dl/avgdl,
    choosing the precise or avg-first form by the exact overflow bound."""
    if 1000 * max_dl * n_docs >= _RATIO_GUARD:
        return f"(1000 * dl) DIV {total_t // n_docs}"
    return f"(1000 * dl * {n_docs}) DIV {total_t}"


def qlog2_mb_sql(num_sql: str, den_sql: str) -> str:
    """Spark-SQL fragment: quantized log2((num)/(den)) in millibits (10
    fractional bits, linear mantissa interpolation) for BIGINT-valued
    fragments with num >= den >= 1.  Exact integer ops only."""
    r = f"((({num_sql}) * 1024) DIV ({den_sql}))"
    e = f"(length(bin({r})) - 11)"
    mant = f"({r} DIV shiftleft(CAST(1 AS BIGINT), {e}))"
    return f"(({e}) * 1024 + {mant} - 1024)"


def qlog2_mb_duck_sql(num_sql: str, den_sql: str) -> str:
    """DuckDB spelling of :func:`qlog2_mb_sql` (// division, << shift)."""
    r = f"((({num_sql}) * 1024) // ({den_sql}))"
    e = f"(length(bin({r})) - 11)"
    mant = f"({r} // (CAST(1 AS BIGINT) << ({e})))"
    return f"(({e}) * 1024 + {mant} - 1024)"


def _contrib_sql(div: str) -> str:
    """The per-term integer score contribution; ``div`` is the dialect's
    integer-division operator (``DIV`` or ``//``)."""
    return (
        f"((idf_mb * 22000 * tf) {div} "
        f"(10000 * tf + 3000 + 9 * ratio_milli))"
    )


def query_terms_df(spark, queries: Sequence[tuple[int, Sequence[str]]]) -> DataFrame:
    rows = [(int(qid), t) for qid, terms in queries for t in terms]
    return spark.createDataFrame(rows, "query_id bigint, term string")


_EMPTY_RESULT_SCHEMA = (
    "query_id bigint, doc_id bigint, score_mb bigint, n_terms bigint, rnk int"
)


def _score_topk(
    tf: DataFrame, n_docs: int, total_t: int, max_dl: int, k_top: int
) -> DataFrame:
    """Shared scoring tail of the full-scan and served paths: document
    frequencies from the (query_id, term, doc_id, dl, tf) frame (exact —
    a term's postings are complete in ``tf`` on both paths), quantized
    idf, integer contributions, and the repo's two-phase top-k.

    ``tf`` is persisted (r18): the frame feeds BOTH the document-
    frequency aggregate and the scoring join, and without a stage
    boundary the planner recomputed the whole upstream subtree — on the
    served path, a second bucket-pruned postings scan + epoch gate +
    query join per serve (visible as two concurrent scan jobs in the
    event log; at scale that is 2x the serving read).  persist, not
    localCheckpoint, so the cached relation keeps the pruned scan in
    the executed plan (the PartitionFilters serving contract stays
    plan-visible).  No explicit unpersist: the cache is query-matched
    postings only — bounded by the query batch, not the corpus — and
    the ContextCleaner reclaims it with the frame."""
    tf = tf.persist()
    dfreq = (
        tf.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("dfc"))
        .withColumn(
            "idf_mb",
            F.expr(qlog2_mb_sql(f"{2 * n_docs} + 2", "2 * dfc + 1")).cast("long"),
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq.select("term", "idf_mb")), "term")
        .withColumn(
            "ratio_milli", F.expr(_ratio_sql(n_docs, total_t, max_dl)).cast("long")
        )
        .withColumn("contrib", F.expr(_contrib_sql("DIV")).cast("long"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").cast("long").alias("score_mb"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )
    # two-phase top-k: local cut per (physical partition, query), exact
    # rank over the <= P*k survivors (the pq.py serving shape)
    staged = scored.withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "query_id").orderBy(
        F.desc("score_mb"), F.asc("doc_id")
    )
    local = (
        staged.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= k_top)
        .drop("pid", "rn")
    )
    w_global = Window.partitionBy("query_id").orderBy(
        F.desc("score_mb"), F.asc("doc_id")
    )
    return local.withColumn(
        "rnk", F.row_number().over(w_global)
    ).filter(F.col("rnk") <= k_top)


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[tuple[int, Sequence[str]]] = DEFAULT_QUERIES,
    k_top: int = DEFAULT_TOPK,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k_top`` documents per query by exact-integer BM25.

    Returns (query_id, doc_id, score_mb, n_terms, rnk) — ``score_mb`` is
    the millibit-scaled BIGINT score, ``n_terms`` the number of distinct
    query terms the doc matched, ``rnk`` 1-based with the unique doc-id
    tie-break.  Documents matching no query term never appear."""
    spark = docs.sparkSession
    toks_df = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(norm_text(F.col(text_col))).alias("_t"),
    )
    lens = toks_df.select("doc_id", F.size("_t").cast("long").alias("dl"))
    stats = lens.agg(
        F.sum("dl").cast("long").alias("tt"),
        F.count(F.lit(1)).alias("nn"),
        F.max("dl").alias("mx"),
    ).first()
    total_t, n_docs = stats.tt, stats.nn
    if not n_docs or not total_t:
        return spark.createDataFrame([], _EMPTY_RESULT_SCHEMA)

    qdf = query_terms_df(spark, queries)
    postings = toks_df.select(
        "doc_id", F.size("_t").cast("long").alias("dl"), F.explode("_t").alias("term")
    )
    tf = (
        postings.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return _score_topk(tf, n_docs, total_t, stats.mx, k_top)


def bm25_oracle_sql(
    toks_sql: str,
    queries: Sequence[tuple[int, Sequence[str]]] = DEFAULT_QUERIES,
    k_top: int = DEFAULT_TOPK,
) -> str:
    """DuckDB replay of :func:`bm25_topk` — same integer arithmetic,
    dialect-spelled (``//``, ``<<``, unnest).  ``toks_sql`` is the token
    list fragment over the ``documents`` view."""
    vals = ", ".join(
        f"({int(qid)}, '{t}')" for qid, terms in queries for t in terms
    )
    idf = qlog2_mb_duck_sql("2 * nn + 2", "2 * dfc + 1")
    return f"""
    WITH toks AS (SELECT doc_id, {toks_sql} AS t FROM documents),
    lens AS (SELECT doc_id, len(t) AS dl FROM toks),
    stats AS (SELECT SUM(dl) AS tt, COUNT(*) AS nn, MAX(dl) AS mx FROM lens),
    q(query_id, term) AS (VALUES {vals}),
    words AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (
        SELECT q.query_id, w.term, w.doc_id, COUNT(*) AS tf
        FROM words w JOIN q ON q.term = w.term
        GROUP BY 1, 2, 3
    ),
    idf AS (
        SELECT term, {idf} AS idf_mb
        FROM (SELECT term, COUNT(DISTINCT doc_id) AS dfc FROM tf GROUP BY 1),
             stats
    ),
    scored AS (
        SELECT query_id, tf.doc_id,
               CAST(SUM({_contrib_sql('//')}) AS BIGINT) AS score_mb,
               COUNT(*) AS n_terms
        FROM (
            SELECT tf.*, idf_mb,
                   -- cutover on the exact overflow bound (HUGEINT-safe
                   -- compare; Spark evaluates the same bound driver-side
                   -- in Python ints)
                   CASE WHEN 1000 * CAST(mx AS HUGEINT) * nn >= {_RATIO_GUARD}
                        THEN (1000 * dl) // (tt // nn)
                        ELSE (1000 * dl * nn) // tt END AS ratio_milli
            FROM tf JOIN idf USING (term)
            JOIN lens ON lens.doc_id = tf.doc_id
            CROSS JOIN stats
        ) tf
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score_mb, CAST(n_terms AS BIGINT) AS n_terms,
           CAST(rnk AS INT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score_mb DESC, doc_id
        ) AS rnk
        FROM scored
    )
    WHERE rnk <= {k_top}
    """


# ── persisted postings index + partition-pruned serving ──────────────────
#
# The IVF shape for text: one offline pass writes the inverted postings
# partitioned by a hash bucket of the term; serving a query batch scans
# ONLY the buckets its terms hash to (PartitionFilters at the parquet
# scan — the same pruning contract operators/kmeans.ivf_search_batch pins
# for vectors).  Scoring replays bm25_topk's integer arithmetic from the
# stored (tf, dl) postings + the persisted (N, T) stats row, so a served
# batch is row-for-row identical to the full-scan operator (test-pinned).

N_TERM_BUCKETS = 64


def _term_bucket(term: Column, n_buckets: int = N_TERM_BUCKETS) -> Column:
    """Deterministic bucket: first 8 md5 hex chars mod n_buckets (the
    md5-prefix routing used by every store in the repo — no engine hash)."""
    return F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long") % n_buckets


def _py_term_bucket(term: str, n_buckets: int = N_TERM_BUCKETS) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _store_exists(spark, path: str) -> bool:
    """True iff ``path`` holds at least one data file — the Hadoop
    FileSystem probe (streaming/ingest_pipeline.py's contract: a
    driver-local listdir would silently disengage on hdfs:// / s3a://)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            return True
    return False


def _batch_postings(
    docs: DataFrame, text_col: str, id_col: str, n_buckets: int, epoch: int,
    pin: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(postings, stats) frames for one document set, both stamped with
    ``epoch``.  Each materialization tokenizes once; the postings
    shuffle keys on (term, doc) — tf partial-aggregates map-side.

    ``pin=True`` localCheckpoints the tokenized frame eagerly, so the
    postings write and the stats row come from ONE materialization of
    the input — required on the append path, where a source with
    non-stable ordering could otherwise make the committed stats
    disagree with the written postings (and it saves the second
    tokenize pass).  One-shot index builds from deterministic parquet
    reads skip the pin: checkpointing a whole tokenized corpus to local
    disk is the wrong trade there."""
    toks_df = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(norm_text(F.col(text_col))).alias("_t"),
    )
    if pin:
        toks_df = toks_df.localCheckpoint(eager=True)
    postings = (
        toks_df.select(
            "doc_id",
            F.size("_t").cast("long").alias("dl"),
            F.explode("_t").alias("term"),
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .withColumn("epoch", F.lit(epoch).cast("long"))
    )
    lens = toks_df.select(F.size("_t").cast("long").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        F.coalesce(F.max("dl"), F.lit(0)).cast("long").alias("max_dl"),
    ).withColumn("epoch", F.lit(epoch).cast("long"))
    return postings, stats


def bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TERM_BUCKETS,
) -> None:
    """Write the postings index: ``{path}/postings`` partitioned by
    ``bucket`` with rows (term, doc_id, tf, dl, epoch), and
    ``{path}/stats`` with one RUNNING-TOTAL row per epoch
    (n_docs, total_tokens, max_dl, epoch) — the one-shot build is epoch 0.
    Stats are written LAST (the completion gate: serving fail-closes on a
    half-written index because the stats row is missing, and on a
    half-APPENDED index because orphan postings epochs have no stats row
    and the epoch-SET gate filters them out — see :func:`bm25_append`)."""
    postings, stats = _batch_postings(docs, text_col, id_col, n_buckets, epoch=0)
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def bm25_append(
    batch_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_TERM_BUCKETS,
) -> int:
    """Incremental BM25 ingest: append a micro-batch's postings to the
    persisted index and advance the stats epoch — the ``ivf_append`` /
    ``pq_append`` twin for the text-retrieval store, so a streaming
    corpus keeps a servable BM25 index growing without a rebuild.
    Returns the index's current epoch.

    Unlike the vector stores, naive appends are WRONG here: scoring
    depends on global (N, sum dl, max dl), so each append writes a new
    RUNNING-TOTAL stats row (associative merges — base + batch, exactly
    the CMS cell-merge contract), and the batch's postings carry the
    same epoch.  Write order is postings FIRST, stats LAST: a crash
    between the two leaves orphan postings with no matching stats row,
    and ``bm25_serve`` scans only epochs that HAVE a stats row (epoch-SET
    gate, not a threshold) — it keeps serving the last COMPLETE snapshot
    (postings and the stats they were scored against always agree; the
    orphans are reclaimed by :func:`bm25_compact`).  The new epoch is
    allocated ABOVE both the newest stats epoch and any epoch already
    present in the postings, so a crash-then-retry never reuses an
    orphan's epoch — with a threshold gate a retry at the orphan's
    epoch would make the orphan's tf rows servable alongside the
    retry's, double-counting the retried docs' scores while the stats
    row counts them once.  Bootstrapping on an empty path is epoch 0,
    identical to :func:`bm25_index` on the same batch (test-pinned).

    Single-writer contract (same as every store in the repo): appends
    come from a serialized ``foreachBatch`` body, never concurrently.
    Appended docs are NEW docs — re-sending a doc_id double-counts it,
    exactly as it would in the vector stores."""
    spark = batch_docs.sparkSession
    if _store_exists(spark, f"{path}/stats"):
        base = (
            spark.read.parquet(f"{path}/stats")
            .orderBy(F.desc("epoch"))
            .first()
        )
        base_n, base_t = base.n_docs, base.total_tokens
        base_mx, epoch = base.max_dl, base.epoch
    else:
        base_n = base_t = base_mx = 0
        epoch = -1
    # never land on an orphan's epoch: a crashed prior append may have
    # left postings ABOVE the newest stats epoch (parquet footer max —
    # a metadata read, not a corpus scan)
    new_epoch = epoch + 1
    if _store_exists(spark, f"{path}/postings"):
        omax = (
            spark.read.parquet(f"{path}/postings")
            .agg(F.max("epoch"))
            .first()[0]
        )
        if omax is not None and omax >= new_epoch:
            new_epoch = omax + 1
    postings, stats = _batch_postings(
        batch_docs, text_col, id_col, n_buckets, epoch=new_epoch, pin=True
    )
    srow = stats.first()
    if not srow.n_docs:
        return epoch  # empty batch: no postings, no epoch advance
    postings.write.mode("append").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    merged = spark.createDataFrame(
        [
            (
                base_n + srow.n_docs,
                base_t + srow.total_tokens,
                max(base_mx, srow.max_dl),
                new_epoch,
            )
        ],
        "n_docs bigint, total_tokens bigint, max_dl bigint, epoch bigint",
    )
    merged.write.mode("append").parquet(f"{path}/stats")
    return new_epoch


def bm25_compact(spark, src_path: str, dst_path: str) -> None:
    """Compact a streamed-into BM25 index: every append adds files per
    touched bucket, so a long-lived ingest accumulates small files (the
    ``ivf_compact`` problem).  Rewrites the postings whose epoch has a
    stats row (epoch-SET gate — orphans from a crashed append are
    dropped, they were never servable) with one shuffle on the bucket
    partition column, re-stamps them all to the newest stats epoch,
    collapses the stats history to its newest row, and writes to a NEW
    path — swap by repoint, never in place, so a concurrent reader
    always sees a complete index.  Served results are preserved
    row-for-row (test-pinned)."""
    stats_df = spark.read.parquet(f"{src_path}/stats")
    srow = stats_df.orderBy(F.desc("epoch")).first()
    spark.read.parquet(f"{src_path}/postings").join(
        F.broadcast(stats_df.select("epoch").distinct()), "epoch", "left_semi"
    ).withColumn(
        "epoch", F.lit(srow.epoch).cast("long")
    ).repartition("bucket").write.mode("errorifexists").partitionBy(
        "bucket"
    ).parquet(f"{dst_path}/postings")
    spark.createDataFrame(
        [(srow.n_docs, srow.total_tokens, srow.max_dl, srow.epoch)],
        "n_docs bigint, total_tokens bigint, max_dl bigint, epoch bigint",
    ).write.mode("errorifexists").parquet(f"{dst_path}/stats")


def bm25_serve(
    spark,
    path: str,
    queries: Sequence[tuple[int, Sequence[str]]] = DEFAULT_QUERIES,
    k_top: int = DEFAULT_TOPK,
    n_buckets: int = N_TERM_BUCKETS,
) -> DataFrame:
    """Serve a query batch from the persisted index, scanning only the
    term buckets the batch needs (partition-pruned IN-filter on
    ``bucket``) and only the postings epochs that HAVE a stats row
    (epoch-SET broadcast semi-join — orphan postings from a crashed
    append are invisible even if a later retry allocated past them, so
    a served snapshot's postings and global stats always agree;
    fail-closed, see :func:`bm25_append`).  Row-for-row identical to
    :func:`bm25_topk` on the same corpus — document frequencies are
    exact because a term's postings live entirely in its bucket."""
    stats_df = spark.read.parquet(f"{path}/stats")
    srow = stats_df.orderBy(F.desc("epoch")).first()
    if srow is None:
        raise ValueError(
            f"bm25_serve: {path}/stats holds no rows — the index build "
            "never completed (stats are the completion gate); rebuild "
            "with bm25_index or re-run the failed bm25_append"
        )
    n_docs, total_t = srow.n_docs, srow.total_tokens
    if not n_docs or not total_t:
        return spark.createDataFrame([], _EMPTY_RESULT_SCHEMA)
    needed = sorted(
        {_py_term_bucket(t, n_buckets) for _, terms in queries for t in terms}
    )
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(needed))
        .join(
            F.broadcast(stats_df.select("epoch").distinct()),
            "epoch",
            "left_semi",
        )
    )
    qdf = query_terms_df(spark, queries)
    tf = postings.join(F.broadcast(qdf), "term").select(
        "query_id", "term", "doc_id", "dl", "tf"
    )
    return _score_topk(tf, n_docs, total_t, srow.max_dl, k_top)
