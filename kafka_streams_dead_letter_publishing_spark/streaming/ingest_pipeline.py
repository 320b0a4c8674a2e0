"""Self-growing deduped ingest pipelines ([EXT]): the composed production
shape a training-data pipeline runs 24/7 — each micro-batch is deduped
against everything ALREADY ACCEPTED (and greedily within itself), and the
survivors extend the same on-disk state the next batch dedups against.

Two twins over the same pattern:

* :class:`EmbeddingIngest` — cosine near-dup reject (``operators.
  ann_filter``) against a growing sign-LSH bucket store, survivors
  appended BOTH to the bucket/vector stores and to a partitioned learned-
  IVF index (``operators.kmeans.ivf_append``), so the deduped corpus is
  immediately servable (``ivf_search_batch``).
* :class:`DocumentIngest` — Jaccard near-dup reject (``operators.
  neardup_filter``) against a growing band/shingle store, survivors
  appended to the corpus sink.

State is plain parquet appended per batch — no driver-side accumulation,
no unbounded executor state; restart-safety comes from the streaming
checkpoint exactly like ``streaming/runner.py`` (at-least-once: a replayed
batch re-appends rows it already appended; readers dedup on id, the same
duplicate posture the reference accepts — ``README.md:31``).

KEEPER SEMANTICS: first-accepted wins.  ACROSS batches the keeper of a
dup group is whichever member ARRIVED first (stream order, not id order —
exactly what online dedup means); WITHIN one micro-batch, ties are broken
greedily by id (a row is dropped iff some lower-id batch row is similar —
identical to processing the batch's rows one at a time in id order).  A
full transitive-closure keeper pass is the batch registry's
``docs_neardup_keepers``; at ingest time the chain case is rare and the
greedy rule is one candidate join, not an iterative CC.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
    N_TABLES,
    PLANES_PER_TABLE,
    dot,
    lsh_table_keys_int,
)
from kafka_streams_dead_letter_publishing_spark.functions.text import (
    band_keys_from_minhash_fast,
    minhash_array_fast,
    norm_text,
    shingles,
    tokens,
)
from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
    AnnIndex,
    ann_filter,
)
from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
    indexable,
    ivf_append,
)
from kafka_streams_dead_letter_publishing_spark.operators.neardup_filter import (
    NeardupIndex,
    neardup_filter,
)


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        not n.startswith(("_", ".")) for n in os.listdir(path)
    )


class EmbeddingIngest:
    """foreachBatch body: batch → reject near-dups of accepted vectors →
    greedy intra-batch dedup → append survivors to (buckets, vectors)
    stores and the partitioned IVF index.

    ``centroids_fixed`` are the FROZEN microunit k-means centroids the IVF
    index was built with (``kmeans_fit_quantized``); refitting on drifted
    data is a rebuild into a new base_dir, never an in-place mutation —
    the same contract as :func:`operators.kmeans.ivf_append`.
    """

    def __init__(
        self,
        base_dir: str,
        centroids_fixed: list[list[int]],
        min_cos: float = 0.9,
        n_tables: int = N_TABLES,
        planes_per_table: int = PLANES_PER_TABLE,
        id_col: str = "vec_id",
    ) -> None:
        self.buckets_path = f"{base_dir}/buckets"
        self.vectors_path = f"{base_dir}/vectors"
        self.ivf_path = f"{base_dir}/ivf"
        self.centroids_fixed = centroids_fixed
        self.min_cos = min_cos
        self.n_tables = n_tables
        self.planes_per_table = planes_per_table
        self.id_col = id_col

    def _staged(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col).alias("ref_id"),
            F.col("embedding").alias("ref_emb"),
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("ref_nrm"),
        ).filter(F.col("ref_nrm") > 0)

    def _keys(self, staged: DataFrame) -> DataFrame:
        return staged.select(
            "ref_id",
            F.explode(
                lsh_table_keys_int(
                    F.col("ref_emb"), self.n_tables, self.planes_per_table
                )
            ).alias("bk"),
        ).select("bk", "ref_id")

    def _intra_batch_dedup(self, batch: DataFrame) -> DataFrame:
        """Greedy by id: drop a row iff a LOWER-id batch row is cosine-
        similar — one candidate equi-join + exact verify, no iteration."""
        staged = self._staged(batch)
        keys = self._keys(staged)
        cands = (
            keys.alias("a")
            .join(keys.alias("b"), "bk")
            .filter(F.col("a.ref_id") < F.col("b.ref_id"))
            .select(F.col("a.ref_id").alias("va"), F.col("b.ref_id").alias("vb"))
            .distinct()
        )
        a = staged.select(
            F.col("ref_id").alias("va"),
            F.col("ref_emb").alias("ea"),
            F.col("ref_nrm").alias("na"),
        )
        b = staged.select(
            F.col("ref_id").alias("vb"),
            F.col("ref_emb").alias("eb"),
            F.col("ref_nrm").alias("nb"),
        )
        drop = (
            cands.join(a, "va")
            .join(b, "vb")
            .select(
                "vb",
                F.try_divide(
                    dot(F.col("ea"), F.col("eb")), F.col("na") * F.col("nb")
                ).alias("cos"),
            )
            .filter(F.col("cos") >= F.lit(self.min_cos))
            .select("vb")
            .distinct()
            .withColumnRenamed("vb", self.id_col)
        )
        return batch.join(drop, self.id_col, "left_anti")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        dim = len(self.centroids_fixed[0])
        batch = batch.filter(indexable(F.col("embedding"), dim)).persist()
        try:
            if _exists(self.buckets_path):
                index = AnnIndex(
                    buckets=spark.read.parquet(self.buckets_path),
                    vectors=spark.read.parquet(self.vectors_path),
                    n_tables=self.n_tables,
                    planes_per_table=self.planes_per_table,
                )
                kept = ann_filter(
                    batch, index, id_col=self.id_col, min_cos=self.min_cos
                )
            else:
                kept = batch
            # localCheckpoint (eager), NOT persist: the three appends below
            # write to paths that kept's LINEAGE reads (ann_filter scans the
            # bucket/vector stores) — a cache miss during append #3 would
            # recompute kept against the files appends #1-2 just added, and
            # the batch's own rows would self-match and vanish from the IVF
            # index (observed).  Checkpointing materializes kept and CUTS
            # the lineage, so no later action can re-read the stores.
            kept = self._intra_batch_dedup(kept).localCheckpoint(eager=True)
            staged = self._staged(kept)
            self._keys(staged).write.mode("append").parquet(self.buckets_path)
            staged.write.mode("append").parquet(self.vectors_path)
            ivf_append(
                kept, self.centroids_fixed, self.ivf_path, id_col=self.id_col
            )
        finally:
            batch.unpersist()


class DocumentIngest:
    """foreachBatch body: batch → reject Jaccard near-dups of accepted
    docs → greedy intra-batch dedup → append survivors to the corpus sink
    and the (bands, shingles) stores the next batch dedups against."""

    def __init__(
        self,
        base_dir: str,
        threshold_pct: int = 60,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.bands_path = f"{base_dir}/bands"
        self.shingles_path = f"{base_dir}/shingles"
        self.corpus_path = f"{base_dir}/corpus"
        self.threshold_pct = threshold_pct
        self.id_col = id_col
        self.text_col = text_col

    def _staged(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col).alias("ref_id"),
            tokens(norm_text(F.col(self.text_col))).alias("toks"),
        ).select("ref_id", shingles(F.col("toks")).alias("ref_sh"))

    def _bands(self, staged: DataFrame) -> DataFrame:
        return (
            staged.select(
                "ref_id",
                F.size("ref_sh").alias("n_sh"),
                minhash_array_fast(F.col("ref_sh")).alias("mh"),
            )
            .select(
                "ref_id",
                F.explode(
                    band_keys_from_minhash_fast(F.col("mh"), F.col("n_sh"))
                ).alias("bk"),
            )
            .select("bk", "ref_id")
        )

    def _intra_batch_dedup(self, batch: DataFrame) -> DataFrame:
        staged = self._staged(batch)
        keys = self._bands(staged)
        cands = (
            keys.alias("a")
            .join(keys.alias("b"), "bk")
            .filter(F.col("a.ref_id") < F.col("b.ref_id"))
            .select(F.col("a.ref_id").alias("da"), F.col("b.ref_id").alias("db"))
            .distinct()
        )
        a = staged.select(F.col("ref_id").alias("da"), F.col("ref_sh").alias("sha"))
        b = staged.select(F.col("ref_id").alias("db"), F.col("ref_sh").alias("shb"))
        n_common = F.size(F.array_intersect("sha", "shb"))
        drop = (
            cands.join(a, "da")
            .join(b, "db")
            .select(
                "db",
                n_common.alias("nc"),
                (F.size("sha") + F.size("shb")).alias("nab"),
            )
            .filter(
                F.col("nc") * 100 >= (F.col("nab") - F.col("nc")) * self.threshold_pct
            )
            .select("db")
            .distinct()
            .withColumnRenamed("db", self.id_col)
        )
        return batch.join(drop, self.id_col, "left_anti")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            if _exists(self.bands_path):
                index = NeardupIndex(
                    bands=spark.read.parquet(self.bands_path),
                    shingles=spark.read.parquet(self.shingles_path),
                )
                kept = neardup_filter(
                    batch,
                    index,
                    id_col=self.id_col,
                    text_col=self.text_col,
                    threshold_pct=self.threshold_pct,
                )
            else:
                kept = batch
            # eager localCheckpoint for the same reason as EmbeddingIngest:
            # the appends write to the very stores kept's lineage reads
            kept = self._intra_batch_dedup(kept).localCheckpoint(eager=True)
            staged = self._staged(kept)
            self._bands(staged).write.mode("append").parquet(self.bands_path)
            staged.write.mode("append").parquet(self.shingles_path)
            kept.write.mode("append").parquet(self.corpus_path)
        finally:
            batch.unpersist()
