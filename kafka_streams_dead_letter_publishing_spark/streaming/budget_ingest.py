"""Budget-capped streaming ingest ([EXT]): the 24/7 form of the batch
mixture sampler (``operators/budget.py``) — accept arriving documents
until each source's token budget is exhausted, across micro-batches
("collect 10 B tokens of web and 3 B of code, then stop").

Per batch: read the tiny per-(batch, source) token-delta store to learn
what each source has already spent, derive the REMAINING budgets, and
admit this batch's rows through ``token_budget_sample`` with those
budgets (greedy md5-order within the batch, arrival order across
batches).  Survivors append to the corpus; one delta row per accepted
source appends to the totals store.

STATE & RECOVERY (same posture as ``ingest_pipeline.py``): state is
append-only parquet; nothing data-sized ever reaches the driver — the
totals store holds one row per (batch, source), read whole (#batches ×
#sources metadata rows; ``compact`` collapses it to #sources).  Budget
accounting is EXACTLY-ONCE: the delta row carries ``batch_id``, is
written LAST, and a replayed batch whose id is already recorded is
skipped entirely — so a crash between the corpus append and the delta
append replays to duplicate corpus rows (at-least-once; readers dedup on
id) but never double-counts a batch against the budget.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.budget import (
    token_budget_sample,
)


def _store_exists(spark: SparkSession, path: str) -> bool:
    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        _store_exists as probe,
    )

    return probe(spark, path)


class BudgetCappedIngest:
    """foreachBatch body: batch → token scoring → admit up to each
    source's remaining budget → append survivors + a per-source spent
    delta.  ``budgets`` maps group value → total token budget; groups
    absent from the mapping are never admitted."""

    def __init__(
        self,
        base_dir: str,
        budgets: Mapping[str, int],
        group_col: str = "source",
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.base_dir = base_dir
        self.corpus_path = f"{base_dir}/corpus"
        self.totals_path = f"{base_dir}/totals"
        self.budgets = dict(budgets)
        self.group_col = group_col
        self.id_col = id_col
        self.text_col = text_col

    def _spent_and_batches(self, spark: SparkSession) -> tuple[dict, set]:
        if not _store_exists(spark, self.totals_path):
            return {}, set()
        rows = spark.read.parquet(self.totals_path).collect()
        spent: dict = {}
        seen = set()
        for r in rows:
            spent[r["g"]] = spent.get(r["g"], 0) + r["tokens"]
            seen.add(r["batch_id"])
        return spent, seen

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from kafka_streams_dead_letter_publishing_spark.functions.text import (
            norm_text,
            tokens,
        )

        spark = batch.sparkSession
        spent, seen = self._spent_and_batches(spark)
        if batch_id in seen:
            return  # replay of a fully-recorded batch: exactly-once accounting
        remaining = {
            g: max(0, int(b) - int(spent.get(g, 0))) for g, b in self.budgets.items()
        }
        # persist barrier: the sampler makes two passes over the batch
        # (bucket-sum aggregate, then join+window), and tokenization is
        # the dominant per-row cost — score once (same reason
        # DocumentIngest stages its tokens).  NULL-text rows cannot be
        # token-counted and are never admitted.
        scored = (
            batch.withColumn(
                "_nt", F.size(tokens(norm_text(F.col(self.text_col)))).cast("long")
            )
            .filter(F.col("_nt").isNotNull())
            .persist()
        )
        try:
            accepted = token_budget_sample(
                scored, "_nt", remaining, id_col=self.id_col, group_col=self.group_col
            )
            # eager checkpoint: both writes below must see the SAME
            # admitted set even if a source file vanishes or an executor
            # is lost
            accepted = accepted.localCheckpoint(eager=True)
            accepted.drop("_nt", "running_tokens").write.mode("append").parquet(
                self.corpus_path
            )
            # delta store written LAST — the exactly-once gate
            deltas = (
                accepted.groupBy(F.col(self.group_col).alias("g"))
                .agg(F.sum("_nt").alias("tokens"))
                .withColumn("batch_id", F.lit(int(batch_id)))
            )
            deltas.write.mode("append").parquet(self.totals_path)
        finally:
            scored.unpersist()

    def spent(self) -> dict:
        """Current per-source token totals (driver-side metadata read)."""
        spark = SparkSession.getActiveSession()
        assert spark is not None
        return self._spent_and_batches(spark)[0]
