"""Bucketed co-located joins (SURVEY §4.3 / the assignment's 100 TB
posture: "use bucketing for co-located joins").  Writing both join sides
bucketed by the join key lets the sort-merge join read them shuffle-free —
the layout trick that removes the dominant exchange from repeated fact-fact
joins at scale."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table

SMOKE_SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    suffix = uuid.uuid4().hex[:8]
    orders_t, li_t = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    try:
        load_table(spark, SMOKE_SF, "orders").write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable(orders_t)
        load_table(spark, SMOKE_SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable(li_t)

        # at sf0.001 the optimizer would broadcast these tiny tables, which
        # bypasses the bucketed path entirely; a 100 TB fact-fact join can't
        # broadcast, so pin the scenario by disabling auto-broadcast
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                spark.table(li_t)
                .join(spark.table(orders_t), F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located: the join must not introduce a shuffle — the only
            # exchange allowed is the one feeding the final aggregation
            assert "SortMergeJoin" in plan, plan[:500]
            assert "Bucketed: true" in plan
            assert "Exchange hashpartitioning(l_orderkey" not in plan
            assert "Exchange hashpartitioning(o_orderkey" not in plan
            result = {(r.o_orderstatus, r.n) for r in joined.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # and the result is correct vs the plain-parquet join
        expected = {
            (r.o_orderstatus, r.n)
            for r in load_table(spark, SMOKE_SF, "lineitem")
            .join(
                load_table(spark, SMOKE_SF, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert result == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
        spark.sql(f"DROP TABLE IF EXISTS {li_t}")
