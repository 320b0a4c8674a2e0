"""File-format source/sink coverage (SURVEY §2.2: parquet/CSV/JSON/ORC are
free via Spark built-ins — pinned here so the claim is tested, with the
round-trip caveats each text format carries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table

SMOKE_SF = "/root/testdata/sf0.001"


def _sample(spark):
    return (
        load_table(spark, SMOKE_SF, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


def test_csv_round_trip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "csv")
    df.write.option("header", "true").csv(p)
    back = spark.read.option("header", "true").schema(df.schema).csv(p)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_json_round_trip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "json")
    df.write.json(p)
    back = spark.read.schema(df.schema).json(p)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_orc_round_trip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "orc")
    df.write.orc(p)
    back = spark.read.orc(p)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_partitioned_parquet_prunes_partitions(spark, tmp_path):
    """Partitioned writes + partition pruning: the scan must touch only the
    selected partition directory (the 100 TB layout primitive)."""
    df = _sample(spark)
    p = str(tmp_path / "part")
    df.write.partitionBy("o_orderstatus").parquet(p)
    back = spark.read.parquet(p).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0]
    expected = {t for t in _sorted_rows(df) if t[2] == "F"}
    got = {(r.o_orderkey, r.o_custkey, r.o_orderstatus, r.o_totalprice) for r in back.collect()}
    assert {(t[0], t[1], t[2], t[3]) for t in expected} == got
