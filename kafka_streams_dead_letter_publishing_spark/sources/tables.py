"""Parquet table loaders for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Scale note: at 100 TB these would be partitioned/bucketed datasets; the
loader keeps the read declarative (``spark.read.parquet``) so predicate
pushdown, column pruning and partition pruning all apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: small dimension tables we broadcast in star-schema joins (SURVEY §4.3)
BROADCAST_TABLES = ("region", "nation", "supplier", "part", "customer")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries can run
    against the same names the duckdb oracle uses."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
