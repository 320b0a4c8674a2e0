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
from pyspark.sql import functions as F

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
    if name == "events":
        # events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (which
        # Spark 4 rejects outright without the legacy flag) and plain
        # TIMESTAMP(MICROS) across testdata generations — branch on what the
        # file actually contains.  Nanos case: read the raw int64 nanos and
        # rebuild a TIMESTAMP_NTZ at microsecond precision; the NTZ
        # arithmetic (anchored at the NTZ epoch, not via timestamp_micros)
        # keeps the conversion independent of the session timezone, and the
        # integer `div 1000` truncation matches how DuckDB reads the same
        # column — so oracle comparisons agree to the microsecond.  Micros
        # case: Spark already yields TIMESTAMP_NTZ (no UTC adjustment flag),
        # identical to DuckDB's naive TIMESTAMP read — use as-is.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition to the session's parallelism before an
    expression-heavy stage.

    The toy test tables are single parquet files, so their scans yield ONE
    partition and everything narrow downstream runs on one core; at real
    scale the scan is already thousands of partitions and this shuffle is a
    no-op to skip.  Hash (not round-robin) partitioning so Catalyst can
    dedupe the exchange across self-join branches (round-robin exchanges
    are non-deterministic and never reused).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, *[F.col(k) for k in keys])


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries can run
    against the same names the duckdb oracle uses."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
