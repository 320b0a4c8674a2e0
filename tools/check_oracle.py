"""Local stand-in for the driver's correctness gate: run every registry
query on Spark AND its DuckDB oracle over the same parquet tables, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import struct
import sys
import time

import pathlib

import duckdb
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def canon(v):
    """Canonicalize a cell so engine-representation differences vanish but
    value differences don't (floats compare BITWISE — the determinism
    policy promises identical IEEE doubles)."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        return struct.pack(">d", float(v)).hex()
    if isinstance(v, decimal.Decimal):
        # Integral decimals hash as EXACT ints: float(v) is lossy past
        # 2^53, which would wave through a genuine low-order-digit drift
        # on any wide-DECIMAL surface (and is exactly how the driver's
        # Decimal-vs-float64 PCA mismatch slipped the local gate).
        # Matches the int branch above, so a Spark BIGINT compares equal
        # to a DuckDB HUGEINT/DECIMAL of the same integer value.
        if v == v.to_integral_value():
            return int(v)
        return struct.pack(">d", float(v)).hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, np.ndarray, tuple)):
        return tuple(canon(x) for x in v)
    return str(v)


def table(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(canon(r[c]) for c in cols)
        for r in df_pandas.to_dict("records")
    ]
    return cols, sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES
    from kafka_streams_dead_letter_publishing_spark.sources.tables import TABLES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name, q in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if q.oracle is None:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)")
            continue
        try:
            odf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        scols, srows = table(sdf)
        ocols, orows = table(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            failed.append(name)
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
            failed.append(name)
        elif srows != orows:
            diff = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL {name}: values differ, first at sorted row {diff}:")
            print(f"  spark:  {srows[diff]}")
            print(f"  oracle: {orows[diff]}")
            failed.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")

    print(f"\n{len(failed)} failed" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
