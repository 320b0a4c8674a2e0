"""Z-order layout (operators/zorder.py): the Morton key math is fuzzed
against a Python reference on BOTH engines (the registry oracle runs the
identical SQL text), and the layout's whole point — file-level min/max
pruning on both dimensions at once — is measured on actually-written
parquet against a single-dimension-sorted baseline."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.zorder import (
    candidate_files,
    zkey,
    zkey_sql,
    zorder_write,
)


def _py_spread(v: int) -> int:
    v &= 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _py_zkey(x: int, y: int) -> int:
    return _py_spread(x) + 2 * _py_spread(y)


def test_zkey_matches_python_reference_on_both_engines(spark):
    rng = random.Random(42)
    vals = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(300)]
    vals += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)]
    expect = [_py_zkey(x, y) for x, y in vals]

    df = spark.createDataFrame(vals, "x long, y long")
    got_spark = [r[0] for r in df.select(zkey("x", "y")).collect()]
    assert got_spark == expect

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({x},{y})" for x, y in vals)
        + ") v(x, y)"
    )
    got_duck = [r[0] for r in con.execute(f"SELECT {zkey_sql('x','y')} FROM t").fetchall()]
    assert got_duck == expect


def test_zkey_masks_to_16_bits(spark):
    # out-of-range inputs wrap into the 16-bit keyspace instead of
    # corrupting neighbouring bit positions
    df = spark.createDataFrame([(65536 + 5, 3)], "x long, y long")
    assert df.select(zkey("x", "y")).collect()[0][0] == _py_zkey(5, 3)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """A 128×128 (x, y) grid written twice: Z-ordered vs y-sorted, 16 files
    each."""
    base = tmp_path_factory.mktemp("zorder")
    rows = [(x, y, x * 128 + y) for x in range(128) for y in range(128)]
    df = spark.createDataFrame(rows, "x long, y long, v long")

    zpath = str(base / "zorder")
    zorder_write(df, zpath, "x", "y", n_files=16)

    lpath = str(base / "linear")
    (
        df.repartitionByRange(16, "y")
        .sortWithinPartitions("y")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    return zpath, lpath


def test_zorder_prunes_both_dimensions_linear_prunes_one(layouts):
    zpath, lpath = layouts
    box_x = {"x": (0, 15)}
    box_y = {"y": (0, 15)}
    box_xy = {"x": (0, 15), "y": (0, 15)}

    zx, zn = candidate_files(zpath, box_x)
    zy, _ = candidate_files(zpath, box_y)
    zxy, _ = candidate_files(zpath, box_xy)
    lx, ln = candidate_files(lpath, box_x)
    ly, _ = candidate_files(lpath, box_y)

    assert zn == 16 and ln == 16
    # the y-sorted layout prunes y-boxes well but reads EVERY file for an
    # x-box; the Z layout prunes both (a 16-wide strip hits at most the
    # block-columns it crosses, ~1/4 of files, boundaries are sampled so
    # allow slack)
    assert lx == 16
    assert ly <= 4
    assert zx <= 8 and zy <= 8
    assert max(zx, zy) < max(lx, ly)
    # the combined box collapses to a corner of the curve
    assert zxy <= 4


def test_pruning_is_sound(spark, layouts):
    """Skipping is an optimization, never a filter: reading only the
    candidate files must return exactly the box's rows."""
    zpath, _ = layouts
    full = spark.read.parquet(zpath).filter("x <= 15 and y <= 15").count()
    assert full == 16 * 16
    import pyarrow.parquet as pq
    import os

    files = [
        os.path.join(zpath, f) for f in os.listdir(zpath) if f.endswith(".parquet")
    ]
    hits = 0
    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        hits += sum(1 for a, b in zip(xs, ys) if a <= 15 and b <= 15)
    assert hits == full


def test_written_files_carry_no_layout_column(spark, layouts):
    zpath, _ = layouts
    assert set(spark.read.parquet(zpath).columns) == {"x", "y", "v"}


def test_imbalanced_dimension_ranges_still_prune(spark, tmp_path):
    """Regression for the raw-key degeneration: when one dimension spans
    16 bits and the other 7, un-normalized interleaving lets the wide
    dimension own the high bits and narrow-dimension probes read every
    file.  zorder_write's per-dimension 16-bit normalization must keep
    both dimensions prunable."""
    rng = random.Random(7)
    rows = [
        (rng.randrange(128), rng.randrange(43200), i) for i in range(20000)
    ]
    df = spark.createDataFrame(rows, "x long, y long, v long")
    path = str(tmp_path / "imbalanced")
    zorder_write(df, path, "x", "y", n_files=16)
    zx, n = candidate_files(path, {"x": (0, 15)})
    zy, _ = candidate_files(path, {"y": (0, 5399)})
    assert n == 16
    assert zx <= 8 and zy <= 8


def test_zorder_write_empty_input(spark, tmp_path):
    """No bounds exist for an empty frame — the write must produce a valid
    (empty) parquet dataset instead of interpolating None into SQL
    (review fix)."""
    df = spark.createDataFrame([], "x long, y long, v long")
    path = str(tmp_path / "empty")
    zorder_write(df, path, "x", "y", n_files=4)
    out = spark.read.parquet(path)
    assert out.count() == 0 and set(out.columns) == {"x", "y", "v"}
