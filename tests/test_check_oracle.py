"""Regression fixtures for the local comparator's canonicalization
(tools/check_oracle.py).

The repo's verification policy is exact-integer determinism, so the
comparator itself must be exact: the r9 driver failure on
``emb_pca_covariance`` (Spark Decimal vs DuckDB float64, values equal)
passed the OLD local gate because Decimals were hashed through
``float(v)`` — lossy past 2^53.  These fixtures pin the hardened
behavior: integral Decimals hash as exact ints, so (a) a 1-ulp-past-2^53
digit drift is caught, and (b) a Decimal-vs-float64 type split on a
wide value is caught, while (c) legitimately equal integer surfaces
(Spark BIGINT vs DuckDB HUGEINT/DECIMAL) still compare equal.
"""

from __future__ import annotations

import decimal
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import canon  # noqa: E402

TWO53 = 2**53


def test_integral_decimal_hashes_as_exact_int():
    assert canon(decimal.Decimal(5)) == canon(5)
    assert canon(decimal.Decimal(-(2**61))) == canon(-(2**61))


def test_one_ulp_past_2_53_drift_is_caught():
    # float64 cannot distinguish 2^53 from 2^53 + 1; the exact-int canon
    # must.  This is the fixture the old float-hex path fails.
    a = canon(decimal.Decimal(TWO53))
    b = canon(decimal.Decimal(TWO53 + 1))
    assert a != b
    assert float(TWO53) == float(TWO53 + 1)  # why the old path was blind


def test_decimal_vs_float64_type_split_is_caught():
    # The PCA failure shape: engines deliver the "same" wide value as
    # Decimal (Spark) vs float64 (DuckDB).  Past 2^53 the float is not
    # the value — the comparator must flag, not coerce.
    wide = 3**40  # ~1.2e19, integral, > 2^53
    assert canon(decimal.Decimal(wide)) != canon(float(wide))


def test_small_int_decimal_float_split_still_flags():
    # Policy: exact-integer surfaces must agree in KIND too — a DOUBLE
    # on one side and DECIMAL on the other is a contract bug even when
    # the value is small enough to survive the float hop.
    assert canon(decimal.Decimal(7)) != canon(7.0)
    assert canon(decimal.Decimal(7)) == canon(7) == canon(np.int64(7))


def test_fractional_decimals_keep_bitwise_float_canon():
    assert canon(decimal.Decimal("1.5")) == canon(1.5)
    assert canon(decimal.Decimal("1.5")) != canon(1.25)


def test_scalar_passthroughs_unchanged():
    assert canon(None) is None
    assert canon(float("nan")) == "NaN"
    assert canon(True) is True and canon(np.bool_(False)) is False
    assert canon(b"\x00\xff") == "00ff"
    assert canon([decimal.Decimal(TWO53 + 1)]) == (TWO53 + 1,)
