"""Generalized per-record error capture for arbitrary Python transforms.

The reference catches *any* exception record-at-a-time inside its mapper
(``topology/ErrorHandlingMapper.java:22-25``, wrapping into
``MessageWrapper`` — ``errorhandling/MessageWrapper.java:20-24``).  The
engine's hot path enumerates known failure modes as Column predicates
(zero-UDF, see ``operators/mapper.py``), but user-supplied lambdas can fail
in ways no predicate anticipates — this module is that general form:

* ``safe_map(fn, ...)`` returns an Arrow-batched ``pandas_udf`` producing a
  wrapper STRUCT ``(result, error_class, error_message)``; a per-record
  exception becomes data instead of failing the task (Spark's default is
  task-kill → query-kill, the opposite of the dead-letter contract).
* ``split_wrapped`` splits ok/error rows — the same branch predicate as
  the topology (``error_class IS NOT NULL`` ≡ ``MessageWrapper.hasError``,
  ``errorhandling/MessageWrapper.java:5-7``).

Scale posture: one Python worker round-trip per batch (Arrow columnar
transfer, not per-row pickling); the Python loop inside the batch is
irreducible — the *user's* fn is arbitrary Python.  Keep reference-path
transforms on the expression hot path; reach for this only for genuinely
opaque logic.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WRAPPER_FIELDS = ("result", "error_class", "error_message")


def safe_map(fn: Callable[[Any], Any], result_type: str = "double") -> Callable[[Column], Column]:
    """Wrap ``fn`` into an error-capturing vectorized UDF.

    Returns a function of one Column producing a struct column
    ``result {result_type}, error_class string, error_message string`` —
    exceptions are flattened exactly like the reference's
    ``"<class>: <message>"`` contract expects downstream
    (``ErrorMessageMapper.java:27-30``: class name + message kept separate
    here, concatenated at header time).
    """
    schema = f"result {result_type}, error_class string, error_message string"

    @F.pandas_udf(schema)
    def wrapped(batch: pd.Series) -> pd.DataFrame:
        results, classes, messages = [], [], []
        for v in batch:
            # pandas surfaces Arrow nulls as NaN/NA (and a null-bearing int
            # column as float64); present missing values to fn as None so
            # user code sees the record's actual nullity
            if v is None or v is pd.NA or (isinstance(v, float) and v != v):
                v = None
            try:
                results.append(fn(v))
                classes.append(None)
                messages.append(None)
            except Exception as e:  # noqa: BLE001 — capturing ANY error is the point
                results.append(None)
                classes.append(type(e).__name__)
                messages.append(str(e))
        return pd.DataFrame(
            {"result": results, "error_class": classes, "error_message": messages}
        )

    return wrapped


def split_wrapped(df: DataFrame, wrapper_col: str = "wrapped") -> tuple[DataFrame, DataFrame]:
    """(ok, failed) — the topology's hasError branch over a wrapper column."""
    has_error = F.col(f"{wrapper_col}.error_class").isNotNull()
    return df.filter(~has_error), df.filter(has_error)
