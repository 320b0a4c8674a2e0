"""The business transform: error-capturing stateless 1:1 value map.

Reference semantics (``topology/ErrorHandlingMapper.java:12-27``): given an
Integer *n*, produce a random string of *n* chars drawn uniformly from
``a``–``z``; any exception (in practice ``IllegalArgumentException: -1`` from
``IntStream.limit(n)`` when *n* < 0) is captured per record into a
``MessageWrapper(originalValue, mappedValue, exception)``
(``errorhandling/MessageWrapper.java:3``) instead of failing the stream.

Spark-first translation (SURVEY §2 ops #3/#4): Kafka Streams catches *any*
exception record-at-a-time; Spark expressions fail the whole task, so the
known failure mode is enumerated as a predicate and the per-record try/catch
becomes one CASE WHEN producing a wrapper *struct column*.  The whole thing
is expression-only → whole-stage codegen, no Python in the hot path.

Determinism: the reference uses an unseeded ``java.util.Random``; its own
tests therefore assert only length and charset (``ErrorHandlingTopologyTest
.java:42-48``).  Our generator is *seeded* and hash-based (xxhash64 of
(seed, partition-key, position)), which keeps the uniform a-z contract while
making golden tests and oracle runs reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NEGATIVE_LENGTH_ERROR_CLASS = "NegativeLengthError"

# Strings longer than the producer limit can never be emitted (the pre-flight
# production guard truncates them to empty, reference
# ``DeadLetterProductionExceptionHandler.java:59-67``), so we never *generate*
# more than this many chars — carries the length instead.  Keeps a
# ("key", 2_000_000) record from materializing a 2 MB string per row.
GENERATION_CAP_DEFAULT = 2**21


def random_lowercase_string(n: Column, uniq: Column, seed: int) -> Column:
    """Deterministic random string of ``n`` chars in ``[a-z]``.

    ``uniq`` is any per-record expression (e.g. key/offset) that decorrelates
    records.  Pure SQL: sequence → transform(xxhash64 % 26) → char → join.
    Mirrors ``ErrorHandlingMapper.java:14-18`` (``random.ints(97, 123)``).

    Note: guarded for n <= 0 because Spark's ``sequence(1, 0)`` yields a
    *descending* [1, 0], not an empty array.
    """
    gen = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.char(F.lit(97) + F.pmod(F.xxhash64(F.lit(seed), uniq, i), F.lit(26))),
        ),
        "",
    )
    return F.when(n >= 1, gen).otherwise(F.lit(""))


def wrap_map(n: Column, uniq: Column, seed: int, generation_cap: int = GENERATION_CAP_DEFAULT) -> Column:
    """Error-capturing map: int column → MessageWrapper struct column.

    Struct fields (SURVEY §1.2 ``MessageWrapper`` mapping):
      original_value int      — always the pre-map value
      mapped_value  string    — NULL on failure; NULL (length carried in
                                mapped_len) when n exceeds generation_cap
      mapped_len    long      — serialized length of the mapped value, valid
                                even when the string itself was not
                                materialized; NULL on failure
      error_class   string    — NULL on success
      error_message string    — NULL on success
    """
    failure = F.struct(
        n.alias("original_value"),
        F.lit(None).cast("string").alias("mapped_value"),
        F.lit(None).cast("long").alias("mapped_len"),
        F.lit(NEGATIVE_LENGTH_ERROR_CLASS).alias("error_class"),
        # The reference's exception message is just the offending value
        # (``IllegalArgumentException: -1`` — SURVEY §2.3).
        n.cast("string").alias("error_message"),
    )
    success = F.struct(
        n.alias("original_value"),
        F.when(n <= F.lit(generation_cap), random_lowercase_string(n, uniq, seed)).alias(
            "mapped_value"
        ),
        n.cast("long").alias("mapped_len"),
        F.lit(None).cast("string").alias("error_class"),
        F.lit(None).cast("string").alias("error_message"),
    )
    return F.when(n < 0, failure).otherwise(success)


def wrapper_has_error(wrapper: Column) -> Column:
    """The reference's branch predicate ``MessageWrapper.hasError()`` ==
    ``exception != null`` (``errorhandling/MessageWrapper.java:5-7``)."""
    return wrapper["error_class"].isNotNull()


def wrapper_error_message(wrapper: Column) -> Column:
    """Flatten to ``"<class>: <message>"`` exactly as the reference does
    (``ErrorMessageMapper.java:27-30``)."""
    return F.concat_ws(": ", wrapper["error_class"], wrapper["error_message"])
