"""The business transform: error-capturing stateless 1:1 value map.

Reference semantics (``topology/ErrorHandlingMapper.java:12-27``): given an
Integer *n*, produce a random string of *n* chars drawn uniformly from
``a``–``z``; any exception (in practice ``IllegalArgumentException: -1`` from
``IntStream.limit(n)`` when *n* < 0) is captured per record into a
``MessageWrapper(originalValue, mappedValue, exception)``
(``errorhandling/MessageWrapper.java:3``) instead of failing the stream.

Spark-first translation (SURVEY §2 ops #3/#4): Kafka Streams catches *any*
exception record-at-a-time; Spark expressions fail the whole task, so the
known failure modes are enumerated as predicates and the per-record
try/catch becomes CASE WHEN expressions.  The wrapper is kept as FLAT
columns (``error_class`` / ``error_message`` / ``mapped_len``) rather than
one struct so Catalyst column pruning works: a routing-count query must
never pay for string generation (struct-field pruning does not reach
through CASE-WHEN-of-structs — measured 54 s → sub-second at sf0.1).

Determinism: the reference uses an unseeded ``java.util.Random``; its own
tests therefore assert only length and charset (``ErrorHandlingTopologyTest
.java:42-48``).  Our generator is *seeded* and hash-based, which keeps the
uniform a-z contract while making golden tests and oracle runs reproducible.

Scale note on generation cost: one xxhash64 yields 63 random bits; we
extract CHARS_PER_HASH = 12 base-26 digits per hash (26^12 < 2^63) via
``conv(…, 10, 26)`` + ``translate`` — O(n/12) hash calls instead of O(n),
all JVM-side whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NEGATIVE_LENGTH_ERROR_CLASS = "NegativeLengthError"
NULL_VALUE_ERROR_CLASS = "NullValueError"

#: chars extracted per 63-bit hash.  12, not 13 (r4 ADVICE): pmod(hash,
#: 26**k) is uniform only up to the truncated final cycle of 26**k inside
#: the 2**64 hash range.  26**13 = 2.48e18 fits just ~7.4 times into 2**64,
#: so at k=13 the leading base-26 digit of every block would overrepresent
#: a–k by ~14% (8 vs 7 cycles); 26**12 = 9.54e16 fits ~193 times, bounding
#: the per-block bias at ~0.5% — an honest "uniform a-z" at ~8% more hash
#: calls.
CHARS_PER_HASH = 12
_BASE26_MAX = 26**CHARS_PER_HASH
#: Spark's conv(x, 10, 26) digit alphabet for base 26 …
_CONV_DIGITS = "0123456789ABCDEFGHIJKLMNOP"
#: … mapped onto the reference's a-z charset (ErrorHandlingMapper.java:14-18)
_AZ = "abcdefghijklmnopqrstuvwxyz"


def random_lowercase_string(n: Column, uniq: Column, seed: int) -> Column:
    """Deterministic random string of ``n`` chars in ``[a-z]``.

    ``uniq`` is any per-record expression (e.g. key/offset hash) that
    decorrelates records.  Pure SQL, chunked: one xxhash64 per 12 output
    chars; each hash becomes 12 base-26 digits (``conv`` renders them as
    ``0-9A-P``) translated to ``a-z``.  Mirrors
    ``ErrorHandlingMapper.java:14-18`` (``random.ints(97, 123)``).

    Note: guarded for n <= 0 because Spark's ``sequence(1, 0)`` yields a
    *descending* [1, 0], not an empty array.
    """
    n_blocks = F.floor((n.cast("long") + F.lit(CHARS_PER_HASH - 1)) / F.lit(CHARS_PER_HASH))
    block = lambda b: F.translate(  # noqa: E731
        F.lpad(
            F.conv(
                F.pmod(F.xxhash64(F.lit(seed), uniq, b), F.lit(_BASE26_MAX)).cast("string"),
                10,
                26,
            ),
            CHARS_PER_HASH,
            "0",
        ),
        _CONV_DIGITS,
        _AZ,
    )
    gen = F.array_join(F.transform(F.sequence(F.lit(1), n_blocks.cast("int")), block), "")
    # NULL n propagates as NULL output (length-unknown ≠ length-zero): a
    # standalone caller must see the failure, not a fabricated valid empty
    # record — route() never reaches here with NULL n (deser rows are
    # filtered to their own channel first), so the reference path is
    # unchanged
    return (
        F.when(n.isNull(), F.lit(None).cast("string"))
        .when(n >= 1, gen.substr(F.lit(1), n.cast("int")))
        .otherwise(F.lit(""))
    )


def map_error_class(n: Column, value: Column) -> Column:
    """Enumerated failure modes of the reference mapper, as a flat column.

    NULL value passes Kafka's Integer deserializer (null→null) but the
    reference mapper would NPE ⇒ ``NullValueError``; negative *n* raises
    ``IllegalArgumentException`` in ``IntStream.limit`` ⇒
    ``NegativeLengthError`` (``ErrorHandlingMapper.java:22-25``).
    NULL ⇒ success.
    """
    return (
        F.when(value.isNull(), F.lit(NULL_VALUE_ERROR_CLASS))
        .when(n < 0, F.lit(NEGATIVE_LENGTH_ERROR_CLASS))
        .otherwise(F.lit(None).cast("string"))
    )


def map_error_message(n: Column, value: Column) -> Column:
    """The reference's exception message is just the offending value
    (``IllegalArgumentException: -1`` — SURVEY §2.3); ``"null"`` for the
    NPE-analogue case."""
    return (
        F.when(value.isNull(), F.lit("null"))
        .when(n < 0, n.cast("string"))
        .otherwise(F.lit(None).cast("string"))
    )


def error_header_text(error_class: Column, error_message: Column) -> Column:
    """Flatten to ``"<class>: <message>"`` exactly as the reference does
    (``ErrorMessageMapper.java:27-30``)."""
    return F.concat_ws(": ", error_class, error_message)
