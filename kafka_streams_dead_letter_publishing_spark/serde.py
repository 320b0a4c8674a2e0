"""Typed serde boundary as pure Column expressions.

The reference declares serdes per topic edge (``Consumed.with(Serdes.String(),
Serdes.Integer())``, reference ``topology/ErrorHandlingTopology.java:30,38,44``).
Two wire formats appear:

* UTF-8 strings (Kafka ``StringSerializer``),
* 4-byte big-endian two's-complement ints (Kafka ``IntegerSerializer``; the
  4-byte framing is pinned by the reference integration test:
  "Size of data received by IntegerDeserializer is not 4",
  ``ErrorHandlingTopologyIntegrationTest.java:103``).

Everything here is JVM-side expression code (whole-stage-codegen-able): no
Python UDFs.  A decode failure yields NULL rather than an exception — the
dead-letter topology turns that NULL into a deserialization-error route
(SURVEY §2 op #2/#9), matching the reference's handler-based contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

INT32_DESER_ERROR_CLASS = "IntegerDeserializationError"


def utf8_decode(c: Column) -> Column:
    """bytes → string (NULL-safe; invalid sequences are replaced, matching
    Spark's lenient cast)."""
    return c.cast("string")


def utf8_encode(c: Column) -> Column:
    """string → bytes."""
    return F.encode(c, "UTF-8")


def int32be_decode(c: Column) -> Column:
    """4-byte big-endian two's-complement bytes → int; NULL when the payload
    is not exactly 4 bytes (the deser-failure predicate) or input is NULL.

    ``conv(hex(bytes), 16, 10)`` yields the unsigned value as a decimal
    string; we re-sign it mod 2**32 so ``FF FF FF FF`` → -1, matching Java's
    ``IntegerDeserializer``.
    """
    unsigned = F.conv(F.hex(c), 16, 10).cast("long")
    signed = F.when(unsigned >= F.lit(2**31), unsigned - F.lit(2**32)).otherwise(unsigned)
    return F.when(F.length(c) == 4, signed.cast("int"))


def int32be_encode(c: Column) -> Column:
    """int → 4-byte big-endian two's-complement bytes (NULL-safe)."""
    unsigned = c.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    return F.unhex(F.lpad(F.hex(unsigned), 8, "0"))


def int32_deser_error_message(c: Column) -> Column:
    """Engine-native analogue of the reference's pinned deser failure text
    ("Size of data received by IntegerDeserializer is not 4",
    ``ErrorHandlingTopologyIntegrationTest.java:103``).  Handler-path headers
    carry the bare exception message, no class prefix
    (``DeadLetterDeserializationExceptionHandler.java:39``); we reproduce the
    shape with engine-native wording (SURVEY §2.3 note)."""
    return F.concat(
        F.lit("Size of data received by int32 deserializer is "),
        F.coalesce(F.length(c), F.lit(0)).cast("string"),
        F.lit(", expected 4"),
    )
