"""Custom stateful streaming operator via ``applyInPandasWithState``
([EXT], SURVEY north star: "applyInPandasWithState for custom stateful
operators").

The built-in windowed/dedup operators cover declarative state; this is the
ARBITRARY-state hook — the Spark analogue of a Kafka Streams
``Processor`` with a state store (which the reference deliberately scopes
out, reference ``README.md:159``).  The demo operator keeps a running
per-key (count, sum) and emits the updated running totals every
micro-batch.

Scale posture: state is keyed and shards across executors with the
groupBy shuffle; Arrow batches per group (no per-row Python); state size
is O(distinct keys) — bound it with timeouts when keys churn
(``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple[Any, ...], batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total": [total]})


def running_user_totals(df: DataFrame) -> DataFrame:
    """Per-user running event count + value sum, maintained in Spark-managed
    state across micro-batches; emits the updated totals for every user
    seen in the batch (use with ``outputMode("update")``).

    Input columns: ``user_id bigint, value double``.
    """
    return df.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
