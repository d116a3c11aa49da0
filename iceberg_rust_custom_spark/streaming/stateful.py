"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.4); these are the
Spark-native operators a continuous training-data ingest pipeline needs.

Scale notes: state lives in the state store partitioned by key — the
groupBy key must be high-cardinality enough to spread across executors.
Timeouts bound state size; without them a streaming dedup's seen-set grows
forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(events: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Exactly-once-per-id pass-through: drops rows whose ``id_col`` was
    already seen for this ``key_col`` group. State = the per-group set of
    seen ids (bounded by ProcessingTimeTimeout in production configs).

    Batch oracle: ``df.dropDuplicates([id_col])`` over the same input —
    that's exactly what tests assert.
    """
    out_schema = events.schema

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else ([],)
        seen_set = set(seen)
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen_set)]
            # also dedup within the batch itself
            fresh = fresh.drop_duplicates(subset=[id_col])
            seen_set.update(fresh[id_col].tolist())
            if len(fresh):
                yield fresh
        state.update((list(seen_set),))

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_aggregate_stream(events: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum, max) emitted once per micro-batch —
    the applyInPandasWithState shape for custom incremental aggregates that
    F.sum/F.max windows can't express (e.g. conditional resets)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            cnt, total, mx = state.get
        else:
            cnt, total, mx = 0, 0.0, float("-inf")
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
            if len(pdf):
                mx = max(mx, float(pdf[value_col].max()))
        state.update((cnt, total, mx))
        yield pd.DataFrame({"key": [key[0]], "n": [cnt], "total": [total], "max_value": [mx]})

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key long, n long, total double, max_value double",
        stateStructType="cnt long, total double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
