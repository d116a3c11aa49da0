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


def dedup_stream(
    events: DataFrame, key_col: str, id_col: str, state_ttl_minutes: int | None = None
) -> DataFrame:
    """Exactly-once-per-id pass-through: drops rows whose ``id_col`` was
    already seen for this ``key_col`` group. State = the per-group set of
    seen ids.

    ``state_ttl_minutes`` bounds state for unbounded runs: a group idle
    that long is evicted (ProcessingTimeTimeout) — ids older than the TTL
    can then repeat, the standard dedup-window trade. Without it state
    grows with distinct keys forever.

    Batch oracle: ``df.dropDuplicates([id_col])`` over the same input —
    that's exactly what tests assert.
    """
    out_schema = events.schema

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
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
        if state_ttl_minutes is not None:
            state.setTimeoutDuration(state_ttl_minutes * 60_000)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
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


def neardup_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int = 1000,
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection: emits candidate
    ``(id_a, id_b)`` pairs AS DOCUMENTS ARRIVE — each incoming doc is
    checked against every earlier doc sharing an LSH band bucket, without
    ever re-reading the history (its signatures live in the state store).
    The streaming twin of the batch
    ``operators.dedup.minhash_lsh_pairs`` / ``incremental_minhash_pairs``.

    Shape: signatures are per-row array expressions
    (``minhash_signature_columns`` — no shuffle, no aggregate, so the
    stream needs no watermark for this stage), banded and exploded, then
    ``applyInPandasWithState`` keyed by (band_idx, band_signature) — the
    bucket id — with state = the bucket's member ids, capped at
    ``max_bucket`` (overflow members are dropped from state, mirroring the
    batch hot-bucket cap). Bucket keys are high-cardinality, so state
    spreads across executors; ``state_ttl_minutes`` evicts buckets idle
    that long (ProcessingTimeTimeout) so unbounded runs hold a sliding
    near-dup window instead of the whole corpus history.

    A pair that collides in several bands (or re-arrives) is emitted once
    per collision — downstream consumers dedupe with ``.dropDuplicates()``
    per sink batch, mirroring the batch operator's ``.distinct()``."""
    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.operators.dedup import minhash_signature_columns

    rows_per_band = num_hashes // bands
    sig = docs.select(
        F.col(id_col).alias("_id"), *minhash_signature_columns(F.col(text_col), num_hashes, shingle_n)
    ).where(F.col("mh_0").isNotNull())
    band_structs = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)
        ]
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), F.concat_ws("_", *cols).alias("band_sig"))
        )
    stacked = sig.select("_id", F.explode(F.array(*band_structs)).alias("bs")).select(
        "_id", "bs.band_idx", "bs.band_sig"
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (stored,) = state.get if state.exists else ([],)
        stored = list(stored)
        new = sorted({int(x) for pdf in pdfs for x in pdf["_id"]} - set(stored))
        pairs = []
        for nid in new:
            for sid in stored:
                lo, hi = (sid, nid) if sid < nid else (nid, sid)
                pairs.append((lo, hi))
        for i, nid in enumerate(new):
            for mid in new[i + 1 :]:
                pairs.append((nid, mid))
        if len(stored) < max_bucket:
            stored = (stored + new)[:max_bucket]
        state.update((stored,))
        if state_ttl_minutes is not None:
            state.setTimeoutDuration(state_ttl_minutes * 60_000)
        if pairs:
            yield pd.DataFrame(pairs, columns=["id_a", "id_b"])

    return stacked.groupBy("band_idx", "band_sig").applyInPandasWithState(
        fn,
        outputStructType="id_a long, id_b long",
        stateStructType="ids array<long>",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
