"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.1 T2/T3 custom tier; north-star streaming surface).

Where the built-in window/session operators (windows.py) cover declarative
shapes, these cover *imperative* per-key state — the streaming analog of
the reference's ordered WAL-apply loop (pageserver applies records in LSN
order, keeping per-page state, /root/reference/neon:51-59).

State lives in the state store (per shuffle partition, checkpointed); the
grouping key partitions state across executors, so per-key state size — not
total stream volume — is the memory bound. Use GroupStateTimeout to bound
abandoned keys at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Output (update mode): one row per key per batch with the totals so far —
    the cumulative-apply motif. State: (n, total).
    """
    import pandas as pd

    key_type = events.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_type}, n LONG, total DOUBLE"
    state_schema = "n LONG, total DOUBLE"

    def fn(kt, pdf_iter, state: GroupState):
        (n, total) = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value].sum())
        state.update((n, total))
        yield pd.DataFrame({key: [kt[0]], "n": [n], "total": [total]})

    return events.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once ingestion filter: drop rows whose ``id_cols`` were seen
    within the watermark horizon.

    Streaming mode uses ``dropDuplicatesWithinWatermark`` — plain streaming
    ``dropDuplicates`` only evicts state when the event-time column is part
    of the key set, so with pure-id keys its state grows forever; the
    WithinWatermark variant evicts every key older than the horizon, which
    is the only state-bounded configuration at scale."""
    df = events
    if df.isStreaming:
        return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(id_cols)
    return df.dropDuplicates(id_cols)
