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


def running_totals_tws(
    events: DataFrame,
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful-processing API (SPARK-45673, public),
    the successor tier to ``running_totals``'s applyInPandasWithState.

    Same semantics and output shape as ``running_totals`` (equivalence
    test-pinned), but state is a named ``ValueState`` managed by a
    ``StatefulProcessor`` — the API that adds state TTL, multiple state
    variables, timers, and initial-state bootstrapping at 100 TB scale.
    Requires the RocksDB state store provider (a Spark requirement for
    this API, config not code) and the ``protobuf`` package (the API's
    state-protocol wire format — raises a clear error when absent, as in
    this container; the applyInPandasWithState tier has no such
    dependency and stays the default)."""
    import pandas as pd

    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark's stateful-processor protocol); it is not installed "
            "in this environment — use running_totals "
            "(applyInPandasWithState) instead") from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_type = events.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_type}, n LONG, total DOUBLE"

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n LONG, total DOUBLE")

        def handleInputRows(self, key_t, rows, timer_values):
            n, total = (self._state.get() if self._state.exists()
                        else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value].sum())
            self._state.update((n, total))
            yield pd.DataFrame({key: [key_t[0]], "n": [n],
                                "total": [total]})

        def close(self) -> None:
            pass

    return events.groupBy(key).transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
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
