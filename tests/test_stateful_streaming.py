"""applyInPandasWithState: state must persist across micro-batches, and the
final per-key totals must equal the batch ground truth."""

from __future__ import annotations

import os
import time

import pytest

from duckdb_read_spark.streaming.stateful import running_totals, stream_dedup


@pytest.fixture()
def two_batch_dir(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)

    def write(sub, rows):
        spark.createDataFrame(rows, "user_id LONG, ts_s STRING, value DOUBLE").selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value"
        ).coalesce(1).write.parquet(os.path.join(d, sub))

    write("f0", [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 10:01:00", 5.0)])
    write("f1", [(1, "2024-01-01 11:00:00", 2.0), (1, "2024-01-01 11:05:00", 4.0)])
    now = time.time()
    for i, sub in enumerate(("f0", "f1")):
        for f in os.listdir(os.path.join(d, sub)):
            os.utime(os.path.join(d, sub, f), (now - 30 + 30 * i,) * 2)
    return d


def test_running_totals_accumulates_across_batches(spark, two_batch_dir):
    schema = spark.read.parquet(os.path.join(two_batch_dir, "f0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(two_batch_dir, "f*"))
    )
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_running").collect()
    # update mode: one row per key per batch; the LAST row per key carries
    # the accumulated state — user 1 appears in both batches (1.0 then
    # 1.0+2.0+4.0), proving state survived the batch boundary.
    latest = {}
    for r in rows:
        latest[r["user_id"]] = (r["n"], r["total"])
    assert latest[1] == (3, 7.0)
    assert latest[2] == (1, 5.0)
    assert any(r["user_id"] == 1 and r["n"] == 1 for r in rows)  # batch-1 snapshot


def test_running_totals_rocksdb_state_store(spark, two_batch_dir, tmp_path):
    """SCALE.md claims the stateful ops scale via the RocksDB state store
    with NO code change — prove it: same two-batch run, provider switched
    by config alone, checkpoint to a real dir, identical totals, and the
    query's state-operator metrics show RocksDB actually served the state."""
    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_conf, None)
    spark.conf.set(
        provider_conf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = spark.read.parquet(os.path.join(two_batch_dir, "f0")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(two_batch_dir, "f*"))
        )
        q = (
            running_totals(stream)
            .writeStream.format("memory")
            .queryName("t_running_rocks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        latest = {}
        for r in spark.table("t_running_rocks").collect():
            latest[r["user_id"]] = (r["n"], r["total"])
        assert latest[1] == (3, 7.0) and latest[2] == (1, 5.0)
        metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
        assert any(k.startswith("rocksdb") for k in metrics), metrics
    finally:
        if old is None:
            spark.conf.unset(provider_conf)
        else:
            spark.conf.set(provider_conf, old)


def test_stream_dedup_batch_semantics(spark, two_batch_dir):
    # batch mode: plain dropDuplicates semantics
    df = spark.read.parquet(os.path.join(two_batch_dir, "f*"))
    dup = df.union(df)
    out = stream_dedup(dup, ["user_id", "ts"])
    assert out.count() == df.count()


def test_stream_dedup_within_watermark_bounded_state(spark, two_batch_dir):
    """Streaming path uses dropDuplicatesWithinWatermark: duplicates across
    micro-batches inside the horizon are dropped, and state is evictable."""
    import os as _os

    schema = spark.read.parquet(_os.path.join(two_batch_dir, "f0")).schema
    # duplicate file f0 as f2 so the same (user_id, ts) rows arrive twice
    import shutil, time as _time

    f2 = _os.path.join(two_batch_dir, "f2")
    shutil.copytree(_os.path.join(two_batch_dir, "f0"), f2)
    now = _time.time()
    for f in _os.listdir(f2):
        _os.utime(_os.path.join(f2, f), (now + 30,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_os.path.join(two_batch_dir, "f*"))
    )
    out = stream_dedup(stream, ["user_id", "ts"], watermark="10 days")
    q = (
        out.writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_sdedup").collect()
    keys = [(r["user_id"], r["ts"]) for r in rows]
    assert len(keys) == len(set(keys)) == 4  # f0 ∪ f1, f2's repeats dropped


def test_running_totals_string_key(spark, tmp_path):
    """Key schema is derived from the input, not hardcoded LONG — a string
    user id must stream through without a state-schema mismatch (ADVICE r1)."""
    import pandas as pd

    d = str(tmp_path / "skey")
    os.makedirs(d)
    pd.DataFrame({
        "user_id": ["alice", "alice", "bob"],
        "value": [1.0, 2.0, 5.0],
    }).to_parquet(os.path.join(d, "part.parquet"))
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("t_running_str")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = {r["user_id"]: (r["n"], r["total"])
              for r in spark.table("t_running_str").collect()}
    assert latest == {"alice": (2, 3.0), "bob": (1, 5.0)}


def test_run_to_memory_default_mode_for_non_aggregated_stream(spark, two_batch_dir):
    """run_to_memory with no explicit mode must not crash on a
    non-aggregated plan (memory sink rejects complete there; ADVICE r1)."""
    from duckdb_read_spark.streaming.windows import run_to_memory

    schema = spark.read.parquet(os.path.join(two_batch_dir, "f0")).schema
    stream = spark.readStream.schema(schema).parquet(os.path.join(two_batch_dir, "f*"))
    run_to_memory(stream_dedup(stream, ["user_id", "ts"]), "t_default_mode")
    assert spark.table("t_default_mode").count() == 4


def test_running_totals_transform_with_state(spark, two_batch_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary stateful processing):
    same two-batch scenario, same totals as the applyInPandasWithState
    tier — state persists across micro-batches through a named ValueState.
    RocksDB provider is a Spark requirement for this API (config only).
    Skips when protobuf (the API's state-protocol dependency) is absent —
    the operator itself must then raise a CLEAR ImportError, which this
    test pins before skipping."""
    from duckdb_read_spark.streaming.stateful import running_totals_tws

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        schema = spark.read.parquet(os.path.join(two_batch_dir, "f0")).schema
        stream = (spark.readStream.schema(schema)
                  .parquet(os.path.join(two_batch_dir, "f*")))
        with pytest.raises(ImportError, match="protobuf"):
            running_totals_tws(stream)
        pytest.skip("protobuf not installed — gated-dependency path pinned")

    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_conf, None)
    spark.conf.set(
        provider_conf,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        schema = spark.read.parquet(os.path.join(two_batch_dir, "f0")).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(two_batch_dir, "f*"))
        )
        q = (
            running_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.table("t_tws").collect()
        latest = {}
        for r in rows:
            latest[r["user_id"]] = (r["n"], r["total"])
        assert latest[1] == (3, 7.0)
        assert latest[2] == (1, 5.0)
        assert any(r["user_id"] == 1 and r["n"] == 1 for r in rows)
    finally:
        if old is not None:
            spark.conf.set(provider_conf, old)
        else:
            spark.conf.unset(provider_conf)
