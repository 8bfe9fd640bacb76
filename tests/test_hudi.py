"""Hudi COPY_ON_WRITE reader (hudilog.py) against a hand-built
spec-shaped fixture — timeline replay, file-group replacement,
time travel, pending-instant and MOR handling."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from duckdb_read_spark import hudilog
from duckdb_read_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))


def _commit(d: str, ts: str, writes: dict[str, list[dict]],
            replaces: dict[str, list[str]] | None = None,
            action: str = "commit") -> None:
    body = {"partitionToWriteStats": writes}
    if replaces:
        body["partitionToReplaceFileIds"] = replaces
        action = "replacecommit"
    with open(os.path.join(d, ".hoodie", f"{ts}.{action}"), "w") as f:
        json.dump(body, f)


def _write_file(spark, d: str, rel: str, lo: int, hi: int,
                with_meta: bool = True):
    full = os.path.join(d, rel)
    df = spark.range(lo, hi).withColumn("v", F.col("id") * 10)
    if with_meta:
        df = df.withColumn("_hoodie_commit_time", F.lit("0")) \
               .withColumn("_hoodie_record_key", F.col("id").cast("string"))
    df.coalesce(1).write.mode("overwrite").parquet(full + ".tmpdir")
    # hudi base files are single parquet files, not directories
    part = [f for f in os.listdir(full + ".tmpdir")
            if f.endswith(".parquet")][0]
    os.makedirs(os.path.dirname(full), exist_ok=True)
    os.replace(os.path.join(full + ".tmpdir", part), full)


def _hudi_fixture(spark, d: str) -> None:
    os.makedirs(os.path.join(d, ".hoodie"))
    with open(os.path.join(d, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    # commit 1: two file groups
    _write_file(spark, d, "p/g1_0-0-1_001.parquet", 0, 5)
    _write_file(spark, d, "p/g2_0-0-1_001.parquet", 10, 15)
    _commit(d, "001", {"p": [
        {"fileId": "g1", "path": "p/g1_0-0-1_001.parquet"},
        {"fileId": "g2", "path": "p/g2_0-0-1_001.parquet"}]})
    # commit 2: updates file group g1 (new base slice replaces the old)
    _write_file(spark, d, "p/g1_0-0-2_002.parquet", 0, 7)
    _commit(d, "002", {"p": [
        {"fileId": "g1", "path": "p/g1_0-0-2_002.parquet"}]})
    # pending instants must be ignored
    open(os.path.join(d, ".hoodie", "003.commit.requested"), "w").close()
    open(os.path.join(d, ".hoodie", "003.commit.inflight"), "w").close()


def test_hudi_snapshot_newest_slice_per_group(eng, spark, tmp_path):
    d = str(tmp_path / "hudi")
    _hudi_fixture(spark, d)
    df = hudilog.read_hudi_table(spark, d)
    assert not any(c.startswith("_hoodie_") for c in df.columns)
    got = {r.id for r in df.collect()}
    # g1's NEWER slice (0..6) + g2 (10..14); old g1 slice not double-read
    assert got == set(range(7)) | set(range(10, 15))
    assert df.count() == 12


def test_hudi_time_travel_by_instant_and_index(eng, spark, tmp_path):
    d = str(tmp_path / "hudi_tt")
    _hudi_fixture(spark, d)
    old = {r.id for r in
           hudilog.read_hudi_table(spark, d, instant="001").collect()}
    assert old == set(range(5)) | set(range(10, 15))
    assert old == {r.id for r in
                   hudilog.read_hudi_table(spark, d, instant=1).collect()}
    with pytest.raises(LookupError):
        hudilog.read_hudi_table(spark, d, instant="999")


def test_hudi_replacecommit_drops_file_groups(eng, spark, tmp_path):
    d = str(tmp_path / "hudi_rc")
    _hudi_fixture(spark, d)
    # clustering: replace g1+g2 with one compacted group
    _write_file(spark, d, "p/g3_0-0-4_004.parquet", 100, 103)
    _commit(d, "004", {"p": [
        {"fileId": "g3", "path": "p/g3_0-0-4_004.parquet"}]},
        replaces={"p": ["g1", "g2"]})
    got = {r.id for r in hudilog.read_hudi_table(spark, d).collect()}
    assert got == {100, 101, 102}
    # earlier snapshot unaffected
    old = {r.id for r in
           hudilog.read_hudi_table(spark, d, instant="002").collect()}
    assert old == set(range(7)) | set(range(10, 15))


def test_hudi_mor_cow_path_still_refuses_stray_deltacommit(
        eng, spark, tmp_path):
    d = str(tmp_path / "hudi_mor")
    _hudi_fixture(spark, d)
    open(os.path.join(d, ".hoodie", "005.deltacommit"), "w").close()
    with pytest.raises(NotImplementedError, match="MERGE_ON_READ"):
        hudilog.read_hudi_table(spark, d)
    # a properties-declared MOR table ROUTES to the merge reader (r7);
    # with no log files the snapshot is just the newest base slices
    d2 = str(tmp_path / "hudi_mor2")
    _hudi_fixture(spark, d2)
    with open(os.path.join(d2, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n")
    assert hudilog.read_hudi_table(spark, d2).count() > 0


def test_hudi_register_and_attach(eng, spark, tmp_path):
    """A foreign .hoodie dir registers as a versioned table (SQL-visible,
    VERSION AS OF by chronological index) and ATTACH discovers it."""
    d = str(tmp_path / "cat" / "hud")
    os.makedirs(os.path.dirname(d), exist_ok=True)
    _hudi_fixture(spark, d)
    eng.register_versioned("hud", d)
    assert eng.sql("SELECT count(*) AS n FROM hud").first()["n"] == 12
    eng.attach(str(tmp_path / "cat"), "ext")
    assert eng.sql("SELECT count(*) AS n FROM ext__hud").first()["n"] == 12


def test_hudi_unpadded_timeline_orders_numerically(eng, spark, tmp_path):
    """Review r6-2: instants '9' and '10' must replay 9 → 10 (numeric),
    not '10' < '9' (lexicographic) — else the STALE base slice wins."""
    d = str(tmp_path / "hudi_pad")
    os.makedirs(os.path.join(d, ".hoodie"))
    with open(os.path.join(d, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    _write_file(spark, d, "p/g1_0-0-9_9.parquet", 0, 3)
    _commit(d, "9", {"p": [{"fileId": "g1",
                            "path": "p/g1_0-0-9_9.parquet"}]})
    _write_file(spark, d, "p/g1_0-0-10_10.parquet", 100, 102)
    _commit(d, "10", {"p": [{"fileId": "g1",
                             "path": "p/g1_0-0-10_10.parquet"}]})
    got = {r.id for r in hudilog.read_hudi_table(spark, d).collect()}
    assert got == {100, 101}  # the newer slice, not the stale one
    # string instants address TIMESTAMPS exactly; ints address the index
    old = {r.id for r in
           hudilog.read_hudi_table(spark, d, instant="9").collect()}
    assert old == {0, 1, 2}
    with pytest.raises(LookupError):
        hudilog.read_hudi_table(spark, d, instant="2")  # not a ts
    assert {r.id for r in hudilog.read_hudi_table(
        spark, d, instant=2).collect()} == {100, 101}


def test_hudi_write_roundtrip_and_overwrite(eng, spark, tmp_path):
    """write_hudi_table → timeline replay round-trip: appends add file
    groups, overwrite lands a replacecommit replacing every live group;
    earlier instants stay time-travelable; COPY (FORMAT HUDI) routes."""
    d = str(tmp_path / "hudi_w")
    t1 = hudilog.write_hudi_table(
        spark.createDataFrame([(1,), (2,)], "k long").coalesce(1), d)
    t2 = hudilog.write_hudi_table(
        spark.createDataFrame([(3,)], "k long").coalesce(1), d,
        mode="append")
    assert (len(t1), t1) < (len(t2), t2)
    assert {r.k for r in hudilog.read_hudi_table(spark, d).collect()} \
        == {1, 2, 3}
    hudilog.write_hudi_table(
        spark.createDataFrame([(9,)], "k long").coalesce(1), d,
        mode="overwrite")
    assert {r.k for r in hudilog.read_hudi_table(spark, d).collect()} \
        == {9}
    assert {r.k for r in
            hudilog.read_hudi_table(spark, d, instant=2).collect()} \
        == {1, 2, 3}

    d2 = str(tmp_path / "hudi_copy")
    eng.register_fixture_dir("/root/testdata/sf0.001")
    eng.sql(f"COPY (SELECT n_nationkey AS k FROM nation "
            f"WHERE n_nationkey < 4) TO '{d2}' (FORMAT HUDI)")
    eng.sql(f"COPY (SELECT 50 AS k) TO '{d2}' (FORMAT HUDI)")
    got = {r.k for r in eng.sql(
        f"SELECT k FROM read_hudi('{d2}')").collect()}
    assert got == {0, 1, 2, 3, 50}


def test_hudi_write_append_to_real_format_timeline(eng, spark, tmp_path):
    """Review r6-3: appending to a timeline with real yyyyMMddHHmmssSSS
    instants (~2e16) must jump past the newest instant, not spin epoch
    millis one at a time; overwrite replaces only LIVE groups."""
    d = str(tmp_path / "hudi_real")
    _hudi_fixture(spark, d)  # instants '001','002' (shorter → older)
    big = str(tmp_path / "hudi_big")
    os.makedirs(os.path.join(big, ".hoodie"))
    with open(os.path.join(big, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    _write_file(spark, big, "g1_0-0-1_20240814120000123.parquet", 0, 2)
    _commit(big, "20240814120000123",
            {"": [{"fileId": "g1",
                   "path": "g1_0-0-1_20240814120000123.parquet"}]})
    ts = hudilog.write_hudi_table(
        spark.createDataFrame([(5,)], "k long").coalesce(1), big,
        mode="append")
    assert int(ts) == 20240814120000124  # jumped, not spun
    got = {r.id if hasattr(r, "id") else r.k
           for r in hudilog.read_hudi_table(spark, big)
           .select(F.coalesce(F.col("id"), F.col("k")).alias("id"))
           .collect()}
    assert got == {0, 1, 5}

    # overwrite after a replacecommit must not re-replace dead groups
    d2 = str(tmp_path / "hudi_live")
    hudilog.write_hudi_table(
        spark.createDataFrame([(1,)], "k long").coalesce(1), d2)
    hudilog.write_hudi_table(
        spark.createDataFrame([(2,)], "k long").coalesce(1), d2,
        mode="overwrite")  # replaces group 1
    ts3 = hudilog.write_hudi_table(
        spark.createDataFrame([(3,)], "k long").coalesce(1), d2,
        mode="overwrite")
    tl = {t: f for t, a, f in hudilog.timeline(d2)}
    body = hudilog._read_instant(d2, tl[ts3])
    dead_and_live = body["partitionToReplaceFileIds"][""]
    assert len(dead_and_live) == 1  # only the LIVE group from commit 2
    assert {r.k for r in hudilog.read_hudi_table(spark, d2).collect()} \
        == {3}


# --- MERGE_ON_READ (r7): log-format reader + read-path compaction ---------

_MOR_SCHEMA = json.dumps({
    "type": "record", "name": "rec", "fields": [
        {"name": "_hoodie_record_key", "type": "string"},
        {"name": "id", "type": "long"},
        {"name": "v", "type": "long"},
    ]})


def _avro_zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_rec(key: str, i: int, v: int) -> bytes:
    kb = key.encode()
    return (_avro_zigzag(len(kb)) + kb + _avro_zigzag(i)
            + _avro_zigzag(v))


def _block_bytes(records: list[bytes], schema_json: str,
                 block_type: int = 3) -> bytes:
    """Hand-packed HoodieLogFormat block, authored from the published
    tech-specs layout — independent of hudilog.write_log_file, so the
    reader is pinned by bytes it did not produce."""
    import struct

    content = struct.pack(">ii", 3, len(records)) + b"".join(
        struct.pack(">i", len(r)) + r for r in records)
    sj = schema_json.encode()
    headers = (struct.pack(">i", 2)
               + struct.pack(">ii", 0, 1) + b"1"          # INSTANT_TIME
               + struct.pack(">ii", 2, len(sj)) + sj)      # SCHEMA
    footers = struct.pack(">i", 0)
    body = (struct.pack(">ii", 1, block_type) + headers
            + struct.pack(">q", len(content)) + content + footers)
    total = 6 + 8 + len(body) + 8
    return (b"#HUDI#" + struct.pack(">q", len(body) + 8) + body
            + struct.pack(">q", total))


def test_hudi_log_block_reader_hand_built_bytes(tmp_path):
    p = str(tmp_path / "x.log.1")
    with open(p, "wb") as f:
        f.write(_block_bytes([_avro_rec("k1", 1, 10)], _MOR_SCHEMA))
        f.write(_block_bytes([_avro_rec("k2", 2, 20),
                              _avro_rec("k3", 3, 30)], _MOR_SCHEMA))
    blocks = hudilog.read_log_blocks(p)
    assert [b["type"] for b in blocks] == ["avro_data", "avro_data"]
    assert blocks[0]["headers"][0] == "1"
    recs = hudilog.decode_avro_data_block(
        blocks[1]["content"], blocks[1]["headers"][2])
    assert recs == [
        {"_hoodie_record_key": "k2", "id": 2, "v": 20},
        {"_hoodie_record_key": "k3", "id": 3, "v": 30}]
    # the module writer round-trips through the same spec framing
    p2 = str(tmp_path / "y.log.1")
    hudilog.write_log_file(p2, _MOR_SCHEMA,
                           [[{"_hoodie_record_key": "k9",
                              "id": 9, "v": 90}]])
    b2 = hudilog.read_log_blocks(p2)
    assert hudilog.decode_avro_data_block(
        b2[0]["content"], b2[0]["headers"][2]) == [
        {"_hoodie_record_key": "k9", "id": 9, "v": 90}]


def _mor_fixture(spark, d: str) -> None:
    """Base slice (keys 0..4) via 001.commit + one log file via
    002.deltacommit: updates k1 and k3 (k1 twice across two blocks —
    the LATER block must win) and inserts k9."""
    os.makedirs(os.path.join(d, ".hoodie"))
    with open(os.path.join(d, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n")
    base = spark.createDataFrame(
        [(str(i), i, i * 10) for i in range(5)],
        "`_hoodie_record_key` string, `id` long, `v` long")
    tmp = os.path.join(d, "b.tmpdir")
    base.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, part), os.path.join(d, "g1_001.parquet"))
    _commit(d, "001", {"": [{"fileId": "g1", "path": "g1_001.parquet"}]})
    with open(os.path.join(d, "g1_002.log.1"), "wb") as f:
        f.write(_block_bytes([_avro_rec("1", 1, 111),
                              _avro_rec("3", 3, 333)], _MOR_SCHEMA))
        f.write(_block_bytes([_avro_rec("1", 1, 999),
                              _avro_rec("9", 9, 90)], _MOR_SCHEMA))
    _commit(d, "002", {"": [{"fileId": "g1", "path": "g1_002.log.1"}]},
            action="deltacommit")


def test_hudi_mor_merge_end_to_end(spark, tmp_path):
    d = str(tmp_path / "mor1")
    _mor_fixture(spark, d)
    got = {(r["id"], r["v"])
           for r in hudilog.read_hudi_table(spark, d).collect()}
    assert got == {(0, 0), (1, 999), (2, 20), (3, 333), (4, 40), (9, 90)}
    # time travel to the base-only instant
    got1 = {(r["id"], r["v"])
            for r in hudilog.read_mor_table(spark, d, instant="001")
            .collect()}
    assert got1 == {(i, i * 10) for i in range(5)}


def test_hudi_mor_compaction_absorbs_logs(spark, tmp_path):
    d = str(tmp_path / "mor2")
    _mor_fixture(spark, d)
    # 003.commit writes a NEW base slice for g1 (a completed
    # compaction): earlier logs are absorbed and must not re-apply
    base2 = spark.createDataFrame(
        [("0", 0, 7)], "`_hoodie_record_key` string, `id` long, `v` long")
    tmp = os.path.join(d, "b2.tmpdir")
    base2.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, part), os.path.join(d, "g1_003.parquet"))
    _commit(d, "003", {"": [{"fileId": "g1", "path": "g1_003.parquet"}]})
    got = {(r["id"], r["v"])
           for r in hudilog.read_hudi_table(spark, d).collect()}
    assert got == {(0, 7)}


def test_hudi_mor_refusals(spark, tmp_path):
    # unsupported block type (delete = ordinal 1) fails the read loudly
    d = str(tmp_path / "mor3")
    _mor_fixture(spark, d)
    with open(os.path.join(d, "g1_004.log.1"), "wb") as f:
        f.write(_block_bytes([_avro_rec("1", 1, 1)], _MOR_SCHEMA,
                             block_type=1))
    _commit(d, "004", {"": [{"fileId": "g1", "path": "g1_004.log.1"}]},
            action="deltacommit")
    with pytest.raises(Exception, match="delete"):
        hudilog.read_hudi_table(spark, d).collect()
    # framing mismatch (corrupted trailing total length) refuses
    p = str(tmp_path / "bad.log.1")
    blk = bytearray(_block_bytes([_avro_rec("1", 1, 1)], _MOR_SCHEMA))
    blk[-1] ^= 0xFF
    with open(p, "wb") as f:
        f.write(bytes(blk))
    with pytest.raises(ValueError, match="total block length"):
        hudilog.read_log_blocks(p)


def test_hudi_mor_log_to_log_schema_drift_refuses(spark, tmp_path):
    """ADVICE r7: a later deltacommit whose log blocks carry a DIFFERENT
    field set must refuse — projecting onto the first log's names would
    silently drop the new field and NULL renamed ones."""
    d = str(tmp_path / "mor_drift")
    _mor_fixture(spark, d)
    drifted = json.dumps({
        "type": "record", "name": "rec", "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "id", "type": "long"},
            {"name": "v_renamed", "type": "long"},
        ]})
    rec = (b"\x02" + b"7" + _avro_zigzag(7) + _avro_zigzag(70))
    with open(os.path.join(d, "g1_005.log.1"), "wb") as f:
        f.write(_block_bytes([rec], drifted))
    _commit(d, "005", {"": [{"fileId": "g1", "path": "g1_005.log.1"}]},
            action="deltacommit")
    with pytest.raises(Exception, match="drift"):
        hudilog.read_hudi_table(spark, d).collect()


def test_hudi_mor_same_schema_second_log_still_merges(spark, tmp_path):
    """The drift fence must NOT fire on byte-identical schemas across
    log files (the common case)."""
    d = str(tmp_path / "mor_same")
    _mor_fixture(spark, d)
    with open(os.path.join(d, "g1_005.log.1"), "wb") as f:
        f.write(_block_bytes([_avro_rec("2", 2, 222)], _MOR_SCHEMA))
    _commit(d, "005", {"": [{"fileId": "g1", "path": "g1_005.log.1"}]},
            action="deltacommit")
    got = {(r["id"], r["v"])
           for r in hudilog.read_hudi_table(spark, d).collect()}
    assert got == {(0, 0), (1, 999), (2, 222), (3, 333), (4, 40), (9, 90)}
