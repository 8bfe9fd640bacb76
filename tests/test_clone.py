"""Zero-copy CLONE (VERDICT r5 item 2 — the Neon branch-creation motif
[ref neon:2-7], Delta SHALLOW CLONE statement shape): ``CREATE TABLE b
CLONE a [VERSION AS OF n]`` forks a table as a metadata-only commit
carrying the source snapshot's files by reference; the two histories
diverge independently and the clone's vacuum can never touch source
data."""

from __future__ import annotations

import glob
import os

import pytest

from duckdb_read_spark import iceberglog, snapshots
from duckdb_read_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))


def _data_files(table_dir):
    return sorted(glob.glob(os.path.join(table_dir, "data", "**",
                                         "*.parquet"), recursive=True))


def test_clone_forks_and_diverges(eng, tmp_path):
    eng.sql("CREATE TABLE src AS SELECT * FROM range(100) ")
    eng.sql("INSERT INTO src SELECT * FROM range(100, 120)")
    out = eng.sql("CREATE TABLE b CLONE src").collect()
    assert out[0]["files"] >= 1
    # zero copy: the clone dir holds NO data files of its own yet
    assert _data_files(eng._versioned["b"]) == []
    assert eng.sql("SELECT count(*) AS n FROM b").first()["n"] == 120

    # diverge both sides; neither sees the other's writes
    eng.sql("INSERT INTO b SELECT * FROM range(1000, 1005)")
    eng.sql("DELETE FROM src WHERE id >= 100")
    assert eng.sql("SELECT count(*) AS n FROM b").first()["n"] == 125
    assert eng.sql("SELECT count(*) AS n FROM src").first()["n"] == 100
    # each side time-travels its OWN history
    assert eng.sql(
        "SELECT count(*) AS n FROM b VERSION AS OF 1").first()["n"] == 120
    assert eng.sql(
        "SELECT count(*) AS n FROM src VERSION AS OF 2").first()["n"] == 120

    # VERSION AS OF clone: fork from the pre-INSERT snapshot
    eng.sql("CREATE TABLE b0 CLONE src VERSION AS OF 1")
    assert eng.sql("SELECT count(*) AS n FROM b0").first()["n"] == 100

    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE TABLE b CLONE src")


def test_clone_carries_alter_ledger_and_constraints(eng):
    eng.sql("CREATE TABLE csrc (k INT NOT NULL, v STRING)")
    eng.sql("INSERT INTO csrc VALUES (1, 'a')")
    eng.sql("ALTER TABLE csrc ADD COLUMN extra DOUBLE")
    eng.sql("CREATE TABLE cdst CLONE csrc")
    row = eng.sql("SELECT k, v, extra FROM cdst").first()
    assert (row["k"], row["v"], row["extra"]) == (1, "a", None)
    with pytest.raises(ValueError, match="NOT NULL"):
        eng.sql("INSERT INTO cdst VALUES (NULL, 'x', 1.0)")


def test_clone_vacuum_never_deletes_source_files(eng, spark):
    eng.sql("CREATE TABLE vsrc AS SELECT * FROM range(50)")
    eng.sql("CREATE TABLE vb CLONE vsrc")
    src_files = _data_files(eng._versioned["vsrc"])
    assert src_files
    # overwrite the clone, then vacuum it down to one snapshot — the
    # carried source files leave the clone's log but must stay on disk
    eng.write_versioned(spark.range(5), eng._versioned["vb"],
                        mode="overwrite")
    stats = snapshots.vacuum(eng._versioned["vb"], keep_last=1)
    assert stats["removed_versions"] >= 1
    assert _data_files(eng._versioned["vsrc"]) == src_files
    assert eng.sql("SELECT count(*) AS n FROM vsrc").first()["n"] == 50


def test_clone_from_foreign_iceberg_dir(eng, spark, tmp_path):
    d = str(tmp_path / "ice_src")
    iceberglog.write_table(
        spark.range(0, 30).withColumnRenamed("id", "k"), d)
    eng.sql(f"CREATE TABLE from_ice CLONE '{d}'")
    assert eng.sql("SELECT count(*) AS n FROM from_ice").first()["n"] == 30
    # the fork now takes native DML the foreign reader couldn't
    eng.sql("DELETE FROM from_ice WHERE k < 10")
    assert eng.sql("SELECT count(*) AS n FROM from_ice").first()["n"] == 20
    # source untouched
    assert iceberglog.read_iceberg_table(spark, d).count() == 30


def test_clone_timestamp_as_of_and_shallow_keyword(eng):
    import time

    eng.sql("CREATE TABLE tsrc AS SELECT * FROM range(10)")
    time.sleep(0.05)
    cut_ms = int(time.time() * 1000)
    time.sleep(0.05)
    eng.sql("INSERT INTO tsrc SELECT * FROM range(10, 15)")
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(cut_ms / 1000, tz=timezone.utc) \
        .strftime("%Y-%m-%d %H:%M:%S.%f")
    eng.sql(f"CREATE TABLE tb SHALLOW CLONE tsrc TIMESTAMP AS OF '{ts}'")
    assert eng.sql("SELECT count(*) AS n FROM tb").first()["n"] == 10


def test_clone_renamed_iceberg_refuses(eng, spark, tmp_path):
    """Review r6-2: a file-reference CLONE of a flat-renamed Iceberg
    table would later be read name-based (no field-id projection on
    private manifests) — refuse instead of silently splitting the
    column."""
    import json as _json

    from duckdb_read_spark import iceberglog

    d = str(tmp_path / "ice_ren_clone")
    iceberglog.write_table(
        spark.createDataFrame([(1, 2.0)], "k long, v double")
        .coalesce(1), d)
    meta_path = iceberglog._metadata_path(d)
    meta = _json.loads(open(meta_path).read())
    meta["schemas"] = [
        {"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "double"}]},
        {"schema-id": 1, "type": "struct", "fields": [
            {"id": 1, "name": "kk", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "double"}]},
    ]
    meta["current-schema-id"] = 1
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    from duckdb_read_spark import snapshots as _snap

    with pytest.raises(NotImplementedError, match="renamed"):
        _snap.clone(d, str(tmp_path / "icecl"))
