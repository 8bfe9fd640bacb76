"""Iceberg table-format read interop (VERDICT r5 item 1): a foreign
directory holding spec-shaped Iceberg ``metadata/`` (vN.metadata.json →
manifest-list avro → manifest avro → parquet data files) is readable,
time-travelable, and ATTACH-discoverable — the metadata-lake motif the
reference's notes center on (/root/reference/metadata:1-2,38-39).

The fixture builder below writes the spec shapes by hand (real Avro
object container files via avroio, v2 metadata JSON) — there is no
Iceberg library in this environment, which is exactly why the engine
carries its own reader."""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest

from duckdb_read_spark import avroio, iceberglog
from duckdb_read_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark=spark, warehouse_dir=str(tmp_path / "wh"))


# ---------------------------------------------------------------- fixture
# Spec-shaped Avro schemas (Iceberg spec "Manifest Lists" / "Manifests",
# field-ids included as the spec requires).

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102,
                 "type": {"type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
            ]}},
    ],
}


class IcebergFixture:
    """Builds a v2 Iceberg metadata tree over spark-written parquet.
    Each commit = one manifest (new files ADDED=1, carried EXISTING=0),
    one manifest list, one vN.metadata.json + version-hint."""

    def __init__(self, spark, table_dir: str, codec: str = "null"):
        self.spark = spark
        self.dir = table_dir
        self.codec = codec
        self.uuid = str(uuid.uuid4())
        self.snapshots: list[dict] = []
        self.live: list[str] = []       # rel data-file paths, current state
        os.makedirs(os.path.join(table_dir, "metadata"), exist_ok=True)

    def commit(self, df, mode: str = "append") -> int:
        seq = len(self.snapshots) + 1
        snap_id = 1000 + seq            # deterministic, spec allows any i64
        ddir = os.path.join(self.dir, "data", f"s{seq}")
        df.write.mode("overwrite").parquet(ddir)
        new = sorted(
            os.path.join("data", f"s{seq}", f)
            for f in os.listdir(ddir) if f.endswith(".parquet"))
        carried = [] if mode == "overwrite" else list(self.live)
        self.live = carried + new
        entries = []
        for status, paths in ((1, new), (0, carried)):
            for rel in paths:
                full = os.path.join(self.dir, rel)
                entries.append({
                    "status": status, "snapshot_id": snap_id,
                    "sequence_number": seq,
                    "data_file": {
                        "content": 0,
                        # spec stores absolute URIs under the table location
                        "file_path": f"file://{self.dir}/{rel}",
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": 0,
                        "file_size_in_bytes": os.path.getsize(full),
                    }})
        mpath = os.path.join(self.dir, "metadata", f"m{seq}.avro")
        avroio.write_container(mpath, MANIFEST_ENTRY_SCHEMA, entries,
                               codec=self.codec)
        ml_path = os.path.join(self.dir, "metadata",
                               f"snap-{snap_id}-1-{self.uuid[:8]}.avro")
        avroio.write_container(ml_path, MANIFEST_FILE_SCHEMA, [{
            "manifest_path": f"file://{mpath}",
            "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": 0, "content": 0,
            "sequence_number": seq, "min_sequence_number": 1,
            "added_snapshot_id": snap_id,
            "added_files_count": len(new),
            "existing_files_count": len(carried),
            "deleted_files_count": 0,
            "added_rows_count": 0, "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }], codec=self.codec)
        self.snapshots.append({
            "snapshot-id": snap_id, "sequence-number": seq,
            "timestamp-ms": int(time.time() * 1000) + seq,
            "manifest-list": f"file://{ml_path}",
            "summary": {"operation": mode},
        })
        meta = {
            "format-version": 2, "table-uuid": self.uuid,
            "location": f"file://{self.dir}",
            "last-sequence-number": seq,
            "last-updated-ms": self.snapshots[-1]["timestamp-ms"],
            "last-column-id": len(df.schema.fields),
            "schemas": [{"schema-id": 0, "type": "struct", "fields": [
                {"id": i + 1, "name": f.name, "required": False,
                 "type": "long" if f.dataType.simpleString() == "bigint"
                 else f.dataType.simpleString()}
                for i, f in enumerate(df.schema.fields)]}],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "current-snapshot-id": snap_id,
            "snapshots": self.snapshots,
            "snapshot-log": [{"snapshot-id": s["snapshot-id"],
                              "timestamp-ms": s["timestamp-ms"]}
                             for s in self.snapshots],
        }
        with open(os.path.join(self.dir, "metadata",
                               f"v{seq}.metadata.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(self.dir, "metadata",
                               "version-hint.text"), "w") as f:
            f.write(str(seq))
        return snap_id


# ----------------------------------------------------------------- avroio

def test_avro_container_roundtrip_all_types(tmp_path):
    schema = {
        "type": "record", "name": "kitchen", "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "nested", "type": {
                "type": "record", "name": "inner", "fields": [
                    {"name": "x", "type": "long"}]}},
            {"name": "nested2", "type": "inner"},   # named-type reference
            {"name": "e", "type": {"type": "enum", "name": "col",
                                   "symbols": ["RED", "BLUE"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "f8",
                                    "size": 3}},
        ],
    }
    recs = [
        {"s": "héllo", "i": -1, "l": 2**40, "d": 1.5, "b": True,
         "u": None, "arr": ["a", "b"], "m": {"k": 7},
         "nested": {"x": 1}, "nested2": {"x": -9}, "e": "BLUE",
         "fx": b"abc"},
        {"s": "", "i": 0, "l": -(2**40), "d": -0.25, "b": False,
         "u": 123, "arr": [], "m": {},
         "nested": {"x": 0}, "nested2": {"x": 0}, "e": "RED",
         "fx": b"xyz"},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        avroio.write_container(p, schema, recs, codec=codec)
        got_schema, got = avroio.read_container(p)
        assert got == recs
        assert got_schema["name"] == "kitchen"


def test_avro_unknown_codec_raises(tmp_path):
    p = str(tmp_path / "t.avro")
    avroio.write_container(p, {"type": "record", "name": "r", "fields": [
        {"name": "x", "type": "long"}]}, [{"x": 1}])
    raw = open(p, "rb").read().replace(b"null", b"zstd", 1)
    open(p, "wb").write(raw)
    with pytest.raises(NotImplementedError):
        avroio.read_container(p)


# ---------------------------------------------------------------- iceberg

def test_read_iceberg_snapshot_and_time_travel(eng, spark, tmp_path):
    d = str(tmp_path / "ice")
    fx = IcebergFixture(spark, d, codec="deflate")  # Java writer's codec
    fx.commit(spark.range(0, 100).withColumnRenamed("id", "k").coalesce(3))
    fx.commit(spark.range(100, 110).withColumnRenamed("id", "k")
              .coalesce(1), mode="append")

    eng.register_versioned("ice", d)
    assert eng.sql("SELECT count(*) AS n FROM ice").first()["n"] == 110
    # VERSION AS OF: 1-based chronological index AND native snapshot-id
    assert eng.sql(
        "SELECT count(*) AS n FROM ice VERSION AS OF 1").first()["n"] == 100
    assert eng.sql(
        "SELECT count(*) AS n FROM ice VERSION AS OF 1002").first()["n"] == 110
    # overwrite snapshot drops earlier files from the current set
    fx.commit(spark.range(0, 7).withColumnRenamed("id", "k").coalesce(1),
              mode="overwrite")
    eng.register_versioned("ice", d)
    assert eng.sql("SELECT count(*) AS n FROM ice").first()["n"] == 7
    assert eng.sql(
        "SELECT count(*) AS n FROM ice VERSION AS OF 2").first()["n"] == 110
    # history surfaces all three snapshots, newest first
    hist = eng.table_history("ice")
    assert [h["version"] for h in hist] == [3, 2, 1]
    assert hist[0]["operation"] == "overwrite"


def test_iceberg_attach_discovery(eng, spark, tmp_path):
    wh = tmp_path / "lake"
    d = str(wh / "ice_t")
    fx = IcebergFixture(spark, d)
    fx.commit(spark.range(0, 42).coalesce(1))
    tables = eng.attach(str(wh), db="lake")
    assert "ice_t" in tables
    assert eng.sql("SELECT count(*) AS n FROM lake.ice_t").first()["n"] == 42


def test_iceberg_relocated_table_paths_reroot(eng, spark, tmp_path):
    """metadata stores absolute file:// URIs under `location`; a COPIED
    table dir must still resolve (paths re-rooted onto the new dir)."""
    import shutil

    d = str(tmp_path / "orig")
    fx = IcebergFixture(spark, d)
    fx.commit(spark.range(0, 9).coalesce(1))
    moved = str(tmp_path / "moved")
    shutil.copytree(d, moved)
    shutil.rmtree(d)  # the recorded location no longer exists
    df = iceberglog.read_iceberg_table(spark, moved)
    assert df.count() == 9


def test_iceberg_positional_deletes_apply(eng, spark, tmp_path):
    """v2 merge-on-read, positional: a delete snapshot removes rows by
    (target file, row position); time travel to the pre-delete snapshot
    still sees them; files-by-reference consumers (CLONE/COPY contract
    = snapshot_data_files) refuse rather than resurrect deleted rows."""
    d = str(tmp_path / "ice_posdel")
    df = (spark.range(0, 10).withColumnRenamed("id", "k")
          .coalesce(1).sortWithinPartitions("k"))
    iceberglog.write_table(df, d)                        # seq 1
    (target,) = iceberglog.snapshot_data_files(d)
    iceberglog.write_deletes(d, pos={target: [1, 3, 7]})  # seq 2
    got = {r.k for r in iceberglog.read_iceberg_table(spark, d).collect()}
    assert got == {0, 2, 4, 5, 6, 8, 9}
    # pre-delete snapshot unaffected
    assert iceberglog.read_iceberg_table(spark, d, version=1).count() == 10
    # engine surface: registered reads apply deletes, VERSION AS OF works
    eng.register_versioned("ipd", d)
    assert eng.sql("SELECT count(*) AS n FROM ipd").first()["n"] == 7
    assert eng.sql(
        "SELECT count(*) AS n FROM ipd VERSION AS OF 1").first()["n"] == 10
    # files-by-reference contract refuses live deletes
    with pytest.raises(NotImplementedError, match="row-level delete"):
        iceberglog.snapshot_data_files(d)


def test_iceberg_equality_deletes_sequence_scoped(eng, spark, tmp_path):
    """v2 merge-on-read, equality: a delete row removes matching data
    rows ONLY from strictly older sequences (spec scoping) and matches
    NULL null-safely."""
    d = str(tmp_path / "ice_eqdel")
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "n")], "k long, v string")
    iceberglog.write_table(old.coalesce(1), d)           # seq 1
    new = spark.createDataFrame([(2, "b2"), (9, "z")], "k long, v string")
    iceberglog.write_table(new.coalesce(1), d, mode="append")  # seq 2
    # delete k IN (2, NULL) at seq 3: kills seq-1 (2,'b') and (NULL,'n'),
    # keeps the seq-2 re-insert (2,'b2')? no — seq 2 < 3, killed too.
    iceberglog.write_deletes(d, eq_rows=[{"k": 2}, {"k": None}],
                             eq_ids=[1])                 # seq 3
    got = {(r.k, r.v) for r in
           iceberglog.read_iceberg_table(spark, d).collect()}
    assert got == {(1, "a"), (3, "c"), (9, "z")}
    # strict scoping: a delete at the SAME sequence as a data file must
    # not touch it — fabricate by lowering the delete's seq to 2
    d2 = str(tmp_path / "ice_eqdel2")
    iceberglog.write_table(old.coalesce(1), d2)          # seq 1
    iceberglog.write_table(new.coalesce(1), d2, mode="append")  # seq 2
    iceberglog.write_deletes(d2, eq_rows=[{"k": 2}], eq_ids=[1])  # seq 3
    # rewrite the delete manifest entry's sequence_number to 2
    meta = iceberglog.table_metadata(d2)
    snap = iceberglog.snapshots_chrono(meta)[-1]
    ml = snap["manifest-list"].replace("file://", "")
    mls_schema, mls = avroio.read_container(ml)
    for mf in mls:
        if mf["content"] == 1:
            mpath = mf["manifest_path"].replace("file://", "")
            sch, entries = avroio.read_container(mpath)
            for e in entries:
                e["sequence_number"] = 2
            avroio.write_container(mpath, sch, entries)
    got2 = {(r.k, r.v) for r in
            iceberglog.read_iceberg_table(spark, d2).collect()}
    # seq-1 (2,'b') deleted (1 < 2); seq-2 (2,'b2') SURVIVES (2 !< 2)
    assert got2 == {(1, "a"), (3, "c"), (None, "n"), (2, "b2"), (9, "z")}


def test_iceberg_pos_deletes_scoped_and_combined(eng, spark, tmp_path):
    """Positional deletes apply to data sequences <= the delete's own
    sequence; a data file appended AFTER the delete snapshot is
    untouched even though positions overlap. Positional + equality in
    one table compose."""
    d = str(tmp_path / "ice_mixdel")
    a = (spark.range(0, 5).withColumnRenamed("id", "k")
         .coalesce(1).sortWithinPartitions("k"))
    iceberglog.write_table(a, d)                         # seq 1
    (f1,) = iceberglog.snapshot_data_files(d)
    iceberglog.write_deletes(d, pos={f1: [0, 1]})        # seq 2: drop 0,1
    b = (spark.range(100, 103).withColumnRenamed("id", "k")
         .coalesce(1).sortWithinPartitions("k"))
    # append after the delete — write_table's files-by-reference carry
    # refuses under live deletes, so append via a fresh manifest is not
    # available; assert the refusal is loud (honest fence), then check
    # the combined read
    with pytest.raises(NotImplementedError, match="row-level delete"):
        iceberglog.write_table(b, d, mode="append")
    iceberglog.write_deletes(d, eq_rows=[{"k": 4}], eq_ids=[1])  # seq 3
    got = {r.k for r in iceberglog.read_iceberg_table(spark, d).collect()}
    assert got == {2, 3}


def test_iceberg_write_table_roundtrip(eng, spark, tmp_path):
    """EXPORT direction: iceberglog.write_table emits spec-shaped v2
    metadata (checked against the reader AND structurally: field-ids,
    name-mapping property, deflate manifests); append snapshots carry
    prior files as EXISTING entries; time travel works."""
    d = str(tmp_path / "ice_w")
    df1 = spark.range(0, 50).withColumnRenamed("id", "k")
    sid1 = iceberglog.write_table(df1, d)
    df2 = spark.range(50, 60).withColumnRenamed("id", "k")
    sid2 = iceberglog.write_table(df2, d, mode="append")
    assert sid1 != sid2

    assert iceberglog.read_iceberg_table(spark, d).count() == 60
    assert iceberglog.read_iceberg_table(spark, d, version=1).count() == 50
    assert iceberglog.read_iceberg_table(spark, d, version=sid1).count() == 50

    meta = iceberglog.table_metadata(d)
    assert meta["format-version"] == 2
    assert "schema.name-mapping.default" in meta.get("properties", {})
    assert [f["id"] for f in meta["schemas"][0]["fields"]] == [1]
    # manifest entries carry spec field shapes; append manifest holds
    # both ADDED and EXISTING entries (self-contained snapshot)
    snap2 = [s for s in meta["snapshots"] if s["snapshot-id"] == sid2][0]
    _, mls = avroio.read_container(
        snap2["manifest-list"].replace("file://", ""))
    assert mls[0]["existing_files_count"] >= 1
    _, entries = avroio.read_container(
        mls[0]["manifest_path"].replace("file://", ""))
    statuses = {e["status"] for e in entries}
    assert statuses == {0, 1}
    assert all(e["data_file"]["record_count"] > 0 for e in entries)
    # registered through the normal engine path too
    eng.register_versioned("icew", d)
    assert eng.sql(
        "SELECT count(*) AS n FROM icew VERSION AS OF 1").first()["n"] == 50


def test_iceberg_timestamp_as_of_sql(eng, spark, tmp_path):
    """TIMESTAMP AS OF over a foreign Iceberg table resolves through the
    Iceberg snapshot log (no private _log to consult)."""
    from datetime import datetime, timezone

    d = str(tmp_path / "ice_ts")
    t1 = 1_700_000_000_000
    t2 = t1 + 3_600_000
    iceberglog.write_table(spark.range(0, 10), d, timestamp_ms=t1)
    iceberglog.write_table(spark.range(10, 25), d, mode="append",
                           timestamp_ms=t2)
    eng.register_versioned("ice_ts", d)
    mid = datetime.fromtimestamp((t1 + t2) / 2000, tz=timezone.utc) \
        .strftime("%Y-%m-%d %H:%M:%S")
    n = eng.sql(
        f"SELECT count(*) AS n FROM ice_ts TIMESTAMP AS OF '{mid}'"
    ).first()["n"]
    assert n == 10
    late = datetime.fromtimestamp(t2 / 1000 + 60, tz=timezone.utc) \
        .strftime("%Y-%m-%d %H:%M:%S")
    n2 = eng.sql(
        f"SELECT count(*) AS n FROM ice_ts TIMESTAMP AS OF '{late}'"
    ).first()["n"]
    assert n2 == 25


def test_copy_to_iceberg_format(eng, spark, tmp_path):
    """COPY t TO 'dir' (FORMAT ICEBERG): SQL-reachable Iceberg export —
    first COPY creates the table, a second appends a snapshot."""
    d = str(tmp_path / "ice_copy")
    eng.sql("CREATE TABLE csrc2 AS SELECT id AS k FROM range(30)")
    eng.sql(f"COPY csrc2 TO '{d}' (FORMAT ICEBERG)")
    assert iceberglog.read_iceberg_table(spark, d).count() == 30
    eng.sql(f"COPY (SELECT CAST(999 AS BIGINT) AS k) TO '{d}' "
            f"(FORMAT ICEBERG)")
    assert iceberglog.read_iceberg_table(spark, d).count() == 31
    assert iceberglog.read_iceberg_table(spark, d, version=1).count() == 30


def test_iceberg_renamed_column_refuses(eng, spark, tmp_path):
    """Iceberg resolves columns by field id; a rename leaves old files
    under the old name, and a name-based read would split the column into
    two half-NULL ones — the reader must refuse, not mis-read."""
    d = str(tmp_path / "ice_ren")
    iceberglog.write_table(spark.range(5).withColumnRenamed("id", "k"), d)
    meta_path = iceberglog._metadata_path(d)
    meta = json.loads(open(meta_path).read())
    # simulate a rename: second schema gives field id 1 a new name
    meta["schemas"].append({"schema-id": 1, "type": "struct", "fields": [
        {"id": 1, "name": "k_renamed", "required": False, "type": "long"}]})
    meta["current-schema-id"] = 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(NotImplementedError, match="rename"):
        iceberglog.read_iceberg_table(spark, d)


def test_iceberg_nested_struct_rename_refuses(eng, spark, tmp_path):
    """Review r6: a rename of a NESTED struct member is the same
    field-id-vs-name hazard as a top-level rename — the guard must
    recurse into struct/list/map types, not just top-level fields."""
    d = str(tmp_path / "ice_nren")
    iceberglog.write_table(spark.range(3).withColumnRenamed("id", "k"), d)
    meta_path = iceberglog._metadata_path(d)
    meta = json.loads(open(meta_path).read())
    nested = {"id": 7, "name": "info", "required": False, "type": {
        "type": "struct", "fields": [
            {"id": 8, "name": "amt", "required": False, "type": "double"}]}}
    meta["schemas"][0]["fields"].append(nested)
    renamed = {"id": 7, "name": "info", "required": False, "type": {
        "type": "struct", "fields": [
            {"id": 8, "name": "amount", "required": False,
             "type": "double"}]}}
    meta["schemas"].append({"schema-id": 1, "type": "struct", "fields": [
        dict(meta["schemas"][0]["fields"][0]), renamed]})
    meta["current-schema-id"] = 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(NotImplementedError, match="rename"):
        iceberglog.read_iceberg_table(spark, d)


def test_iceberg_append_to_v1_table(eng, spark, tmp_path):
    """Review r6: foreign format-version-1 tables have no
    last-sequence-number key (a v2 addition) — appending must work, not
    KeyError."""
    d = str(tmp_path / "ice_v1")
    iceberglog.write_table(spark.range(5).withColumnRenamed("id", "k"), d)
    meta_path = iceberglog._metadata_path(d)
    meta = json.loads(open(meta_path).read())
    meta["format-version"] = 1
    meta.pop("last-sequence-number", None)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    iceberglog.write_table(
        spark.range(5, 8).withColumnRenamed("id", "k"), d, mode="append")
    rows = {r.k for r in iceberglog.read_iceberg_table(spark, d).collect()}
    assert rows == set(range(8))


def test_iceberg_flat_rename_field_id_projection(eng, spark, tmp_path):
    """Top-level renames now READ correctly when data files carry the
    PARQUET:field_id metadata real Iceberg writers stamp: files from
    before and after the rename resolve to the current name by field id
    and union into one column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def rewrite(path, table, schema):
        pq.write_table(pa.table(table, schema=schema), path)
        crc = os.path.join(os.path.dirname(path),
                           "." + os.path.basename(path) + ".crc")
        if os.path.exists(crc):   # stale Spark checksum sidecar
            os.remove(crc)

    d = str(tmp_path / "ice_fid")
    # start from a writer-produced table to get valid manifests
    iceberglog.write_table(
        spark.createDataFrame([(1, 10.0)], "k long, v double")
        .coalesce(1), d)
    meta_path = iceberglog._metadata_path(d)
    meta = json.loads(open(meta_path).read())
    data_files = iceberglog.snapshot_data_files(d)
    # rewrite the data files with explicit field ids: generation 1 under
    # the OLD name k (id 1), generation 2 under the NEW name kk (id 1)
    f_old = pa.schema([
        pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field("v", pa.float64(), metadata={b"PARQUET:field_id": b"2"}),
    ])
    assert len(data_files) == 1
    rewrite(data_files[0], {"k": [1, 2], "v": [10.0, 20.0]}, f_old)
    f_new = pa.schema([
        pa.field("kk", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field("v", pa.float64(), metadata={b"PARQUET:field_id": b"2"}),
    ])
    # append a post-rename generation through the writer machinery, then
    # swap the appended file's bytes for a field-id-stamped version
    iceberglog.write_table(
        spark.createDataFrame([(99, 0.0)], "kk long, v double")
        .coalesce(1), d, mode="append")
    newest = [p for p in iceberglog.snapshot_data_files(d)
              if p not in data_files]
    assert len(newest) == 1
    rewrite(newest[0], {"kk": [3], "v": [30.0]}, f_new)
    # declare the rename in the schema history: schema 0 has k, schema 1
    # (current) has kk for the SAME field id
    meta_path = iceberglog._metadata_path(d)
    meta = json.loads(open(meta_path).read())
    sch0 = {"schema-id": 0, "type": "struct", "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"}]}
    sch1 = {"schema-id": 1, "type": "struct", "fields": [
        {"id": 1, "name": "kk", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"}]}
    meta["schemas"] = [sch0, sch1]
    meta["current-schema-id"] = 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    df = iceberglog.read_iceberg_table(spark, d)
    assert df.columns == ["kk", "v"]
    got = {(r.kk, r.v) for r in df.collect()}
    assert got == {(1, 10.0), (2, 20.0), (3, 30.0)}


def test_iceberg_partition_scoped_equality_delete_refuses(eng, spark,
                                                          tmp_path):
    """Review r6: a partition-scoped equality delete applies only
    within its partition per spec; this reader applies eq deletes
    globally, so the scoped form must refuse, not drop rows from other
    partitions."""
    d = str(tmp_path / "ice_eqpart")
    iceberglog.write_table(
        spark.createDataFrame([(1, "a")], "k long, v string")
        .coalesce(1), d)
    iceberglog.write_deletes(d, eq_rows=[{"k": 1}], eq_ids=[1])
    # patch the delete manifest entry's partition record to a non-null
    # value (simulating a partitioned-spec writer)
    meta = iceberglog.table_metadata(d)
    snap = iceberglog.snapshots_chrono(meta)[-1]
    ml = snap["manifest-list"].replace("file://", "")
    _, mls = avroio.read_container(ml)
    for mf in mls:
        if mf["content"] == 1:
            mpath = mf["manifest_path"].replace("file://", "")
            sch, entries = avroio.read_container(mpath)
            part_schema = {"type": "record", "name": "rp", "fields": [
                {"name": "day", "type": ["null", "string"]}]}
            for fld in sch["fields"]:
                if fld["name"] == "data_file":
                    for f2 in fld["type"]["fields"]:
                        if f2["name"] == "partition":
                            f2["type"] = part_schema
            for e in entries:
                e["data_file"]["partition"] = {"day": "2024-01-01"}
            avroio.write_container(mpath, sch, entries)
    with pytest.raises(NotImplementedError, match="PARTITION-SCOPED"):
        iceberglog.read_iceberg_table(spark, d)


def test_iceberg_metadata_version_no_clobber(eng, spark, tmp_path):
    """Review r6: metadata file number and sequence number are
    independent counters — a foreign table with MORE metadata versions
    than sequence numbers must not have an existing vN.metadata.json
    clobbered by the next commit."""
    import shutil

    d = str(tmp_path / "ice_mv")
    iceberglog.write_table(spark.range(3).withColumnRenamed("id", "k"), d)
    mdir = os.path.join(d, "metadata")
    # simulate two metadata-only commits: v2/v3 exist, seq stays 1
    shutil.copy(os.path.join(mdir, "v1.metadata.json"),
                os.path.join(mdir, "v2.metadata.json"))
    shutil.copy(os.path.join(mdir, "v1.metadata.json"),
                os.path.join(mdir, "v3.metadata.json"))
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("3")
    before = open(os.path.join(mdir, "v2.metadata.json")).read()
    iceberglog.write_table(
        spark.range(3, 5).withColumnRenamed("id", "k"), d, mode="append")
    # seq advanced to 2, but v2/v3 survive — new metadata landed at v4
    assert open(os.path.join(mdir, "v2.metadata.json")).read() == before
    assert os.path.exists(os.path.join(mdir, "v4.metadata.json"))
    assert open(os.path.join(mdir, "version-hint.text")).read() == "4"
    rows = {r.k for r in iceberglog.read_iceberg_table(spark, d).collect()}
    assert rows == {0, 1, 2, 3, 4}
