"""Apache Hudi copy-on-write table reader (foreign-format interop).

Completes the open-table-format trio the reference's metadata notes
center on (/root/reference/metadata:1-5 — Delta/Iceberg/Hudi): deltalog.py
mirrors + reads Delta, iceberglog.py reads/writes Iceberg, and this module
READS a foreign Hudi COPY_ON_WRITE table from its ``.hoodie/`` timeline —
no Hudi jar, no Avro dependency, just the published table layout
(https://hudi.apache.org/tech-specs/):

* ``.hoodie/hoodie.properties`` — table name/type/version (java properties).
* Timeline: ``.hoodie/{instant}.{action}`` files. A COMPLETED commit is
  ``{ts}.commit`` or ``{ts}.replacecommit`` (Hudi 1.x names completed
  instants ``{ts}_{completion_ts}.{action}``); ``*.requested`` /
  ``*.inflight`` are pending and must be IGNORED (reading an inflight
  write's files would surface uncommitted data).
* A ``.commit`` file is JSON with ``partitionToWriteStats``: per partition,
  the written file's ``path`` (relative to the table root) and ``fileId``.
  Successive commits to the same FILE GROUP (fileId) replace the previous
  base file — snapshot state keeps only the newest committed slice per
  fileId.
* ``.replacecommit`` additionally carries ``partitionToReplaceFileIds``
  (clustering / insert_overwrite): those file groups are REMOVED from the
  snapshot — ignoring them would return overwritten rows as live.

Unlike Delta, Hudi data files physically CONTAIN the partition columns
(and the ``_hoodie_*`` meta columns), so the read is a plain parquet scan
of the selected file list — no partition-value reattachment needed.

r7 adds the MERGE_ON_READ read path: the HoodieLogFormat block reader
(framing per the published tech-specs with every length field
cross-checked), avro_data record decoding on top of avroio's binary
codec, and the read-path compaction merge (newest base slice + ordered
log records, latest per ``_hoodie_record_key``). Honest refusals:
delete/command/cdc log blocks, pre-length-prefix avro block versions,
non-primitive Avro fields, virtual-key tables and base/log schema
drift raise instead of mis-merging; unknown timeline actions still
raise instead of mis-reading.

Scale shape: the timeline is O(commits) small driver-side files; file
selection is pure metadata; data I/O stays one distributed parquet scan.
Time travel addresses instants by their timestamp string or by 1-based
chronological index (uniform with the private snapshot-log numbering).
"""

from __future__ import annotations

import json
import os
import re

_HOODIE_DIR = ".hoodie"

# completed instants only; Hudi 1.x appends _completionTime before the ext
_INSTANT_RE = re.compile(
    r"^(?P<ts>\d+)(?:_\d+)?\.(?P<action>commit|replacecommit)$")
_PENDING_RE = re.compile(
    r"^\d+(?:_\d+)?\.(commit|replacecommit|deltacommit|compaction)"
    r"\.(requested|inflight)$")
_MOR_RE = re.compile(r"^\d+(?:_\d+)?\.(deltacommit|compaction)$")


def is_hudi_table(table_dir: str) -> bool:
    return os.path.isfile(
        os.path.join(table_dir, _HOODIE_DIR, "hoodie.properties"))


def _properties(table_dir: str) -> dict[str, str]:
    props: dict[str, str] = {}
    path = os.path.join(table_dir, _HOODIE_DIR, "hoodie.properties")
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            if "=" in line:
                k, _, v = line.partition("=")
                props[k.strip()] = v.strip()
    return props


def timeline(table_dir: str) -> list[tuple[str, str, str]]:
    """Completed (instant_ts, action, filename) triples, chronological.
    Ordering is numeric-safe — Hudi timestamps are fixed-width digit
    strings, but an unpadded foreign timeline ('9' vs '10') must not
    replay lexicographically or a stale base slice wins. MOR-only
    actions (deltacommit/compaction) raise — a base-file read of a
    MERGE_ON_READ table silently loses the un-compacted updates."""
    d = os.path.join(table_dir, _HOODIE_DIR)
    out: list[tuple[str, str, str]] = []
    for f in sorted(os.listdir(d)):
        if _PENDING_RE.match(f):
            continue  # pending: not part of the committed snapshot
        if _MOR_RE.match(f):
            raise NotImplementedError(
                f"Hudi MERGE_ON_READ timeline action {f!r} in a "
                f"COPY_ON_WRITE replay — a base-file-only read would "
                f"silently drop updates; MOR tables route through "
                f"read_mor_table (hoodie.properties table type)")
        m = _INSTANT_RE.match(f)
        if m:
            out.append((m.group("ts"), m.group("action"), f))
    out.sort(key=lambda x: (len(x[0]), x[0]))
    return out


def _read_instant(table_dir: str, fname: str) -> dict:
    with open(os.path.join(table_dir, _HOODIE_DIR, fname)) as fh:
        body = fh.read().strip()
    return json.loads(body) if body else {}


def snapshot_files(table_dir: str,
                   instant: str | int | None = None) -> list[str]:
    """Relative base-file paths of the snapshot at ``instant`` (latest
    when None; a timestamp string, or a 1-based chronological index).

    Replay: newest committed file slice per file group wins; replaced
    file groups drop out."""
    tl = timeline(table_dir)
    if not tl:
        raise FileNotFoundError(
            f"no completed commits in {table_dir!r}/.hoodie")
    if instant is None:
        upto = len(tl)
    elif isinstance(instant, int):
        # an int addresses the 1-based chronological index (uniform with
        # the private snapshot-log numbering)
        if not 1 <= instant <= len(tl):
            raise LookupError(
                f"hudi instant index {instant} not in 1..{len(tl)}")
        upto = instant
    else:
        # a string must match a committed instant TIMESTAMP exactly —
        # guessing "short string means index" would silently read the
        # wrong snapshot for unpadded foreign timelines
        tss = [ts for ts, _, _ in tl]
        if str(instant) not in tss:
            raise LookupError(
                f"hudi instant {instant!r} not in timeline (have {tss})")
        upto = tss.index(str(instant)) + 1

    by_group: dict[str, tuple[str, str]] = {}   # fileId -> (ts, rel path)
    for ts, action, fname in tl[:upto]:
        body = _read_instant(table_dir, fname)
        if action == "replacecommit":
            for _, fids in (body.get("partitionToReplaceFileIds")
                            or {}).items():
                for fid in fids:
                    by_group.pop(fid, None)
        for _, stats in (body.get("partitionToWriteStats") or {}).items():
            for st in stats:
                fid = st.get("fileId") or st["path"]
                if st.get("path"):
                    by_group[fid] = (ts, st["path"])
    return sorted(p for _, p in by_group.values())


def read_hudi_table(spark, table_dir: str,
                    instant: str | int | None = None,
                    keep_meta: bool = False):
    """Snapshot (or time-travel) read of a COPY_ON_WRITE table. Hudi base
    files carry the five ``_hoodie_*`` meta columns; they are dropped by
    default so the result matches the user schema (``keep_meta=True``
    keeps them)."""
    props = _properties(table_dir)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype == "MERGE_ON_READ":
        return read_mor_table(spark, table_dir, instant=instant,
                              keep_meta=keep_meta)
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"hudi table type {ttype!r} not supported")
    rels = snapshot_files(table_dir, instant)
    if not rels:
        raise FileNotFoundError(f"hudi snapshot at {table_dir!r} is empty")
    df = (spark.read.option("mergeSchema", "true")
          .parquet(*[os.path.join(table_dir, p) for p in rels]))
    if not keep_meta:
        meta = [c for c in df.columns if c.startswith("_hoodie_")]
        if meta:
            df = df.drop(*meta)
    return df


def write_hudi_table(spark_df, table_dir: str, mode: str = "append",
                     timestamp_ms: int | None = None) -> str:
    """Write a DataFrame as one COPY_ON_WRITE commit in a ``.hoodie``
    timeline readable by this module's replay (and shaped per the
    published timeline layout: properties file, ``{ts}.commit`` /
    ``{ts}.replacecommit`` JSON with partitionToWriteStats).

    ``mode='append'`` adds new file groups; ``mode='overwrite'`` writes a
    REPLACECOMMIT that replaces every live file group (the
    insert_overwrite_table shape). Returns the instant timestamp.

    Honesty note: real Hudi readers additionally expect the ``_hoodie_*``
    meta COLUMNS inside data files and auxiliary metadata (markers,
    record-key config) that this writer does not produce — the export is
    a timeline-faithful interchange for THIS reader and timeline-level
    tools, not a drop-in Hudi dataset. The Delta/Iceberg writers are the
    externally-consumable paths.
    """
    import time
    import uuid as _uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    hdir = os.path.join(table_dir, _HOODIE_DIR)
    os.makedirs(hdir, exist_ok=True)
    props = os.path.join(hdir, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w") as f:
            f.write("hoodie.table.name=%s\nhoodie.table.type=COPY_ON_WRITE\n"
                    % os.path.basename(table_dir.rstrip(os.sep)))
    ms = int(time.time() * 1000) if timestamp_ms is None else timestamp_ms
    # pad to Hudi's fixed-width yyyyMMddHHmmssSSS-like monotonic digits:
    # millis since epoch, zero-padded so lexicographic == numeric, and
    # bumped past the newest existing instant if clocks collide
    existing = [ts for ts, _, _ in timeline(table_dir)]
    ts = f"{ms:017d}"
    if existing and (len(ts), ts) <= (len(existing[-1]), existing[-1]):
        # jump DIRECTLY past the newest instant: a real Hudi timeline
        # uses yyyyMMddHHmmssSSS digits (~2e16), so incrementing epoch
        # millis one-by-one would spin ~1e16 iterations
        ms = max(ms, int(existing[-1]) + 1)
        ts = f"{ms:017d}"

    replaced: dict[str, list[str]] = {}
    if mode == "overwrite" and existing:
        # replace only the LIVE file groups — honoring earlier
        # replacecommits, so the export never claims to replace an
        # already-dead group (external timeline tools would flag it)
        live: dict[str, dict[str, str]] = {}
        for t2, action, fname in timeline(table_dir):
            body = _read_instant(table_dir, fname)
            if action == "replacecommit":
                for part, fids in (body.get("partitionToReplaceFileIds")
                                   or {}).items():
                    for fid in fids:
                        live.get(part, {}).pop(fid, None)
            for part, stats in (body.get("partitionToWriteStats")
                                or {}).items():
                for st in stats:
                    live.setdefault(part, {})[
                        st.get("fileId") or st["path"]] = t2
        replaced = {p: sorted(m) for p, m in live.items() if m}

    tmp = os.path.join(table_dir, f".hoodie_tmp_{ts}")
    spark_df.write.mode("overwrite").parquet(tmp)
    stats = []
    for f in sorted(os.listdir(tmp)):
        if not f.endswith(".parquet"):
            continue
        fid = _uuid.uuid4().hex[:12]
        rel = f"{fid}_0-0-0_{ts}.parquet"
        os.replace(os.path.join(tmp, f), os.path.join(table_dir, rel))
        stats.append({"fileId": fid, "path": rel})
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    body: dict = {"partitionToWriteStats": {"": stats}}
    action = "commit"
    if replaced:
        body["partitionToReplaceFileIds"] = replaced
        action = "replacecommit"
    final = os.path.join(hdir, f"{ts}.{action}")
    with open(final + ".tmp", "w") as f:
        json.dump(body, f)
    os.replace(final + ".tmp", final)
    return ts


# --- MERGE_ON_READ: HoodieLogFormat reader (r7) ----------------------------
#
# Log-file framing per the published tech-specs (hudi.apache.org/
# tech-specs/#log-file-format), one block:
#   magic '#HUDI#' (6) | block length (8) | format version (4) |
#   block type (4) | headers map | content length (8) | content |
#   footers map | total block length (8)
# where a metadata map serializes as: count (4), then per entry
# ordinal (4) + byte length (4) + utf-8 bytes. All integers big-endian
# (Java DataOutputStream). Every length field is cross-checked while
# parsing and any mismatch raises — a foreign file with different
# framing fails LOUDLY, never silently mis-merges.

_LOG_MAGIC = b"#HUDI#"
# HoodieLogBlockType ordinals (public Hudi enum order)
_BLOCK_TYPES = ("command", "delete", "corrupt", "avro_data",
                "hfile_data", "parquet_data", "cdc_data")
# HeaderMetadataType ordinals
_HDR_INSTANT_TIME, _HDR_TARGET_INSTANT, _HDR_SCHEMA = 0, 1, 2


def _read_meta_map(buf: bytes, off: int) -> tuple[dict, int]:
    import struct as _struct

    (count,) = _struct.unpack_from(">i", buf, off)
    off += 4
    out: dict[int, str] = {}
    for _ in range(count):
        ordinal, ln = _struct.unpack_from(">ii", buf, off)
        off += 8
        out[ordinal] = buf[off:off + ln].decode("utf-8")
        off += ln
    return out, off


def read_log_blocks(path: str) -> list[dict]:
    """Parse one ``.log.N`` file into
    ``{"type", "headers", "footers", "content"}`` dicts, in file order."""
    with open(path, "rb") as f:
        return parse_log_blocks(f.read(), path)


def parse_log_blocks(buf: bytes, path: str = "<bytes>") -> list[dict]:
    import struct as _struct

    blocks: list[dict] = []
    off = 0
    while off < len(buf):
        start = off
        if buf[off:off + 6] != _LOG_MAGIC:
            raise ValueError(
                f"hudi log {path!r}: bad magic at offset {off}")
        off += 6
        (block_len,) = _struct.unpack_from(">q", buf, off)
        off += 8
        (version, btype) = _struct.unpack_from(">ii", buf, off)
        off += 8
        if btype < 0 or btype >= len(_BLOCK_TYPES):
            raise ValueError(
                f"hudi log {path!r}: unknown block type {btype}")
        headers, off = _read_meta_map(buf, off)
        (content_len,) = _struct.unpack_from(">q", buf, off)
        off += 8
        content = buf[off:off + content_len]
        if len(content) != content_len:
            raise ValueError(f"hudi log {path!r}: truncated content")
        off += content_len
        footers, off = _read_meta_map(buf, off)
        (total_len,) = _struct.unpack_from(">q", buf, off)
        off += 8
        if total_len != off - start:
            raise ValueError(
                f"hudi log {path!r}: total block length {total_len} != "
                f"parsed {off - start} — refusing a framing guess")
        blocks.append({"type": _BLOCK_TYPES[btype], "version": version,
                       "headers": headers, "footers": footers,
                       "content": content})
    return blocks


def decode_avro_data_block(content: bytes, schema_json: str) -> list[dict]:
    """Records of an avro_data block: content = block-format version
    (4, length-prefixed records need >= 2), record count (4), then per
    record length (4) + Avro BINARY datum under the header schema."""
    import json as _json
    import struct as _struct

    from .avroio import _collect_names, _read_datum, _Reader

    (bver, count) = _struct.unpack_from(">ii", content, 0)
    if bver < 2:
        raise NotImplementedError(
            f"hudi avro_data block format version {bver}: only the "
            f"length-prefixed layout (>= 2) is supported")
    schema = _json.loads(schema_json)
    names: dict = {}
    _collect_names(schema, names)
    off = 8
    out: list[dict] = []
    for _ in range(count):
        (ln,) = _struct.unpack_from(">i", content, off)
        off += 4
        r = _Reader(content[off:off + ln])
        out.append(_read_datum(r, schema, names))
        off += ln
    return out


def _avro_to_spark_fields(schema: dict) -> list[tuple[str, str]]:
    """(name, spark_type) per top-level Avro record field; primitives
    only — complex/logical types refuse loudly."""
    prim = {"int": "long", "long": "long", "float": "double",
            "double": "double", "string": "string", "boolean": "boolean",
            "bytes": "binary"}
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # nullable union
            nn = [x for x in t if x != "null"]
            if len(nn) != 1:
                raise NotImplementedError(
                    f"hudi MOR field {f['name']!r}: multi-branch union")
            t = nn[0]
        if not isinstance(t, str) or t not in prim:
            raise NotImplementedError(
                f"hudi MOR field {f['name']!r}: unsupported avro type "
                f"{t!r} (primitives only)")
        out.append((f["name"], prim[t]))
    return out


def write_log_file(path: str, schema_json: str, record_batches,
                   instant_time: str = "0") -> None:
    """Spec-shaped avro_data log blocks (one per batch) — the
    interchange/test writer twin of ``read_log_blocks``. The READER is
    independently pinned by a hand-authored byte fixture in
    tests/test_hudi.py; this writer exists so declared queries can
    build MOR fixtures without repeating the framing."""
    import io as _io
    import json as _json
    import struct as _struct

    from .avroio import _collect_names, _write_datum

    schema = _json.loads(schema_json)
    names: dict = {}
    _collect_names(schema, names)
    with open(path, "wb") as f:
        for batch in record_batches:
            recs = []
            for rec in batch:
                b = _io.BytesIO()
                _write_datum(b, schema, rec, names)
                recs.append(b.getvalue())
            content = _struct.pack(">ii", 3, len(recs)) + b"".join(
                _struct.pack(">i", len(r)) + r for r in recs)
            headers = ((_HDR_INSTANT_TIME, instant_time),
                       (_HDR_SCHEMA, schema_json))
            hbytes = _struct.pack(">i", len(headers)) + b"".join(
                _struct.pack(">ii", k, len(v.encode())) + v.encode()
                for k, v in headers)
            fbytes = _struct.pack(">i", 0)
            body = (_struct.pack(">ii", 1, _BLOCK_TYPES.index("avro_data"))
                    + hbytes + _struct.pack(">q", len(content)) + content
                    + fbytes)
            total = 6 + 8 + len(body) + 8
            f.write(_LOG_MAGIC + _struct.pack(">q", len(body) + 8)
                    + body + _struct.pack(">q", total))


def _mor_groups(table_dir: str,
                instant: str | int | None = None) -> dict:
    """fileId → {"base": rel path | None, "logs": [rel paths]} replay
    for a MERGE_ON_READ timeline: parquet write-stats (re)set a file
    group's base slice AND absorb its earlier logs (that is what a
    completed compaction's .commit means); .log. paths append;
    replacecommits drop whole groups."""
    d = os.path.join(table_dir, _HOODIE_DIR)
    tl: list[tuple[str, str, str]] = []
    for f in sorted(os.listdir(d)):
        if _PENDING_RE.match(f):
            continue
        m = re.match(
            r"^(?P<ts>\d+)(?:_\d+)?\.(?P<action>commit|replacecommit|"
            r"deltacommit)$", f)
        if m:
            tl.append((m.group("ts"), m.group("action"), f))
        elif re.match(r"^\d+(?:_\d+)?\.\w+$", f):
            # a COMPLETED instant of an action this replay does not
            # understand (e.g. a bare .compaction) — skipping it would
            # silently drop its file-group changes (review r7); the
            # fence is refuse-don't-mis-merge, same as the COW path
            raise NotImplementedError(
                f"hudi MOR timeline action {f!r} is not supported")
    tl.sort(key=lambda x: (len(x[0]), x[0]))
    if not tl:
        raise FileNotFoundError(
            f"no completed instants in {table_dir!r}/.hoodie")
    if instant is None:
        upto = len(tl)
    elif isinstance(instant, int):
        if not 1 <= instant <= len(tl):
            raise LookupError(
                f"hudi instant index {instant} not in 1..{len(tl)}")
        upto = instant
    else:
        tss = [ts for ts, _, _ in tl]
        if str(instant) not in tss:
            raise LookupError(
                f"hudi instant {instant!r} not in timeline (have {tss})")
        upto = tss.index(str(instant)) + 1

    groups: dict[str, dict] = {}
    for ts, action, fname in tl[:upto]:
        body = _read_instant(table_dir, fname)
        if action == "replacecommit":
            for _, fids in (body.get("partitionToReplaceFileIds")
                            or {}).items():
                for fid in fids:
                    groups.pop(fid, None)
        for _, stats in (body.get("partitionToWriteStats") or {}).items():
            for st in stats:
                p = st.get("path")
                if not p:
                    continue
                fid = st.get("fileId") or p
                g = groups.setdefault(fid, {"base": None, "logs": []})
                if ".log." in os.path.basename(p):
                    g["logs"].append(p)
                else:
                    g["base"], g["logs"] = p, []
    return groups


def read_mor_table(spark, table_dir: str,
                   instant: str | int | None = None,
                   keep_meta: bool = False):
    """Snapshot (or time-travel) read of a MERGE_ON_READ table: newest
    base slice per file group + its un-compacted avro_data log records,
    merged latest-per-``_hoodie_record_key``.

    Spark shape: base files stay ONE distributed parquet scan; log
    CONTENT is decoded executor-side — a binaryFile scan of the log
    files feeds an Arrow-batched mapInPandas running the pure-Python
    block parser, so log bytes never collect to the driver (only one
    block HEADER is read driver-side, for the Avro schema). The merge
    is one per-key window over the (small) update stream + an anti-join
    against the base — the standard read-path compaction. Honest
    fences: delete/command/cdc blocks, non-primitive Avro fields and
    schema drift between base and logs all raise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    groups = _mor_groups(table_dir, instant)
    bases = sorted(g["base"] for g in groups.values() if g["base"])
    log_rels: list[str] = []
    for g in sorted(groups, key=str):
        log_rels.extend(groups[g]["logs"])
    if not bases and not log_rels:
        raise FileNotFoundError(f"hudi snapshot at {table_dir!r} is empty")

    base_df = None
    if bases:
        base_df = (spark.read.option("mergeSchema", "true")
                   .parquet(*[os.path.join(table_dir, p) for p in bases]))
    if not log_rels:
        df = base_df
    else:
        # driver reads ONE header for the schema (metadata-sized)
        first_blocks = read_log_blocks(
            os.path.join(table_dir, log_rels[0]))
        schema_json = next(
            (b["headers"].get(_HDR_SCHEMA) for b in first_blocks
             if _HDR_SCHEMA in b["headers"]), None)
        if not schema_json:
            raise ValueError(
                f"hudi log {log_rels[0]!r}: no SCHEMA header")
        fields = _avro_to_spark_fields(__import__("json").loads(schema_json))
        names = [n for n, _ in fields]
        if "_hoodie_record_key" not in names:
            raise NotImplementedError(
                "hudi MOR without _hoodie_record_key in log records "
                "(virtual keys) is not supported")
        out_schema = ", ".join(f"`{n}` {t}" for n, t in fields) \
            + ", `__hudi_seq` long"
        # cross-file ordering keys on BASENAMES (fileId + write token +
        # instant make them unique; refused if not) — the binaryFile
        # `path` column is a scheme-qualified URI that never string-
        # matches a joined local path (review r7: the old lookup
        # silently defaulted to 0 and let a stale update win)
        seq_of = {os.path.basename(p): i for i, p in enumerate(log_rels)}
        if len(seq_of) != len(log_rels):
            raise NotImplementedError(
                f"hudi MOR: duplicate log file basenames in "
                f"{sorted(map(os.path.basename, log_rels))}")

        def _decode(batches):
            import os as _os

            import pandas as _pd

            for pdf in batches:
                rows: list[dict] = []
                for _, r in pdf.iterrows():
                    name = _os.path.basename(r["path"])
                    if name not in seq_of:
                        raise LookupError(
                            f"hudi MOR: log file {r['path']!r} not in "
                            f"the snapshot manifest")
                    fseq = seq_of[name]
                    # decode from the binaryFile CONTENT column — no
                    # executor-side re-open, so non-POSIX storage works
                    blocks = parse_log_blocks(bytes(r["content"]),
                                              r["path"])
                    for bi, blk in enumerate(blocks):
                        if blk["type"] != "avro_data":
                            raise NotImplementedError(
                                f"hudi MOR log block type "
                                f"{blk['type']!r} is not supported "
                                f"(avro_data only)")
                        blk_schema = blk["headers"][_HDR_SCHEMA]
                        if blk_schema != schema_json:
                            # log-to-log drift: a later deltacommit may
                            # add/rename fields; projecting rec.get(n)
                            # onto the FIRST file's names would silently
                            # drop the new field and NULL the renamed
                            # one — refuse like the base-vs-log drift
                            # fence below (ADVICE r7)
                            # compare (name, type) PAIRS, not name sets —
                            # a same-name type change would pass a
                            # name-only fence and rec.get(n) would mix
                            # types across blocks (ADVICE r8)
                            import json as _json

                            def _sig_of(sj):
                                return sorted(
                                    (f["name"],
                                     _json.dumps(f.get("type"),
                                                 sort_keys=True))
                                    for f in
                                    _json.loads(sj).get("fields", []))

                            if _sig_of(blk_schema) != _sig_of(schema_json):
                                blk_names = {
                                    f["name"] for f in
                                    _json.loads(blk_schema).get(
                                        "fields", [])}
                                raise NotImplementedError(
                                    f"hudi MOR schema drift between log "
                                    f"blocks: {r['path']!r} block {bi} "
                                    f"has fields "
                                    f"{sorted(blk_names ^ set(names)) or sorted(blk_names)} "
                                    f"differing from the first log's "
                                    f"schema (name or type)")
                        recs = decode_avro_data_block(
                            blk["content"], blk_schema)
                        # __hudi_seq packs (file, block, record) ordinals
                        # with radix 1e6 into one int64; at the radix the
                        # packing would overflow into the neighboring
                        # digit and let a STALE update win the
                        # latest-per-key window — refuse, don't mis-merge
                        # (ADVICE r7). fseq is bounded so the product
                        # stays under 2^63 (9.2e18 / 1e12).
                        if bi >= 1_000_000 or len(recs) >= 1_000_000 \
                                or fseq >= 9_000:
                            raise NotImplementedError(
                                f"hudi MOR ordering-key radix exceeded: "
                                f"file #{fseq}, block #{bi}, "
                                f"{len(recs)} records (limits: 9000 "
                                f"files, 1e6 blocks, 1e6 records/block)")
                        for ri, rec in enumerate(recs):
                            rec = {n: rec.get(n) for n in names}
                            rec["__hudi_seq"] = ((fseq * 1_000_000 + bi)
                                                 * 1_000_000 + ri)
                            rows.append(rec)
                yield _pd.DataFrame(
                    rows, columns=names + ["__hudi_seq"])

        paths = [os.path.join(table_dir, p) for p in log_rels]
        bin_df = (spark.read.format("binaryFile").load(paths)
                  .select("path", "content"))
        upd = bin_df.mapInPandas(_decode, schema=out_schema)
        w = Window.partitionBy("_hoodie_record_key").orderBy(
            F.col("__hudi_seq").desc())
        latest = (upd.withColumn("__rn", F.row_number().over(w))
                  .where("__rn = 1").drop("__rn", "__hudi_seq"))
        if base_df is None:
            df = latest
        else:
            if set(base_df.columns) != set(latest.columns):
                raise NotImplementedError(
                    "hudi MOR schema drift between base files and log "
                    "records is not supported")
            df = (base_df.join(latest, "_hoodie_record_key",
                               "left_anti")
                  .unionByName(latest.select(*base_df.columns)))
    if df is not None and not keep_meta:
        meta = [c for c in df.columns if c.startswith("_hoodie_")]
        if meta:
            df = df.drop(*meta)
    return df
