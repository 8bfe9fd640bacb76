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

Honest refusals: MERGE_ON_READ tables (``.log.*`` delta files require
compaction-aware merging — a base-file-only read silently loses updates)
and unknown timeline actions raise instead of mis-reading.

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
                f"Hudi MERGE_ON_READ timeline action {f!r}: log-file "
                f"merging is not supported — only COPY_ON_WRITE tables "
                f"(a base-file-only read would silently drop updates)")
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
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"hudi table type {ttype!r} not supported — COPY_ON_WRITE "
            f"base files only (MERGE_ON_READ needs log-file merging)")
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
