"""Minimal pure-Python Apache Avro object-container-file codec.

Iceberg's manifest lists and manifests are Avro object container files
(Apache Avro spec, https://avro.apache.org/docs/1.12.0/specification/),
and this environment has neither an Avro Python package nor the
spark-avro datasource jar — so iceberglog.py needs its own decoder. The
implementation is generic (driven entirely by the schema JSON embedded
in each file, never hard-coded to Iceberg's schemas), which keeps it
honest: any spec-compliant writer's files decode.

Supported: all primitives, records, enums, arrays, maps, unions, fixed,
named-type references, ``null`` and ``deflate`` codecs (Iceberg's Java
writer emits deflate/"gzip" compression). Unsupported codecs (snappy,
zstd) raise rather than guess.

The writer half exists for tests and for composing spec-shaped fixture
tables; it mirrors the decoder, writing the ``null`` codec.

Scale shape: Avro metadata files are small driver-side artifacts (same
asymmetry as the Delta/Iceberg logs themselves — O(commits) metadata,
never row data), so a pure-Python reader is not on any hot path.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# ---------------------------------------------------------------- decode

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        # zigzag varint (spec: int and long share this encoding)
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _collect_names(schema, names: dict) -> None:
    """Pre-register every named type (record/enum/fixed) so later
    references by name resolve — Iceberg schemas reference partition
    record types like ``r102`` by name."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        name = schema["name"]
        ns = schema.get("namespace")
        names[name] = schema
        if ns:
            names[f"{ns}.{name}"] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _collect_names(f["type"], names)
    elif t == "array":
        _collect_names(schema.get("items"), names)
    elif t == "map":
        _collect_names(schema.get("values"), names)


def _resolve(schema, names: dict):
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise ValueError(f"unresolved avro type reference {schema!r}")
    return schema


def _read_datum(r: _Reader, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):                       # union
        return _read_datum(r, schema[r.read_long()], names)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (list, dict)):  # {"type": <nested>} wrapper
            return _read_datum(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "record":
        return {f["name"]: _read_datum(r, f["type"], names)
                for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:          # spec: negative count → block byte size follows
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_read_datum(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _read_datum(r, schema["values"], names)
        return out
    raise ValueError(f"unsupported avro type {t!r}")


def read_container(path: str) -> tuple[dict, list]:
    """Read an Avro object container file → (schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path!r} is not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported "
                                  f"(null/deflate only)")
    sync = r.read(16)
    names: dict = {}
    _collect_names(schema, names)
    records = []
    while r.pos < len(data):
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        br = _Reader(block)
        for _ in range(count):
            records.append(_read_datum(br, schema, names))
        if r.read(16) != sync:
            raise ValueError(f"{path!r}: bad sync marker (corrupt block)")
    return schema, records


# ---------------------------------------------------------------- encode

def _zigzag(n: int) -> bytes:
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


def _union_branch(schema_list, value, names: dict) -> int:
    """Pick the union branch for a python value (null-vs-rest is the only
    ambiguity the fixture schemas need; beyond that, first structural
    match wins)."""
    for i, s in enumerate(schema_list):
        s = _resolve(s, names)
        t = s if isinstance(s, str) else s.get("type")
        if value is None and t == "null":
            return i
        if value is not None and t != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {schema_list!r}")


def _write_datum(out: io.BytesIO, schema, value, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        i = _union_branch(schema, value, names)
        out.write(_zigzag(i))
        _write_datum(out, schema[i], value, names)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(t, (list, dict)):
        _write_datum(out, t, value, names)
        return
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        out.write(_zigzag(int(value)))
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "bytes":
        out.write(_zigzag(len(value)))
        out.write(value)
    elif t == "string":
        b = value.encode("utf-8")
        out.write(_zigzag(len(b)))
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            _write_datum(out, f["type"], value[f["name"]], names)
    elif t == "enum":
        out.write(_zigzag(schema["symbols"].index(value)))
    elif t == "fixed":
        out.write(value)
    elif t == "array":
        if value:
            out.write(_zigzag(len(value)))
            for item in value:
                _write_datum(out, schema["items"], item, names)
        out.write(_zigzag(0))
    elif t == "map":
        if value:
            out.write(_zigzag(len(value)))
            for k, v in value.items():
                kb = k.encode("utf-8")
                out.write(_zigzag(len(kb)))
                out.write(kb)
                _write_datum(out, schema["values"], v, names)
        out.write(_zigzag(0))
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def write_container(path: str, schema: dict, records: list,
                    codec: str = "null") -> None:
    """Write an Avro object container file (one block)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    names: dict = {}
    _collect_names(schema, names)
    body = io.BytesIO()
    for rec in records:
        _write_datum(body, schema, rec, names)
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        out.write(_zigzag(len(kb)))
        out.write(kb)
        out.write(_zigzag(len(v)))
        out.write(v)
    out.write(_zigzag(0))
    out.write(sync)
    out.write(_zigzag(len(records)))
    out.write(_zigzag(len(block)))
    out.write(block)
    out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
