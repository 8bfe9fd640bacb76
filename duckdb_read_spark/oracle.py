"""Result normalization + comparison for differential (DuckDB-oracle) tests.

Mirrors the driver's t2 check (row-count + column-name + order-insensitive
value comparison) with the normalization rules from SURVEY §5.1:
decimals compared by value, floats rounded to 6 d.p., timestamps to µs,
dates treated as midnight timestamps, arrays element-wise.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math


def normalize_value(v, engine: str = "generic"):
    """``engine`` disambiguates dict renderings: duckdb's Python API
    returns STRUCTs as dicts (MAPs come as the {'key': […], 'value':
    […]} form handled below), while Spark returns MAPs as dicts and
    STRUCTs as Row tuples. With engine='duck', a plain dict therefore
    normalizes NAMELESS (tuple of field values, field order) so named
    structs compare against Spark's Row tuples; the default keeps the
    historical sorted-kv-items form (correct for Spark maps and for
    callers that normalize both sides the same way)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, _decimal.Decimal):
        if v == v.to_integral_value() and abs(v) >= 2 ** 53:
            # past float's exact-integer range a float round-trip loses
            # digits — DuckDB renders UBIGINT/HUGEINT as Python int, so
            # an integral DECIMAL(20,0) (md5_number_lower/upper) must
            # stay exact to compare equal (r9 probe)
            return int(v)
        return round(float(v), 6)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).isoformat(timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return tuple(normalize_value(x, engine) for x in v)
    if isinstance(v, dict):
        if (set(v.keys()) == {"key", "value"}
                and isinstance(v.get("key"), list)
                and isinstance(v.get("value"), list)
                and len(v["key"]) == len(v["value"])):
            # duckdb's Python rendering of a MAP is {'key': [...],
            # 'value': [...]} — zip it into items so histogram()-style
            # results compare against Spark's dict-of-items rendering
            # (a 2-field key/value STRUCT with list fields would
            # collide; documented ambiguity)
            return tuple(sorted(
                (normalize_value(k, engine), normalize_value(x, engine))
                for k, x in zip(v["key"], v["value"])))
        if engine == "duck":
            # duckdb dict = named STRUCT → nameless field-value tuple
            # (Spark structs are Row tuples, already nameless)
            return tuple(normalize_value(x, engine) for x in v.values())
        # keys normalize too (dates/decimals as map keys must render
        # the same as the duck-side zip branch — review r7-2)
        return tuple(sorted((normalize_value(k, engine),
                             normalize_value(x, engine))
                            for k, x in v.items()))
    return v


def normalize_rows(rows, engine: str = "generic") -> list[tuple]:
    out = [tuple(normalize_value(v, engine) for v in row) for row in rows]
    # Declared queries carry a total ORDER BY, but the comparison is made
    # order-insensitive anyway (matches the driver's value-hash).
    return sorted(out, key=repr)


def spark_rows(df) -> list[tuple]:
    return normalize_rows(tuple(row) for row in df.collect())


def duckdb_rows(con, sql: str) -> list[tuple]:
    return normalize_rows(con.execute(sql).fetchall(), engine="duck")


def diff_summary(a: list[tuple], b: list[tuple], limit: int = 5) -> str:
    set_a, set_b = set(a), set(b)
    only_a = [r for r in a if r not in set_b][:limit]
    only_b = [r for r in b if r not in set_a][:limit]
    return (
        f"rows: spark={len(a)} oracle={len(b)}\n"
        f"only in spark (≤{limit}): {only_a}\n"
        f"only in oracle (≤{limit}): {only_b}"
    )
