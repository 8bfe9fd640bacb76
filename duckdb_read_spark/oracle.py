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


def normalize_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, _decimal.Decimal):
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
        return tuple(normalize_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize_value(x)) for k, x in v.items()))
    return v


def normalize_rows(rows) -> list[tuple]:
    out = [tuple(normalize_value(v) for v in row) for row in rows]
    # Declared queries carry a total ORDER BY, but the comparison is made
    # order-insensitive anyway (matches the driver's value-hash).
    return sorted(out, key=repr)


def spark_rows(df) -> list[tuple]:
    return normalize_rows(tuple(row) for row in df.collect())


def duckdb_rows(con, sql: str) -> list[tuple]:
    return normalize_rows(con.execute(sql).fetchall())


def diff_summary(a: list[tuple], b: list[tuple], limit: int = 5) -> str:
    set_a, set_b = set(a), set(b)
    only_a = [r for r in a if r not in set_b][:limit]
    only_b = [r for r in b if r not in set_a][:limit]
    return (
        f"rows: spark={len(a)} oracle={len(b)}\n"
        f"only in spark (≤{limit}): {only_a}\n"
        f"only in oracle (≤{limit}): {only_b}"
    )
