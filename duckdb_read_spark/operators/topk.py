"""Top-k per group + term frequencies (common pipeline shapes).

topk_per_group is the Q29 window pattern as an operator: row_number over a
per-key window, filter rn <= k. One hash shuffle on the keys; the filter
runs inside the window stage so only k rows per key survive it.

term_frequencies is corpus vocabulary statistics: explode tokens → count.
Exact, deterministic tie-break (count DESC, term ASC) — the oracle shape.
At crawl scale the explode output is bounded by total token count; the
count aggregation is partial→final so the shuffle carries one row per
(partition, term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
    rank_col: str = "rn",
    presplit_buckets: int | None = None,
) -> DataFrame:
    """Top-k rows per key by ``order_col`` (ROW_NUMBER semantics).

    ``presplit_buckets`` is the hot-key mitigation (SCALE.md §3.1 — AQE
    cannot split window skew): phase 1 takes a local top-k per
    (key, salt-bucket), phase 2 re-ranks only the ≤ k × buckets survivors
    per key, so no window partition ever holds a whole hot key. Identical
    results when the order is total (pass ``tiebreak`` — the same
    requirement the plain path has for determinism)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tiebreak:
        order.append(F.asc(tiebreak))
    if presplit_buckets:
        salt = F.pmod(
            F.xxhash64(F.col(tiebreak) if tiebreak else F.col(order_col)),
            F.lit(presplit_buckets),
        )
        w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
        survivors = (
            df.withColumn("__salt", salt)
            .withColumn("__rn1", F.row_number().over(w1))
            .filter(F.col("__rn1") <= k)
            .drop("__rn1")
        )
        w2 = Window.partitionBy(*keys).orderBy(*order)
        return (
            survivors.withColumn(rank_col, F.row_number().over(w2))
            .filter(F.col(rank_col) <= k)
            .drop("__salt")
        )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def term_frequencies(
    df: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Corpus term frequencies: (term, n, docs) with deterministic order.

    ``id_col`` identifies documents for the doc-frequency count; without
    one, a synthetic per-row id is used (fine for df counting, but prefer a
    real id for cross-engine checks)."""
    doc = F.col(id_col) if id_col else F.monotonically_increasing_id()
    terms = df.select(
        doc.alias("__doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    out = (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("__doc")).alias("docs"),
        )
        .orderBy(F.desc("n"), F.asc("term"))
    )
    return out.limit(top_n) if top_n else out
