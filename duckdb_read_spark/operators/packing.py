"""Sequence packing: group documents into fixed-token-budget training
sequences (the step between a cleaned corpus and a pretraining dataloader).

Two tiers, both deterministic and shard-parallel:

* ``pack_by_offset`` — assign each document to the pack containing its
  *starting* token offset within its shard (running-sum window). Pure JVM
  expressions, one window shuffle, and expressible in ANSI SQL — this is
  the oracle-checked tier. A pack can overflow ``budget`` by at most one
  document's tokens (the straddling doc goes to the pack where it starts).
* ``pack_greedy`` — exact first-fit-in-order: a doc that would overflow
  the current pack starts the next one, so no pack exceeds ``budget``
  (unless a single doc alone does). Stateful scan per shard via
  ``applyInPandas`` (Arrow-batched; shards are independent, so parallelism
  = n_shards — size shards like shuffle partitions).

Sharding is ``id % n_shards``: deterministic, engine-portable, and
documents stay in id order within a shard, so re-runs produce
byte-identical packs (same property as operators.sampling).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _with_tokens(df: DataFrame, token_col: str | None, text_col: str) -> tuple[DataFrame, str]:
    if token_col is not None:
        return df, token_col
    return (
        df.withColumn("__tok", F.size(F.split(F.col(text_col), " "))),
        "__tok",
    )


def pack_by_offset(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 32,
) -> DataFrame:
    """Adds ``shard`` and ``pack_id``: the pack whose token range contains
    this document's starting offset. ``pack_id`` is globally unique
    (shard-major)."""
    d, tok = _with_tokens(df, token_col, text_col)
    d = d.withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("long"))
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start = F.sum(tok).over(w) - F.col(tok)
    local = F.floor(start / F.lit(budget))
    out = d.withColumn("pack_id", (F.col("shard") * 1_000_000_000 + local).cast("long"))
    return out.drop("__tok") if token_col is None else out


def pack_greedy(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 32,
) -> DataFrame:
    """Adds ``shard`` and ``pack_id`` by exact first-fit in id order: packs
    never exceed ``budget`` unless one document alone does."""
    d, tok = _with_tokens(df, token_col, text_col)
    d = d.withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("long"))
    # fresh StructType — StructType.add would mutate the DataFrame's
    # cached schema in place and corrupt column resolution
    schema = StructType(list(d.schema.fields) + [StructField("pack_id", LongType())])

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        packs, pack, filled = [], 0, 0
        for t in pdf[tok]:
            t = int(t)
            if filled > 0 and filled + t > budget:
                pack, filled = pack + 1, 0
            packs.append(pack)
            filled += t
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        pdf["pack_id"] = [shard * 1_000_000_000 + p for p in packs]
        return pdf

    out = d.groupBy("shard").applyInPandas(assign, schema)
    return out.drop("__tok") if token_col is None else out


def pack_stats(packed: DataFrame, token_col: str | None = None,
               text_col: str = "text") -> DataFrame:
    """Per-pack fill report: docs, tokens (ordered; for fill-rate checks)."""
    d, tok = _with_tokens(packed, token_col, text_col)
    return (
        d.groupBy("shard", "pack_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(tok).cast("long").alias("tokens"))
        .orderBy("shard", "pack_id")
    )


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
    out: str = "chunk",
):
    """Split documents into fixed-size overlapping token chunks — the
    context-window preparation step upstream of sequence packing: a long
    document becomes ``ceil((n - overlap) / stride)`` chunks of
    ``chunk_tokens`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens; a document shorter than one chunk stays whole.

    Pure JVM shape: split → per-row chunk-count arithmetic → one
    ``explode(sequence(...))`` whose fan-out is chunks (data-proportional,
    no shuffle at all — chunking is a flatMap); the slice/join are
    per-row expressions. Deterministic and SQL-expressible, so it carries
    a DuckDB oracle (q120)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    prepared = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.greatest(
            F.lit(1),
            F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(stride)),
        ).cast("int").alias("__nc"),
    )
    return (
        prepared.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
            "__toks",
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.array_join(
                F.slice("__toks", F.col("chunk_id") * stride + 1,
                        F.lit(chunk_tokens)),
                " ",
            ).alias(out),
        )
    )
