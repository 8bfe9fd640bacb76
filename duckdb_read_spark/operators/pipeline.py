"""End-to-end training-data cleaning pipeline (north-star composition).

``clean_corpus`` chains the library's cleaning stages the way a crawl →
training-set pipeline actually runs them, cheapest-first so each stage
shrinks the data the next one sees:

1. exact dedup (md5, deterministic min-id survivor)     — 1 shuffle
2. quality filter (JVM expression score ≥ threshold)    — 0 shuffles
3. language ID + optional language allowlist            — 0 shuffles
4. (optional) near-dup removal via banded SimHash       — explode + join

Stages 1–3 are pure declarative ops, so at 100 TB the whole prefix is one
scan + one shuffle; stage 4 is the banded candidate join (SCALE.md §2).
Every stage's semantics are individually oracle-checked (q54/q56/q57);
q74 oracle-checks the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_exact, simhash_candidates
from .text import lang_scores, quality_score


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.8,
    languages: list[str] | None = None,
    drop_near_dups: bool = False,
    near_dup_hamming: int = 3,
) -> DataFrame:
    """Cleaned corpus with ``lang_pred`` and ``quality`` columns attached."""
    out = dedup_exact(df, text_col=text_col, keep_order_col=id_col)
    out = quality_score(out, text_col=text_col)
    out = out.filter(F.col("quality") >= min_quality)
    out = lang_scores(out, text_col=text_col)
    if languages:
        out = out.filter(F.col("lang_pred").isin(languages))
    if drop_near_dups:
        pairs = simhash_candidates(out, text_col, id_col, max_hamming=near_dup_hamming)
        # keep the lower id of every near-dup pair
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        out = out.join(losers, id_col, "left_anti")
    return out


def corpus_report(cleaned: DataFrame, group_col: str = "lang_pred") -> DataFrame:
    """Per-language summary of a cleaned corpus (docs, tokens, avg quality)."""
    toks = F.size(F.split(F.col("text"), " "))
    return (
        cleaned.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(toks).alias("tokens"),
            F.avg(F.col("quality").cast("decimal(18,6)")).cast("decimal(38,6)").alias("avg_quality"),
        )
        .orderBy(group_col)
    )
