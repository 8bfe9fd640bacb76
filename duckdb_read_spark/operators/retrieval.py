"""Keyword retrieval over document corpora — BM25 scoring (L19).

The reference surface is an embedded analytical engine over file-resident
corpora (/root/reference/duckdb:1,101); keyword search with BM25 ranking is
the standard full-text-search companion (DuckDB ships it as the fts
extension's match_bm25). Re-expressed Spark-first:

- tokenize = one ``split`` + ``explode`` (JVM, no UDF);
- term frequencies = one shuffle on ``(doc, term)`` with map-side combine;
- document frequencies and corpus stats collapse to ``|query_terms|`` rows
  and one scalar row respectively — both broadcast back, so the only wide
  exchange at 100 TB is the tf aggregation, which AQE sizes;
- the scoring expression (Robertson/Sparck-Jones idf, the Okapi tf
  saturation with length normalization) is pure column arithmetic inside
  whole-stage codegen.

Scores are rounded to 6 decimals so results hash-compare across engines
(the SURVEY §2.0 determinism rule); ties break on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of ``query_terms``.

    Okapi BM25 with the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Documents matching no query term
    are absent from the result (their score is 0). Returns
    ``(id_col, bm25)`` ordered by score desc, id asc.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = (
        df.select(F.col(id_col), F.explode(
            F.split(F.lower(F.col(text_col)), " ")).alias("term"))
        .where(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    qtf = tf.where(F.col("term").isin(terms))
    # tf rows are unique per (doc, term) → df is a plain count
    dfreq = qtf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        qtf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "w",
            F.col("idf") * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )
