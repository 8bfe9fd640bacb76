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


def tfidf_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 256,
    out: str = "tfidf",
) -> DataFrame:
    """Hashed TF-IDF document vectors (the hashing trick, as in Spark ML's
    HashingTF+IDF, re-expressed as pure DataFrame ops — no ML pipeline, no
    RDDs): term → ``xxhash64 mod n_features`` bucket, per-doc bucket tf,
    smoothed idf ``ln((N+1)/(df+1)) + 1``, dense ``array<double>`` output
    that feeds the existing cosine/ANN operators directly.

    Scale shape: one (doc, bucket) tf shuffle (map-side combined, bounded
    by docs × n_features), one n_features-row idf aggregate broadcast
    back, and the dense assembly is ``map_from_entries`` + a ``sequence``
    transform — all JVM expressions. Deterministic: xxhash64 is seeded and
    versioned, so the same corpus yields the same vectors on any cluster.
    """
    toks = (
        df.select(F.col(id_col), F.explode(
            F.split(F.lower(F.col(text_col)), " ")).alias("term"))
        .where(F.col("term") != "")
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_features)))
    )
    tf = toks.groupBy(id_col, "bucket").agg(F.count("*").alias("tf"))
    n_docs = tf.agg(F.countDistinct(id_col).alias("n")).withColumnRenamed("n", "n_docs")
    dfreq = tf.groupBy("bucket").agg(F.count("*").alias("df"))
    weighted = (
        tf.join(F.broadcast(dfreq), "bucket")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.col("tf") * (F.log((F.col("n_docs") + 1.0)
                                 / (F.col("df") + 1.0)) + 1.0))
    )
    dense = (
        weighted.groupBy(id_col)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("bucket", "w"))).alias("__m"))
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_features - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("long")), F.lit(0.0)),
            ).alias(out),
        )
    )
    return dense


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    conjunctive: bool = False,
) -> DataFrame:
    """BM25 scores for EVERY document matching ≥1 query term (the
    unlimited form behind both ``bm25_topk`` and the SQL-reachable
    ``match_bm25`` surface — DuckDB's function returns NULL for
    non-matching docs, which the scalar-subquery rewrite gets for free
    from the absent rows here). ``conjunctive=True`` keeps only documents
    matching ALL query terms (DuckDB's ``conjunctive := 1``). Returns
    ``(id_col, bm25)``, unordered."""
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    # r12 restructure (guide §2.3 — aggregate/filter BEFORE the shuffle):
    # the old plan built the FULL (doc, term) frequency index and derived
    # everything from it — a corpus-sized explode + shuffle replayed for
    # each consumer. But BM25 only needs (a) per-doc length, which is the
    # token COUNT — a scan-stage projection, no explode or shuffle — and
    # (b) term frequencies for the QUERY terms only, so the token array
    # is filtered to the query bag before the explode. Only query-term
    # hits are ever shuffled. Same Okapi arithmetic, measured identical
    # results vs the index-shaped oracle SQL.
    arr = F.filter(F.split(F.lower(F.col(text_col)), " "),
                   lambda t: t != "")
    # docs with zero non-empty tokens had no tf rows in the index form
    # and were absent from dl/avgdl — keep that exact semantics
    dl = (df.select(F.col(id_col), F.size(arr).alias("dl"))
          .where(F.col("dl") > 0))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    qtoks = df.select(
        F.col(id_col),
        F.explode(F.filter(arr, lambda t: t.isin(*terms))).alias("term"))
    qtf = qtoks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # qtf rows are unique per (doc, term) → df is a plain count
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
    agg = scored.groupBy(id_col).agg(
        F.round(F.sum("w"), 6).alias("bm25"),
        F.count("*").alias("__nterms"))
    if conjunctive:
        agg = agg.where(F.col("__nterms") == len(terms))
    return agg.drop("__nterms")


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
    return (
        bm25_scores(df, query_terms, text_col=text_col, id_col=id_col,
                    k1=k1, b=b)
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )
