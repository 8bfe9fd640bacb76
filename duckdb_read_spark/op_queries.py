"""Operator-backed declared queries (SURVEY §2.1 J10/T2/L1–L4, §4.3).

The 50 SQL queries in queries.py pin the SQL surface; the entries here pin
the *operator library* — each runner drives a DataFrame-native operator from
``duckdb_read_spark.operators`` and (where the semantics are expressible in
ANSI/DuckDB SQL) carries a DuckDB oracle twin, so the driver's differential
harness covers the operators as first-class citizens.

Entries without an oracle (``duckdb_sql=None``) are hash/approximate
operators whose exact outputs are engine-specific by design (SimHash bit
order, Spark-ML MinHash family, LSH bucketing, fake image decode); those get
the driver's rows-only check, and their *quality* is asserted by the planted
near-duplicate tests in tests/test_operators.py instead.

Determinism rules are the same as SURVEY §2.0: total ORDER BY, no raw float
aggregation (doubles that cross the engine boundary are rounded/cast), and
thresholds chosen away from representability boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import operators as ops
from .catalog import load_table, register_tables
from .queries import QUERIES

# English marker list shared with operators/text.py (quality + lang-id).
_EN = "'the','and','of','to','in','is','that','with'"
_MARKER_SQL = {
    "en": _EN,
    "de": "'der','die','das','und','ist','nicht','mit','ein'",
    "es": "'el','la','los','las','que','de','es','con'",
    "fr": "'le','la','les','et','est','que','des','une'",
    "zh": "'de','shi','le','bu','zai','you','wo','ta'",
}


@dataclass(frozen=True)
class OpQuerySpec:
    name: str
    runner: Callable[[SparkSession, str], DataFrame]
    duckdb_sql: str | None  # None → driver does a rows-only check
    note: str = ""


OP_QUERIES: dict[str, OpQuerySpec] = {}


def _op(name: str, duckdb_sql: str | None, note: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        OP_QUERIES[name] = OpQuerySpec(name, fn, duckdb_sql, note)
        return fn

    return deco


def _events_split(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    s = ev.filter(F.col("event_type") == "signup")
    return p, s


# --- AS-OF join: both strategies against DuckDB's native ASOF JOIN --------

@_op("q51_asof_union_op", QUERIES["q50_asof_join"].duckdb_sql,
     note="asof_join(strategy='union') — scalable union+carry-forward path")
def _q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s = _events_split(spark, sf_dir)
    joined = ops.asof_join(
        p, s.select("user_id", "ts", "event_id"), on="ts", by="user_id",
        right_cols=["event_id"], strategy="union",
    )
    return joined.select(
        "event_id", F.col("event_id_right").alias("signup_event")
    ).orderBy("event_id")


@_op("q52_asof_range_op", QUERIES["q50_asof_join"].duckdb_sql,
     note="asof_join(strategy='join') — range-join+max_by path")
def _q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s = _events_split(spark, sf_dir)
    joined = ops.asof_join(
        p, s.select("user_id", "ts", "event_id"), on="ts", by="user_id",
        right_cols=["event_id"], strategy="join",
    )
    return joined.select(
        "event_id", F.col("event_id_right").alias("signup_event")
    ).orderBy("event_id")


# --- Sessionize operator vs the Q46 window formulation --------------------

@_op("q53_sessionize_op", QUERIES["q46_sessionize"].duckdb_sql,
     note="session_stats operator == lag/sum-over-window SQL (SURVEY T2)")
def _q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ops.session_stats(ev, key="user_id", ts="ts", gap_seconds=1800)


# --- Dedup family ---------------------------------------------------------

@_op("q54_exact_dup_groups", """
SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY h
""", note="exact dedup groups (L1): hash + survivor id + group size")
def _q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.exact_dup_groups(docs).orderBy("h")


# Shingles appearing in more than this many documents are boilerplate and
# excluded from BOTH engines' shingle universes — the scale lever that
# bounds the inverted-index self-join fan-out at C(cap,2) per shingle.
_SHINGLE_DF_CAP = 64

_CAPPED_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh0 AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, UNNEST(range(1, len(t)-1)) AS i FROM toks)),
keep AS (SELECT shingle FROM sh0 GROUP BY shingle
         HAVING COUNT(*) <= {_SHINGLE_DF_CAP}),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle))"""


@_op("q55_ngram_jaccard", f"""
WITH {_CAPPED_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b,
       CAST(CAST(i * 1.0 / (sa.sz + sb.sz - i) AS DECIMAL(10,6)) AS DOUBLE) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
ORDER BY id_a, id_b
""", note="exact word-trigram Jaccard near-dup pairs over the DF-capped "
          "shingle universe (L2): shingles in > 64 docs are boilerplate "
          "stopwords on BOTH engines, bounding self-join fan-out; the "
          "uncapped verification tier stays available via "
          "max_shingle_df=None (capped==uncapped equivalence pytest)")
def _q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ops.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                    max_shingle_df=_SHINGLE_DF_CAP)
    return pairs.select(
        "id_a", "id_b",
        F.col("jaccard").cast("decimal(10,6)").cast("double").alias("jaccard"),
    ).orderBy("id_a", "id_b")


# --- Text analysis family -------------------------------------------------

_LANG_SCORE_SQL = ",\n    ".join(
    f"len(list_filter(string_split(text,' '), x -> x IN ({m}))) * 1.0"
    f" / greatest(len(string_split(text,' ')), 1) AS score_{lang}"
    for lang, m in _MARKER_SQL.items()
)

@_op("q56_lang_id", f"""
WITH s AS (SELECT doc_id,
    {_LANG_SCORE_SQL}
  FROM documents),
g AS (SELECT *, greatest(score_en, score_de, score_es, score_fr, score_zh) AS gmax FROM s)
SELECT doc_id,
       CASE WHEN score_en = gmax THEN 'en' WHEN score_de = gmax THEN 'de'
            WHEN score_es = gmax THEN 'es' WHEN score_fr = gmax THEN 'fr'
            ELSE 'zh' END AS lang_pred,
       CAST(CAST(score_en AS DECIMAL(10,6)) AS DOUBLE) AS score_en
FROM g ORDER BY doc_id
""", note="marker-ratio language ID (L4); argmax tie order pinned en,de,es,fr,zh")
def _q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = ops.lang_scores(docs)
    return scored.select(
        "doc_id", "lang_pred",
        F.col("score_en").cast("decimal(10,6)").cast("double").alias("score_en"),
    ).orderBy("doc_id")


@_op("q57_quality_score", f"""
SELECT doc_id, CAST(round(
  (CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.25 END) * 0.3 +
  (CASE WHEN length(text) * 1.0 / greatest(len(string_split(text,' ')), 1)
            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.25 END) * 0.3 +
  (CASE WHEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
             / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.5 END) * 0.2 +
  (CASE WHEN len(list_filter(string_split(text,' '), x -> x IN ({_EN}))) * 1.0
             / greatest(len(string_split(text,' ')), 1) >= 0.01
        THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS DOUBLE) AS quality
FROM documents ORDER BY doc_id
""", note="crawl-filter quality heuristic (L4)")
def _q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.quality_score(docs).select("doc_id", "quality").orderBy("doc_id")


@_op("q58_fingerprint", """
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1),
                     i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
FROM documents ORDER BY doc_id
""", note="polynomial rolling-hash document fingerprint (L4)")
def _q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.fingerprint(docs).select("doc_id", "fp").orderBy("doc_id")


@_op("q59_bpe_token_count", r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens
FROM documents ORDER BY doc_id
""", note="BPE-ish pre-tokenization count (L4)")
def _q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.bpe_token_count(docs).select("doc_id", "n_bpe_tokens").orderBy("doc_id")


@_op("q60_token_count_op", """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents ORDER BY doc_id
""", note="whitespace token count (L4) via operator API")
def _q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.token_count(docs).select("doc_id", "n_tokens").orderBy("doc_id")


# Q49's decimal normal form, driven through groupBy/agg (the text_stats
# operator shape with the SURVEY §2.0 float-determinism casts applied).
@_op("q61_text_stats_op", QUERIES["q49_text_stats"].duckdb_sql,
     note="per-language corpus stats via operator API (Q49 shape)")
def _q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.avg(F.col("n_chars").cast("decimal(18,4)"))
            .cast("decimal(38,6)").cast("double").alias("avg_chars"),
            F.min("n_chars").alias("mn"),
            F.max("n_chars").alias("mx"),
        )
        .orderBy("lang")
    )


# --- Similarity family ----------------------------------------------------

def _probe_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    return list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])


@_op("q62_cosine_topk_op", QUERIES["q48_cosine_topk"].duckdb_sql,
     note="brute-force cosine top-k via HOF expressions (L3 baseline)")
def _q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    top = ops.cosine_topk(emb.filter(F.col("vec_id") != 0), probe, k=5)
    return top.select(
        "vec_id", F.col("sim").cast("decimal(12,6)").cast("double").alias("sim")
    )


@_op("q63_cosine_topk_pandas", QUERIES["q48_cosine_topk"].duckdb_sql,
     note="same top-k via Arrow-batched numpy mapInPandas (L3 hot path)")
def _q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    top = ops.cosine_topk_pandas(emb.filter(F.col("vec_id") != 0), probe, k=5)
    return top.select(
        "vec_id", F.col("sim").cast("decimal(12,6)").cast("double").alias("sim")
    )


@_op("q64_embedding_neardup", """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(CAST(list_cosine_similarity(a.v, b.v) AS DECIMAL(12,6)) AS DOUBLE) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
ORDER BY id_a, id_b
""", note="embedding-cosine near-dup pairs (L2 embedding tier)")
def _q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = ops.embedding_neardup_pairs(emb, threshold=0.4)
    return pairs.select(
        "id_a", "id_b",
        F.col("cosine").cast("decimal(12,6)").cast("double").alias("cosine"),
    ).orderBy("id_a", "id_b")


# --- Hash/approximate operators: rows-only (no cross-engine oracle) -------

@_op("q65_simhash", None,
     note="64-bit SimHash fingerprints — bit layout is engine-specific "
          "(xxhash64); quality pinned by planted-near-dup tests")
def _q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.simhash(docs).orderBy("doc_id")


@_op("q66_simhash_neardup", None,
     note="banded SimHash candidates + Hamming verify (L2 scale tier)")
def _q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.simhash_candidates(docs, max_hamming=3, bands=4).orderBy("id_a", "id_b")


@_op("q67_minhash_neardup", None,
     note="Spark-ML MinHashLSH candidates (L2); hash family is Spark's own")
def _q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ops.minhash_candidates(docs, jaccard_threshold=0.5)
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard_distance"), 6).alias("jd")
    ).orderBy("id_a", "id_b")


@_op("q68_ann_topk", None,
     note="random-hyperplane LSH ANN top-k (L3 scale tier); approximate")
def _q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probe = _probe_vector(spark, sf_dir)
    top = ops.ann_topk(emb.filter(F.col("vec_id") != 0), probe, k=5)
    return top.select("vec_id", F.round(F.col("sim"), 6).alias("sim"))


@_op("q69_decode_image", None,
     note="multimodal decode over real planted P6 bitmaps: strict mode, "
          "true dimensions from the self-contained parser (SURVEY north-star)")
def _q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = ops.make_demo_assets(spark, n=64)  # real decodable PPM bytes
    feats = ops.decode_image(assets, strict=True)
    return feats.select("asset_id", "width", "height", "channels").orderBy("asset_id")


# --- Hypertable rollups ---------------------------------------------------

_DUCK_BUCKET_15M = (
    "CAST(to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)) AS TIMESTAMP)"
)
_DUCK_BUCKET_1H = (
    "CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP)"
)
_DUCK_EVENTS_SHIM = (
    "WITH events AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM main.events)"
)


def _rollup_out(level: DataFrame) -> DataFrame:
    """Driver output contract: decimal partial sum goes out as DOUBLE."""
    return level.select(
        "bucket", "n", F.col("sv").cast("double").alias("sv"), "mn", "mx"
    ).orderBy("bucket")


@_op("q70_time_bucket", f"""
{_DUCK_EVENTS_SHIM}
SELECT {_DUCK_BUCKET_15M} AS bucket, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
       MIN(value) AS mn, MAX(value) AS mx
FROM events GROUP BY 1 ORDER BY bucket
""", note="epoch-aligned 15-min time buckets (hypertable finest level)")
def _q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _rollup_out(ops.bucket_agg(ev, ts="ts", width_seconds=900))


@_op("q71_rollup_reaggregate", f"""
{_DUCK_EVENTS_SHIM}
SELECT {_DUCK_BUCKET_1H} AS bucket, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
       MIN(value) AS mn, MAX(value) AS mx
FROM events GROUP BY 1 ORDER BY bucket
""", note="1h level re-aggregated FROM the 15-min partials (no raw rescan) "
          "— must equal a direct 1h aggregation of the raw events")
def _q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ladder = ops.rollup_ladder(ev, ts="ts", widths_seconds=(900, 3600))
    return _rollup_out(ladder[3600])


# --- Pivot + grouped-map --------------------------------------------------

@_op("q72_pivot", f"""
{_DUCK_EVENTS_SHIM}
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup
FROM events GROUP BY user_id ORDER BY user_id
""", note="pivot (wide counts by event_type) via DataFrame groupBy().pivot; "
          "oracle = portable conditional aggregation")
def _q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types
    ]
    return out.select(*cols).orderBy("user_id")


@_op("q73_zscore_groupmap", """
SELECT doc_id,
       CAST(CAST(CASE WHEN sd > 0 THEN (n_chars - m) / sd ELSE 0.0 END AS DECIMAL(18,6)) AS DOUBLE) AS z
FROM (SELECT doc_id, n_chars,
             AVG(n_chars) OVER (PARTITION BY lang) AS m,
             stddev_samp(n_chars) OVER (PARTITION BY lang) AS sd
      FROM documents) t
ORDER BY doc_id
""", note="X2 grouped-map applyInPandas z-score == window formulation")
def _q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    z = ops.zscore_normalize_pandas(docs, "lang", "n_chars")
    return z.select(
        "doc_id", F.col("z").cast("decimal(18,6)").cast("double").alias("z")
    ).orderBy("doc_id")


# --- AS-OF variants: forward direction, tolerance -------------------------

@_op("q75_asof_forward", f"""
{_DUCK_EVENTS_SHIM},
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
s AS (SELECT * FROM events WHERE event_type = 'signup')
SELECT p.event_id, min_by(s.event_id, s.ts) AS next_signup
FROM p LEFT JOIN s ON p.user_id = s.user_id AND s.ts >= p.ts
GROUP BY p.event_id ORDER BY p.event_id
""", note="forward as-of: earliest signup at-or-after each purchase")
def _q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s = _events_split(spark, sf_dir)
    joined = ops.asof_join(
        p, s.select("user_id", "ts", "event_id"), on="ts", by="user_id",
        right_cols=["event_id"], strategy="union", direction="forward",
    )
    return joined.select(
        "event_id", F.col("event_id_right").alias("next_signup")
    ).orderBy("event_id")


@_op("q76_asof_tolerance", f"""
{_DUCK_EVENTS_SHIM},
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
s AS (SELECT * FROM events WHERE event_type = 'signup')
SELECT p.event_id, max_by(s.event_id, s.ts) AS signup_event
FROM p LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
  AND epoch(p.ts) - epoch(s.ts) <= 86400
GROUP BY p.event_id ORDER BY p.event_id
""", note="backward as-of with 1-day tolerance (pandas merge_asof semantics)")
def _q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, s = _events_split(spark, sf_dir)
    joined = ops.asof_join(
        p, s.select("user_id", "ts", "event_id"), on="ts", by="user_id",
        right_cols=["event_id"], strategy="union", tolerance_seconds=86400,
    )
    return joined.select(
        "event_id", F.col("event_id_right").alias("signup_event")
    ).orderBy("event_id")


# --- Top-k per group + vocabulary stats -----------------------------------

@_op("q77_topk_per_group_op", QUERIES["q29_topk_per_group"].duckdb_sql,
     note="Q29 window pattern as an operator (row_number + filter)")
def _q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    top = ops.topk_per_group(
        cust, "c_nationkey", "c_acctbal", k=3, tiebreak="c_custkey"
    )
    return top.select("c_nationkey", "c_custkey", "rn").orderBy("c_nationkey", "rn")


@_op("q78_term_frequencies", """
SELECT tok AS term, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS docs
FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) t
GROUP BY tok ORDER BY n DESC, term ASC LIMIT 50
""", note="corpus vocabulary stats: term + collection/document frequency")
def _q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.term_frequencies(docs, top_n=50, id_col="doc_id")


# --- Composed cleaning pipeline (north-star) ------------------------------

_QUALITY_SQL = f"""CAST(round(
  (CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.25 END) * 0.3 +
  (CASE WHEN length(text) * 1.0 / greatest(len(string_split(text,' ')), 1)
            BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.25 END) * 0.3 +
  (CASE WHEN len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
             / greatest(length(text), 1) <= 0.2 THEN 1.0 ELSE 0.5 END) * 0.2 +
  (CASE WHEN len(list_filter(string_split(text,' '), x -> x IN ({_EN}))) * 1.0
             / greatest(len(string_split(text,' ')), 1) >= 0.01
        THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS DOUBLE)"""


@_op("q74_clean_corpus", f"""
WITH dedup AS (
  SELECT * FROM (
    SELECT d.*, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
    FROM documents d) t
  WHERE doc_id = keep_id),
q AS (SELECT *, {_QUALITY_SQL} AS quality FROM dedup),
f AS (SELECT * FROM q WHERE quality >= 0.8),
s AS (SELECT *,
    {_LANG_SCORE_SQL}
  FROM f),
g AS (SELECT *, greatest(score_en, score_de, score_es, score_fr, score_zh) AS gmax FROM s),
p AS (SELECT *, CASE WHEN score_en = gmax THEN 'en' WHEN score_de = gmax THEN 'de'
                     WHEN score_es = gmax THEN 'es' WHEN score_fr = gmax THEN 'fr'
                     ELSE 'zh' END AS lang_pred FROM g)
SELECT lang_pred, COUNT(*) AS docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
       CAST(CAST(AVG(CAST(quality AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS avg_quality
FROM p GROUP BY lang_pred ORDER BY lang_pred
""", note="composed cleaning pipeline: exact dedup → quality filter → "
          "lang-id → per-language report; every stage individually oracled "
          "(q54/q56/q57), this checks the composition")
def _q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cleaned = ops.clean_corpus(docs, min_quality=0.8)
    report = ops.corpus_report(cleaned)
    return report.select(
        "lang_pred", "docs", "tokens",
        F.col("avg_quality").cast("double").alias("avg_quality"),
    )


@_op("q79_sessionize_presplit", QUERIES["q46_sessionize"].duckdb_sql,
     note="sessionize(presplit='1 day') — the SCALE.md §3.1 hot-key "
          "mitigation must reproduce the single-window q46 answer exactly")
def _q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ops.session_stats(ev, key="user_id", ts="ts", gap_seconds=1800,
                             presplit="1 day")


@_op("q80_dup_clusters", f"""
WITH RECURSIVE {_CAPPED_SHINGLES_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
pairs AS (SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
          WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (SELECT a AS node, a AS r FROM edges
          UNION
          SELECT e.a, t.r FROM edges e JOIN reach t ON e.b = t.node)
SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node ORDER BY doc_id
""", note="connected components over q55's DF-capped near-dup pairs: "
          "iterative min-label propagation on Spark vs WITH RECURSIVE "
          "transitive closure on DuckDB — the pairs→clusters step of a "
          "dedup pipeline")
def _q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ops.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                    max_shingle_df=_SHINGLE_DF_CAP)
    return ops.duplicate_clusters(pairs).orderBy("doc_id")


_S81 = ops.hash_threshold(0.2)


@_op("q81_hash_sample", f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_S81}'
ORDER BY doc_id
""", note="deterministic md5-prefix sampling (reproducible across "
          "partitioning/retries/engines, unlike DataFrame.sample)")
def _q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.sample_by_hash(docs, 0.2, key_col="doc_id").select(
        "doc_id", "lang", "n_chars"
    ).orderBy("doc_id")


_S82 = {lang: ops.hash_threshold(f)
        for lang, f in (("en", 0.1), ("de", 0.5), ("zh", 0.0))}


@_op("q82_stratified_sample", f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || 's'), 1, 8) <
      CASE lang WHEN 'en' THEN '{_S82["en"]}' WHEN 'de' THEN '{_S82["de"]}'
                WHEN 'zh' THEN '{_S82["zh"]}'
                ELSE '{ops.hash_threshold(1.0)}' END
ORDER BY doc_id
""", note="per-stratum deterministic sampling: downsample dominant en, "
          "drop zh, keep rare strata whole — the corpus-mix primitive")
def _q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.stratified_sample_by_hash(
        docs, key_col="doc_id", strata_col="lang",
        fractions={"en": 0.1, "de": 0.5, "zh": 0.0}, default_fraction=1.0,
        salt="s",
    ).select("doc_id", "lang").orderBy("doc_id")


@_op("q83_pack_sequences", """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard, len(string_split(text, ' ')) AS tok
  FROM documents),
packed AS (
  SELECT doc_id, shard, tok,
         CAST(shard * 1000000000 +
              (SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - tok) // 2048
              AS BIGINT) AS pack_id
  FROM toks)
SELECT shard, pack_id, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens
FROM packed GROUP BY shard, pack_id ORDER BY shard, pack_id
""", note="sequence packing (offset-bucket tier): docs → 2048-token "
          "training packs via running-sum window; greedy exact tier is "
          "pytest-pinned (not SQL-expressible without recursion)")
def _q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    packed = ops.pack_by_offset(docs, budget=2048, n_shards=8)
    return ops.pack_stats(packed)


@_op("q84_scrub_text", r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS scrubbed
FROM documents WHERE doc_id < 200 ORDER BY doc_id
""", note="PII/noise scrub: URL→EMAIL→PHONE placeholder chain, RE2-safe "
          "patterns shared verbatim with the DuckDB oracle")
def _q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        ops.scrub_text(docs.filter(F.col("doc_id") < 200), out="scrubbed")
        .select("doc_id", "scrubbed").orderBy("doc_id")
    )


@_op("q85_repetition_stats", """
WITH tc AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       round(1.0 - COUNT(*) * 1.0 / SUM(c), 6) AS rep_ratio,
       round(MAX(c) * 1.0 / SUM(c), 6) AS top_share
FROM tc GROUP BY doc_id ORDER BY doc_id
""", note="per-doc repetition/boilerplate signals: distinct-token ratio "
          "and top-token share (linear explode+agg, not per-doc HOF)")
def _q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.repetition_stats(docs).orderBy("doc_id")


@_op("q86_profile_columns", """
SELECT 'doc_id' AS "column", COUNT(*) AS n_rows,
       COUNT(*) - COUNT(doc_id) AS n_nulls,
       COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_str, CAST(MAX(doc_id) AS VARCHAR) AS max_str,
       CAST(CAST(AVG(doc_id) AS DECIMAL(28,4)) AS DOUBLE) AS mean,
       CAST(CAST(median(doc_id) AS DECIMAL(28,4)) AS DOUBLE) AS med
FROM documents
UNION ALL
SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
       CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR), NULL, NULL
FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR),
       CAST(CAST(AVG(n_chars) AS DECIMAL(28,4)) AS DOUBLE),
       CAST(CAST(median(n_chars) AS DECIMAL(28,4)) AS DOUBLE)
FROM documents
ORDER BY "column"
""", note="single-scan column profiler (count/nulls/distinct/min/max/"
          "mean/median per column via struct-array explode); exact "
          "distinct here — the scale default is HLL approx")
def _q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.profile_columns(docs, ["doc_id", "lang", "n_chars"],
                               exact_distinct=True)


@_op("q87_topk_presplit", QUERIES["q29_topk_per_group"].duckdb_sql,
     note="topk_per_group(presplit_buckets=8): two-phase salted top-k "
          "(hot-key window mitigation) must equal the single-window q29")
def _q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    top = ops.topk_per_group(
        cust, "c_nationkey", "c_acctbal", k=3, tiebreak="c_custkey",
        presplit_buckets=8,
    )
    return top.select("c_nationkey", "c_custkey", "rn").orderBy("c_nationkey", "rn")


@_op("q88_quantize_embeddings", """
WITH s AS (SELECT vec_id, embedding,
  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS qscale
  FROM embeddings)
SELECT vec_id,
  CAST(CAST(qscale AS DECIMAL(20,10)) AS DOUBLE) AS qscale,
  array_to_string(list_transform(embedding,
    x -> CAST(CAST(round(CAST(x AS DOUBLE) / qscale) AS TINYINT) AS VARCHAR)), ',') AS qvec
FROM s WHERE vec_id < 200 ORDER BY vec_id
""", note="symmetric per-vector int8 quantization (scale = max|x|/127, "
          "q = round(x/scale)) — deterministic, so oracle-checked; the "
          "int8 top-k consumer is recall-tested in pytest")
def _q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = ops.quantize_embeddings(emb.filter(F.col("vec_id") < 200))
    return q.select(
        "vec_id",
        F.col("qscale").cast("decimal(20,10)").cast("double").alias("qscale"),
        F.array_join(F.transform("qvec", lambda v: v.cast("string")), ",").alias("qvec"),
    ).orderBy("vec_id")


@_op("q89_sliding_window", """
WITH x AS (
  SELECT event_type, value,
         CAST(to_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - i) * 900)
              AS TIMESTAMP) AS w
  FROM events, UNNEST([0, 1, 2, 3]) AS t(i)
)
SELECT w, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
FROM x GROUP BY w, event_type ORDER BY w, event_type
""", note="sliding 1h/15m window (T1 extension): F.window(size, slide) vs "
          "the explode-4-offsets SQL formulation; batch/stream dual like "
          "tumbling_counts")
def _q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.windows import sliding_counts

    ev = load_table(spark, sf_dir, "events")
    out = sliding_counts(ev, size="1 hour", slide="15 minutes")
    return out.select(
        "w", "event_type", "n", F.col("sv").cast("double").alias("sv")
    ).orderBy("w", "event_type")


@_op("q92_gap_fill", f"""
{_DUCK_EVENTS_SHIM},
b AS (SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS e, event_type,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,4))) AS sv
      FROM events GROUP BY 1, 2),
ext AS (SELECT min(e) AS mn, max(e) AS mx FROM b),
spine AS (SELECT UNNEST(range(mn, mx + 900, 900)) AS e FROM ext),
dense AS (SELECT e, event_type
          FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM b))
SELECT CAST(to_timestamp(d.e) AS TIMESTAMP) AS bucket, d.event_type,
       COALESCE(b.n, 0) AS n,
       CAST(last_value(b.sv IGNORE NULLS)
            OVER (PARTITION BY d.event_type ORDER BY d.e) AS DOUBLE) AS sv_locf
FROM dense d LEFT JOIN b ON d.e = b.e AND d.event_type = b.event_type
ORDER BY bucket, d.event_type
""", note="gap-filled dense series per event_type: zero-fill counts, LOCF "
          "the gauge sum — hypertable gap_fill surface; spine is a one-row "
          "bounds agg exploded, never raw-data-sized")
def _q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ops.bucket_agg(ev, ts="ts", width_seconds=900,
                       keys=["event_type"], value="value")
    dense = ops.gap_fill(
        b.select("bucket", "event_type", "n", "sv"),
        bucket="bucket", width_seconds=900, keys=["event_type"],
        fill={"n": "zero", "sv": "locf"},
    )
    return dense.select(
        "bucket", "event_type", "n",
        F.col("sv").cast("double").alias("sv_locf"),
    ).orderBy("bucket", "event_type")


@_op("q93_dup_clusters_banded", None,
     note="the 100 TB dedup composition: banded SimHash candidate pairs "
          "(O(docs x bands), never all-pairs) → connected-components "
          "clustering — rows-only because the SimHash bit layout is "
          "engine-specific; clustering correctness itself is oracle-pinned "
          "by q80 and the union-find pytest")
def _q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ops.simhash_candidates(docs, max_hamming=3, bands=4)
    return ops.duplicate_clusters(pairs).orderBy("doc_id")


# --- DDL/DML statement surface (D5): versioned snapshot tables ------------

@_op("q95_ddl_dml_lifecycle", """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(CASE WHEN o_custkey % 10 = 4 THEN o_totalprice * 2
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS sv,
       MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
FROM orders WHERE o_orderkey < 2000 AND o_custkey % 10 <> 3
""", note="CREATE TABLE AS -> INSERT INTO SELECT -> DELETE -> UPDATE "
          "through Engine.sql onto versioned snapshot commits; the oracle "
          "replays the same mutations as one pure SELECT")
def _q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from duckdb_read_spark.engine import Engine

    eng = Engine(spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q95_"))
    eng.execute("""
CREATE TABLE t95 AS
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey < 1000;
INSERT INTO t95
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE o_orderkey >= 1000 AND o_orderkey < 2000;
DELETE FROM t95 WHERE o_custkey % 10 = 3;
UPDATE t95 SET o_totalprice = o_totalprice * 2 WHERE o_custkey % 10 = 4;
""")
    return eng.sql("""
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv,
       MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
FROM t95""")


@_op("q96_ctas_time_travel", """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM orders WHERE o_orderkey < 500
""", note="CTAS commit v1, INSERT commit v2, read back VERSION AS OF 1 — "
          "DML history is time-travelable because every statement is an "
          "atomic snapshot commit; oracle recomputes the v1 state")
def _q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from duckdb_read_spark.engine import Engine

    eng = Engine(spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q96_"))
    eng.execute("""
CREATE TABLE t96 AS
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 500;
INSERT INTO t96
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_orderkey >= 500 AND o_orderkey < 1500;
""")
    return eng.sql("""
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t96 VERSION AS OF 1""")


@_op("q97_dynamic_pivot", f"""
{_DUCK_EVENTS_SHIM}
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id ORDER BY user_id
""", note="IN-less statement-form PIVOT: the engine discovers pivot values "
          "with one bounded sorted DISTINCT scan (matching DuckDB's "
          "dynamic pivot column order) and compiles to relation-form "
          "PIVOT; oracle = portable conditional aggregation")
def _q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_read_spark.engine import Engine

    eng = Engine(spark=spark)
    out = eng.sql("PIVOT events ON event_type USING count(*) GROUP BY user_id",
                  dialect="duckdb")
    types = ["click", "error", "purchase", "signup", "view"]
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types],
    ).orderBy("user_id")


@_op("q99_merge_upsert", """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderkey >= 500 AND o_orderkey < 1000
                          THEN o_totalprice + 1000
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS sv
FROM orders WHERE o_orderkey < 1500
""", note="MERGE INTO (upsert): matched rows updated, unmatched source "
          "rows inserted, one copy-on-write snapshot commit; oracle "
          "replays the merge as a pure SELECT")
def _q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from duckdb_read_spark.engine import Engine

    eng = Engine(spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q99_"))
    eng.execute("""
CREATE TABLE t99 AS
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000;
MERGE INTO t99 t USING
  (SELECT o_orderkey, o_totalprice FROM orders
   WHERE o_orderkey >= 500 AND o_orderkey < 1500) s
ON t.o_orderkey = s.o_orderkey
WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 1000
WHEN NOT MATCHED THEN INSERT *;
""")
    return eng.sql("""
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t99""")


@_op("q100_contamination", """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
       FROM (SELECT doc_id, t, UNNEST(range(1, len(t)-6)) AS i FROM toks)),
tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 <> 0),
ev AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ev GROUP BY doc_id),
hits AS (SELECT ev.doc_id, COUNT(*) AS shared
         FROM ev JOIN tr USING (shingle) GROUP BY ev.doc_id)
SELECT s.doc_id, s.n_shingles, COALESCE(h.shared, 0) AS shared,
       CAST(CAST(COALESCE(h.shared, 0) * 1.0 / s.n_shingles AS DECIMAL(10,6))
            AS DOUBLE) AS frac
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
ORDER BY s.doc_id
""", note="train/eval contamination check (benchmark-leakage n-gram "
          "overlap): eval docs scored by the fraction of their 8-gram "
          "shingles present anywhere in the train split — train side is "
          "one DISTINCT shingle set, check is a hash semi-join, linear")
def _q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    out = ops.contamination_overlap(train, ev, n=8)
    return out.select(
        "doc_id", "n_shingles", F.col("shared").cast("long").alias("shared"),
        F.col("frac").cast("decimal(10,6)").cast("double").alias("frac"),
    ).orderBy("doc_id")


@_op("q106_decode_audio", None,
     note="multimodal audio decode over real planted PCM16 WAVs: strict "
          "mode, true channel/rate/duration + RMS/peak from the "
          "self-contained RIFF parser (audio twin of q69)")
def _q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = ops.make_demo_audio(spark, n=32)
    feats = ops.decode_audio(assets, strict=True)
    return feats.select(
        "asset_id", "channels", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
    ).orderBy("asset_id")


@_op("q107_sliding_window_stream", OP_QUERIES["q89_sliding_window"].duckdb_sql,
     note="STREAMING declared query (VERDICT r3 item 6): the sliding-window "
          "stream (streaming/windows.sliding_counts) executed over a "
          "file-replayed events stream with availableNow semantics; the "
          "drained memory-sink table must hash-match the q89 batch oracle — "
          "batch/stream duality in the driver-visible contract, not just "
          "pytest")
def _q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from .streaming.source import events_stream
    from .streaming.windows import run_to_memory, sliding_counts

    stream = events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    # watermark=None: a bounded replay drained in one availableNow run —
    # exact batch equality must not depend on inter-batch watermark
    # advancement (a multi-file replay could otherwise drop late rows)
    out = sliding_counts(stream, size="1 hour", slide="15 minutes",
                         watermark=None)
    name = f"q107_sink_{uuid.uuid4().hex[:8]}"
    run_to_memory(out, name, output_mode="complete")
    return (
        spark.table(name)
        .select("w", "event_type", "n", F.col("sv").cast("double").alias("sv"))
        .orderBy("w", "event_type")
    )


@_op("q109_session_window_stream", f"""
{_DUCK_EVENTS_SHIM},
g AS (SELECT user_id, ts, event_id,
        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events),
s AS (SELECT user_id, ts,
        CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM g)
SELECT user_id, COUNT(*) AS n, MIN(ts) AS t0, MAX(ts) AS t1
FROM s GROUP BY user_id, sess ORDER BY user_id, t0
""", note="STREAMING declared query #2: session_window stateful "
          "aggregation over a file-replayed events stream vs the q46 "
          "lag/sum batch sessionization on session CONTENT (key, n, t0, "
          "t1) — session ids differ by construction (ordinal vs window "
          "bounds), the partition of events into sessions must not. "
          "Exact-gap boundary (ts diff == 30 min) would diverge "
          "(open vs half-open interval); µs-random fixture timestamps "
          "never land on it (pinned by the batch==stream pytest)")
def _q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from .streaming.source import events_stream
    from .streaming.windows import run_to_memory, session_aggs

    stream = events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out = session_aggs(stream, gap="30 minutes", watermark=None)
    name = f"q109_sink_{uuid.uuid4().hex[:8]}"
    run_to_memory(out, name, output_mode="complete")
    return (
        spark.table(name)
        .select("user_id", "n", "t0", "t1")
        .orderBy("user_id", "t0")
    )


@_op("q112_create_stream_sql", f"""
{_DUCK_EVENTS_SHIM}
SELECT date_trunc('hour', ts) AS w, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
FROM events GROUP BY 1, 2 ORDER BY w, event_type
""", note="STREAMING declared query #3 (VERDICT r4 item 5): the stream is "
          "driven by SQL TEXT — CREATE STREAM <name> AS SELECT window "
          "agg FROM events — through Engine.sql (no Python streaming "
          "API in the query); the engine re-binds events to a file "
          "stream, drains availableNow into a memory sink, and the "
          "result must hash-match the q45 tumbling batch oracle")
def _q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from duckdb_read_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.register_fixture_dir(sf_dir)
    name = f"q112_sink_{uuid.uuid4().hex[:8]}"
    eng.sql(
        f"CREATE STREAM {name} AS "
        "SELECT window.start AS w, event_type, COUNT(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sv "
        "FROM events GROUP BY window(ts, '1 hour'), event_type"
    )
    return (
        spark.table(name)
        .select("w", "event_type", "n", F.col("sv").cast("double").alias("sv"))
        .orderBy("w", "event_type")
    )


@_op("q108_paragraph_dedup", """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
paras AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[(i*12+1):(i*12+12)], ' ') AS para
  FROM (SELECT doc_id, t,
               UNNEST(range(0, CAST(ceil(len(t)/12.0) AS BIGINT))) AS i
        FROM toks)
),
ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
  FROM paras
)
SELECT doc_id,
       COUNT(*) AS n_paras,
       COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN para END,
                               e'\n\n' ORDER BY pos), '')) AS kept_md5
FROM ranked GROUP BY doc_id ORDER BY doc_id
""", note="corpus-wide paragraph-level dedup keep-first (the boilerplate-"
          "removal step of crawl pipelines; L1 at sub-document "
          "granularity). Fixture docs have no newlines, so both sides "
          "chunk tokens into 12-token pseudo-paragraphs first; the "
          "operator reassembles surviving paragraphs in order and the "
          "md5 of the reassembled text must hash-match DuckDB's ordered "
          "string_agg")
def _q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(12.0)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
    )
    chunked = docs.select(
        "doc_id", F.array_join(paras, "\n\n").alias("text2"))
    out = ops.dedup_paragraphs(chunked, text_col="text2", id_col="doc_id",
                               sep="\n\n")
    return out.select(
        "doc_id", "n_paras", "n_kept", F.md5("text_kept").alias("kept_md5")
    ).orderBy("doc_id")


@_op("q110_entropy_stats", """
WITH ch AS (SELECT doc_id, UNNEST(string_split_regex(text, '')) AS s
            FROM documents),
chf AS (SELECT doc_id, s, CAST(COUNT(*) AS DOUBLE) AS c
        FROM ch WHERE s <> '' GROUP BY doc_id, s),
che AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
               log2(SUM(c)) - SUM(c * log2(c)) / SUM(c) AS e
        FROM chf GROUP BY doc_id),
tk AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS s FROM documents),
tkf AS (SELECT doc_id, s, CAST(COUNT(*) AS DOUBLE) AS c
        FROM tk GROUP BY doc_id, s),
tke AS (SELECT doc_id, log2(SUM(c)) - SUM(c * log2(c)) / SUM(c) AS e
        FROM tkf GROUP BY doc_id)
SELECT che.doc_id, n_chars,
       CAST(CAST(round(che.e, 6) AS DECIMAL(12,6)) AS DOUBLE) AS char_entropy,
       CAST(CAST(round(tke.e, 6) AS DECIMAL(12,6)) AS DOUBLE) AS token_entropy
FROM che JOIN tke ON che.doc_id = tke.doc_id ORDER BY che.doc_id
""", note="L4 quality: per-document Shannon entropy of the character and "
          "token distributions (gibberish/spam band filter — natural "
          "prose ≈ 4-4.5 char bits, repeated spam → 0, noise → "
          "log2(alphabet)); log2(n) - Σ c·log2(c)/n on both engines, "
          "rounded to 6 d.p. before the hash compare")
def _q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = ops.entropy_stats(docs)
    return out.select(
        "doc_id", "n_chars",
        F.col("char_entropy").cast("decimal(12,6)").cast("double").alias("char_entropy"),
        F.col("token_entropy").cast("decimal(12,6)").cast("double").alias("token_entropy"),
    ).orderBy("doc_id")


@_op("q111_corpus_lm_score", """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (SELECT doc_id, t[i-1] AS prev, t[i] AS tok
       FROM (SELECT doc_id, t, UNNEST(range(2, len(t)+1)) AS i FROM toks)),
cnt AS (SELECT prev, tok, CAST(COUNT(*) AS DOUBLE) AS c
        FROM bg GROUP BY prev, tok),
ctx AS (SELECT prev, SUM(c) AS cp FROM cnt GROUP BY prev)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(CAST(round(AVG(-log2(c / cp)), 6) AS DECIMAL(12,6)) AS DOUBLE)
         AS cross_entropy
FROM bg JOIN cnt USING (prev, tok) JOIN ctx USING (prev)
GROUP BY doc_id ORDER BY doc_id
""", note="L4 quality: the perplexity-filter signal — per-document "
          "cross-entropy under the corpus's own bigram LM (avg of "
          "-log2 c(prev,tok)/c(prev)); MLE is total because every "
          "scored bigram is in the counts. Both engines compute the "
          "identical formula, rounded to 6 d.p.")
def _q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = ops.corpus_bigram_scores(docs)
    return out.select(
        "doc_id", "n_bigrams",
        F.col("cross_entropy").cast("decimal(12,6)").cast("double")
        .alias("cross_entropy"),
    ).orderBy("doc_id")


@_op("q113_time_partitioned_scan", """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hr, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY 1 ORDER BY 1
""", note="register_parquet(time_partition=True): the ns-ts table is "
          "materialized once into a hive day-partitioned layout and the "
          "literal ts range gains an injected p_date predicate → partition "
          "pruning + row-group pushdown (plan-gated in test_plans); the "
          "oracle runs the same range agg on the flat events view")
def _q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q113_"))
    eng.register_parquet(
        "ev_tp113", os.path.join(sf_dir, "events.parquet"), time_partition=True)
    return eng.sql("""
SELECT CAST(date_trunc('hour', ts) AS STRING) AS hr, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
FROM ev_tp113
WHERE ts >= '2024-01-05 00:00:00' AND ts < '2024-01-12 00:00:00'
GROUP BY 1 ORDER BY 1""")


@_op("q114_bm25_search", """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
qtf AS (SELECT * FROM tf WHERE term IN ('hash', 'join', 'stream', 'window')),
dfreq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY 1),
w AS (
  SELECT q.doc_id,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (q.tf * 2.2)
         / (q.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) AS w
  FROM qtf q JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, round(SUM(w), 6) AS bm25
FROM w GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10
""", note="BM25 keyword retrieval (operators/retrieval.bm25_topk, L19): one "
          "tf shuffle + broadcast idf/corpus-stats joins, all JVM; the "
          "oracle spells the identical Okapi/Lucene-idf formula in SQL")
def _q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.bm25_topk(docs, ["hash", "join", "stream", "window"], k=10)


@_op("q115_tfidf_vectors", None,
     note="hashed TF-IDF document vectors (operators/retrieval."
          "tfidf_vectors, L20): xxhash64 bucketing is Spark-specific so "
          "no SQL oracle (rows-only, like the other hash-family ops); "
          "determinism + similarity quality pinned by pytest")
def _q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vecs = ops.tfidf_vectors(docs, n_features=128)
    return vecs.select(
        "doc_id",
        F.round(F.aggregate("tfidf", F.lit(0.0), lambda a, x: a + x * x), 4)
        .alias("sq_norm"),
    ).orderBy("doc_id")


@_op("q116_restore_lifecycle", """
SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM orders WHERE o_orderkey < 1500
""", note="RESTORE TABLE (D21): CTAS -> DELETE -> RESTORE TO VERSION 1; "
          "the metadata-only restore must make the destructive DELETE "
          "invisible, so the oracle is a plain SELECT of the original cut")
def _q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q116_"))
    eng.execute("""
CREATE TABLE t116 AS
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1500;
DELETE FROM t116 WHERE o_orderkey % 3 = 0;
RESTORE TABLE t116 TO VERSION AS OF 1;
""")
    return eng.sql("""
SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t116""")


@_op("q117_transaction_rollback", """
SELECT COUNT(*) AS n, MIN(c_custkey) AS mn,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM customer WHERE c_custkey < 1000
""", note="session transactions (D23): BEGIN -> DELETE + UPDATE -> "
          "ROLLBACK; compensation must restore the exact pre-BEGIN state, "
          "so the oracle is a plain SELECT of the original cut")
def _q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q117_"))
    eng.execute("""
CREATE TABLE t117 AS
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 1000;
BEGIN TRANSACTION;
DELETE FROM t117 WHERE c_custkey % 2 = 0;
UPDATE t117 SET c_acctbal = 0 WHERE c_custkey % 5 = 1;
ROLLBACK;
""")
    return eng.sql("""
SELECT COUNT(*) AS n, MIN(c_custkey) AS mn,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t117""")


@_op("q118_stream_versioned_sink", """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
FROM events GROUP BY event_type ORDER BY event_type
""", note="streaming sink into a versioned table (T10): events replayed "
          "as a file stream, each micro-batch an append commit with "
          "exactly-once batch ids; reading the committed table back must "
          "match the batch aggregate over the raw events")
def _q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from . import snapshots
    from .streaming import events_stream, write_stream_versioned

    work = tempfile.mkdtemp(prefix="ddbrs_q118_")
    src = events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    write_stream_versioned(
        src.select("event_type", "value"),
        os.path.join(work, "tbl"), os.path.join(work, "ck"))
    out = snapshots.read_table(spark, os.path.join(work, "tbl"))
    return (out.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                 .cast("double").alias("sv"))
            .orderBy("event_type"))


@_op("q120_chunk_documents", """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 300),
     c AS (SELECT doc_id, toks,
                  CAST(greatest(1, ceil((len(toks) - 16) / 48.0)) AS INT) AS nc
           FROM t)
SELECT doc_id, gs.i AS chunk_id,
       array_to_string(toks[gs.i * 48 + 1 : gs.i * 48 + 64], ' ') AS chunk
FROM c, UNNEST(generate_series(0, nc - 1)) AS gs(i)
ORDER BY doc_id, chunk_id
""", note="overlapping context-window chunking (operators/packing."
          "chunk_documents, L21): explode(sequence) flatMap, zero "
          "shuffles; oracle = lateral generate_series + 1-based list "
          "slicing spelling the identical stride arithmetic")
def _q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 300")
    return ops.chunk_documents(
        docs, chunk_tokens=64, overlap=16).orderBy("doc_id", "chunk_id")


# DECOMPOSED suffix: 'e' + U+0301 combining acute (NFC must compose it
# to U+00E9) plus a stray combining diaeresis; declared as escapes so the
# source stays visibly ASCII, and interpolated into the oracle text so
# both engines see the identical codepoints.
_Q121_SUFFIX = " cafe\u0301 a\u0308"


@_op("q121_unicode_normalize", f"""
SELECT doc_id,
       md5(nfc_normalize(substr(text, 1, 40) || '{_Q121_SUFFIX}')) AS h
FROM documents WHERE doc_id < 200 ORDER BY doc_id
""", note="unicode canonicalization (operators/text.normalize_text, "
          "L22): NFC over text carrying decomposed combining-mark "
          "sequences; the md5 only matches if both engines compose them "
          "identically (the fixture body is ASCII — the appended "
          "decomposed suffix is what the oracle actually tests)")
def _q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load_table(spark, sf_dir, "documents")
            .where("doc_id < 200")
            .withColumn("text", F.concat(F.expr("substr(text, 1, 40)"),
                                         F.lit(_Q121_SUFFIX))))
    return (ops.normalize_text(docs, form="NFC")
            .select("doc_id", F.md5("text").alias("h"))
            .orderBy("doc_id"))


@_op("q122_iceberg_interop", """
SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM orders WHERE o_orderkey < 2000
""", note="Iceberg table-format interop (iceberglog, VERDICT r5 item 1): "
          "an orders cut exported as a spec-shaped v2 Iceberg table "
          "(manifest-list/manifest Avro, vN.metadata.json), then an "
          "overwrite snapshot shrinks it and VERSION AS OF 1 reads the "
          "ORIGINAL snapshot back — so the oracle is a plain SELECT of "
          "the original cut; wrong manifest replay or broken time travel "
          "hash-mismatches")
def _q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from . import iceberglog
    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q122_"))
    d = tempfile.mkdtemp(prefix="ddbrs_q122_ice_")
    cut = eng.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 2000")
    iceberglog.write_table(cut, d)                       # snapshot 1
    iceberglog.write_table(cut.where("o_orderkey < 100"), d,
                           mode="overwrite")             # snapshot 2
    eng.register_versioned("t122", d)
    return eng.sql("""
SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t122 VERSION AS OF 1""")


@_op("q123_clone_lifecycle", """
WITH cut AS (SELECT c_custkey, c_acctbal FROM customer
             WHERE c_custkey < 1200)
SELECT 'clone_now' AS side, COUNT(*) AS n, MIN(c_custkey) AS mn,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM cut WHERE c_custkey % 4 <> 1
UNION ALL
SELECT 'clone_v1', COUNT(*), MIN(c_custkey),
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM cut
UNION ALL
SELECT 'src', COUNT(*), MIN(c_custkey),
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM cut
ORDER BY side
""", note="zero-copy CLONE (VERDICT r5 item 2, Neon branch motif): CTAS "
          "-> CLONE -> destructive DELETE on the clone; the source must "
          "be untouched ('src'), the clone's v1 must still replay the "
          "full fork point ('clone_v1'), and the clone head shows the "
          "divergence ('clone_now') — all three legs reduce to plain "
          "SELECTs over the original cut for the oracle")
def _q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q123_"))
    eng.execute("""
CREATE TABLE t123 AS
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 1200;
CREATE TABLE t123c CLONE t123;
DELETE FROM t123c WHERE c_custkey % 4 = 1;
""")
    return eng.sql("""
SELECT 'clone_now' AS side, COUNT(*) AS n, MIN(c_custkey) AS mn,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t123c
UNION ALL
SELECT 'clone_v1', COUNT(*), MIN(c_custkey),
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
FROM t123c VERSION AS OF 1
UNION ALL
SELECT 'src', COUNT(*), MIN(c_custkey),
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM t123
ORDER BY side""")


@_op("q124_fts_sql_surface", """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
qtf AS (SELECT * FROM tf WHERE term IN ('hash', 'join', 'stream', 'window')),
dfreq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY 1),
w AS (
  SELECT q.doc_id,
         ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (q.tf * 2.2)
         / (q.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) AS w
  FROM qtf q JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, round(SUM(w), 6) AS bm25
FROM w GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10
""", note="SQL-reachable BM25 (VERDICT r5 item 3): the DuckDB fts "
          "statement shapes — PRAGMA create_fts_index + "
          "fts_main_t.match_bm25 — drive the engine from SQL TEXT alone "
          "(rewritten onto retrieval.bm25_scores as a correlated scalar "
          "subquery); this DuckDB build cannot load its fts extension "
          "offline, so the oracle spells the identical Okapi arithmetic "
          "as CTEs (same oracle family as q114, which pins the operator "
          "API path)")
def _q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q124_"))
    eng.register_fixture_dir(sf_dir)
    eng.sql("PRAGMA create_fts_index('documents', 'doc_id', 'text')")
    return eng.sql("""
SELECT doc_id, bm25 FROM (
  SELECT doc_id,
         fts_main_documents.match_bm25(doc_id,
             'hash join stream window') AS bm25
  FROM documents) t
WHERE bm25 IS NOT NULL ORDER BY bm25 DESC, doc_id LIMIT 10""")


_Q125_TEXT = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,4))) AS sv
  FROM events GROUP BY 1)
SELECT CAST(d.gs AS DATE) AS day, COALESCE(dd.n, 0) AS n,
       CAST(COALESCE(dd.sv, 0) AS DOUBLE) AS sv
FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-09',
                     INTERVAL '1 day') AS d(gs)
LEFT JOIN daily dd ON dd.day = CAST(d.gs AS DATE)
ORDER BY day
"""


@_op("q125_gapfill_date_spine", f"""
WITH events AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM main.events),
{_Q125_TEXT.strip()[5:]}
""", note="date-spine gap fill via the TEMPORAL generate_series TVF "
          "(VERDICT r5 item 6): the SAME spine/join/zero-fill SQL runs in "
          "both engines (modulo the oracle's ts-shim CTE) — the spine is "
          "40 literal-bounded days regardless of data size, and empty "
          "tail days must appear as zero rows in both")
def _q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q125_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q125_TEXT, dialect="duckdb")


@_op("q128_hudi_interop", """
SELECT COUNT(*) AS n, MIN(n_nationkey) AS mn, MAX(n_nationkey) AS mx,
       COUNT(DISTINCT n_regionkey) AS nr
FROM nation WHERE n_nationkey < 20
""", note="Hudi COPY_ON_WRITE interop (hudilog): nation exported as a "
          "spec-shaped .hoodie timeline (two commits updating one file "
          "group + a replacecommit clustering), read back at the instant "
          "where the state equals the plain oracle SELECT; wrong "
          "timeline replay (double-reading a replaced base slice, "
          "surfacing pending instants) hash-mismatches")
def _q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import tempfile

    from . import hudilog

    d = tempfile.mkdtemp(prefix="ddbrs_q128_hudi_") + "/t"
    os.makedirs(os.path.join(d, ".hoodie"))
    with open(os.path.join(d, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")

    def base_file(df, rel):
        tmp = os.path.join(d, rel + ".dir")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
        os.makedirs(os.path.dirname(os.path.join(d, rel)), exist_ok=True)
        os.replace(os.path.join(tmp, part), os.path.join(d, rel))

    def commit(ts, writes, replaces=None):
        body = {"partitionToWriteStats": writes}
        act = "commit"
        if replaces:
            body["partitionToReplaceFileIds"] = replaces
            act = "replacecommit"
        with open(os.path.join(d, ".hoodie", f"{ts}.{act}"), "w") as f:
            _json.dump(body, f)

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey")
    # commit 1: stale slice of group g1 (will be superseded)
    base_file(nation.where("n_nationkey < 5"), "p/g1_0-0-1_001.parquet")
    commit("001", {"p": [{"fileId": "g1",
                          "path": "p/g1_0-0-1_001.parquet"}]})
    # commit 2: g1's newer slice + group g2 → exactly the oracle's cut
    base_file(nation.where("n_nationkey < 10"), "p/g1_0-0-2_002.parquet")
    base_file(nation.where("n_nationkey >= 10 AND n_nationkey < 20"),
              "p/g2_0-0-2_002.parquet")
    commit("002", {"p": [
        {"fileId": "g1", "path": "p/g1_0-0-2_002.parquet"},
        {"fileId": "g2", "path": "p/g2_0-0-2_002.parquet"}]})
    # a later replacecommit + a pending instant: the time-travel read at
    # instant 002 must see neither
    base_file(nation.where("n_nationkey < 2"), "p/g3_0-0-3_003.parquet")
    commit("003", {"p": [{"fileId": "g3",
                          "path": "p/g3_0-0-3_003.parquet"}]},
           replaces={"p": ["g1", "g2"]})
    open(os.path.join(d, ".hoodie", "004.commit.inflight"), "w").close()

    df = hudilog.read_hudi_table(spark, d, instant="002")
    df.createOrReplaceTempView("t128")
    return spark.sql("""
SELECT COUNT(*) AS n, MIN(n_nationkey) AS mn, MAX(n_nationkey) AS mx,
       COUNT(DISTINCT n_regionkey) AS nr
FROM t128""")


@_op("q129_source_report", """
WITH d AS (
  SELECT source, lang,
         COUNT(*) OVER (PARTITION BY md5(text)) > 1 AS dup,
         len(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(ROUND(SUM(CASE WHEN dup THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS DOUBLE) AS dup_rate,
       CAST(ROUND(AVG(CAST(toks AS DOUBLE)), 6) AS DOUBLE) AS mean_tokens,
       COUNT(DISTINCT lang) AS n_langs,
       (COUNT(*) >= 5
        AND SUM(CASE WHEN dup THEN 1 ELSE 0 END) * 1.0 / COUNT(*) <= 0.5
        AND AVG(CAST(toks AS DOUBLE)) >= 5.0) AS keep
FROM d GROUP BY source ORDER BY source
""", note="source/domain-level curation report (RefinedWeb/C4 pattern): "
          "corpus-wide dup rate, token mean, language mix and a keep "
          "decision per source — one md5 window + one source agg, full "
          "oracle twin")
def _q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.source_report(docs)


@_op("q130_delta_roundtrip_sql", """
SELECT COUNT(*) AS n, MIN(c_custkey) AS mn, MAX(c_custkey) AS mx,
       COUNT(DISTINCT c_nationkey) AS nn
FROM customer WHERE c_custkey <= 500
""", note="SQL-only Delta round-trip: COPY (FORMAT DELTA) exports a "
          "customer cut, a second COPY appends, delta_scan reads the "
          "union back — exercises export, append and the scan TVF in "
          "one hash-checked path")
def _q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q130_"))
    eng.register_fixture_dir(sf_dir)
    d = tempfile.mkdtemp(prefix="ddbrs_q130_delta_") + "/t"
    eng.sql(f"COPY (SELECT c_custkey, c_nationkey FROM customer "
            f"WHERE c_custkey <= 500 AND c_custkey % 2 = 0) TO '{d}' "
            f"(FORMAT DELTA)")
    eng.sql(f"COPY (SELECT c_custkey, c_nationkey FROM customer "
            f"WHERE c_custkey <= 500 AND c_custkey % 2 = 1) TO '{d}' "
            f"(FORMAT DELTA)")
    return eng.sql(f"""
SELECT COUNT(*) AS n, MIN(c_custkey) AS mn, MAX(c_custkey) AS mx,
       COUNT(DISTINCT c_nationkey) AS nn
FROM delta_scan('{d}')""")


@_op("q131_iceberg_v2_deletes", """
WITH cut AS (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey < 1500),
numbered AS (SELECT o_orderkey, o_totalprice,
                    row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
             FROM cut)
SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM numbered WHERE pos NOT IN (1, 5, 10, 20, 21)
""", note="Iceberg v2 row-level deletes (merge-on-read): an orders cut "
          "exported as one sorted parquet snapshot, then a delete "
          "snapshot removes sorted positions 1/5/10 POSITIONALLY and "
          "the keys at positions 20/21 via an EQUALITY delete file — "
          "the registered read applies both anti-joins, so the oracle "
          "is a row_number() filter over the same cut; wrong position "
          "addressing, equality matching, or sequence scoping "
          "hash-mismatches")
def _q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from . import iceberglog
    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q131_"))
    eng.register_fixture_dir(sf_dir)
    d = tempfile.mkdtemp(prefix="ddbrs_q131_ice_")
    cut = eng.sql("SELECT o_orderkey, o_totalprice FROM orders "
                  "WHERE o_orderkey < 1500")
    iceberglog.write_table(
        cut.coalesce(1).sortWithinPartitions("o_orderkey"), d)  # seq 1
    (target,) = iceberglog.snapshot_data_files(d)
    eq_keys = [r.o_orderkey for r in
               cut.orderBy("o_orderkey").limit(22).collect()[20:22]]
    iceberglog.write_deletes(
        d, pos={target: [1, 5, 10]},
        eq_rows=[{"o_orderkey": k} for k in eq_keys],
        eq_ids=[1])                                             # seq 2
    eng.register_versioned("t131", d)
    return eng.sql("""
SELECT COUNT(*) AS n, MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t131""")


@_op("q133_positional_join", """
SELECT c_custkey, c_nationkey, n_name
FROM customer POSITIONAL JOIN nation
ORDER BY c_custkey
""", note="POSITIONAL JOIN (DuckDB by-row-position pairing): Spark-first "
          "as footer-derived file offsets + _metadata.row_index — the "
          "global position is a zero-shuffle projection, never a global "
          "sort — full-outer-joined on the position (NULL-pads the "
          "shorter side exactly like DuckDB); the oracle runs DuckDB's "
          "native POSITIONAL JOIN verbatim")
def _q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    joined = ops.positional_join(
        spark,
        os.path.join(sf_dir, "customer.parquet"),
        os.path.join(sf_dir, "nation.parquet"))
    return (joined.select("c_custkey", "c_nationkey", "n_name")
            .orderBy("c_custkey"))


@_op("q134_temperature_mix", """
WITH d AS (SELECT doc_id,
        CASE WHEN CAST(substr(source, 4) AS INTEGER) < 15 THEN 'head'
             WHEN CAST(substr(source, 4) AS INTEGER) < 18 THEN 'mid'
             ELSE 'tail' END AS grp FROM documents),
nn AS (SELECT grp, COUNT(*) AS n_s FROM d GROUP BY grp),
w AS (SELECT grp, n_s, power(n_s, 0.7) AS u FROM nn),
f AS (SELECT grp, n_s,
        LEAST(1.0, (SELECT SUM(n_s) FROM nn) * (u / (SELECT SUM(u) FROM w))
              / n_s) AS frac FROM w),
th AS (SELECT grp,
        CASE WHEN round(frac * 4294967296) >= 4294967296 THEN 'g'
             ELSE lpad(lower(to_hex(CAST(round(frac * 4294967296)
                                         AS BIGINT))), 8, '0')
        END AS cutoff FROM f)
SELECT grp, COUNT(*) AS kept
FROM d JOIN th USING (grp)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 8) < cutoff
GROUP BY grp ORDER BY grp
""", note="temperature-scaled corpus mixing (p_s ∝ n_s^0.7, the "
          "multilingual/multi-domain rebalancing rule): sources are "
          "grouped into a skewed head/mid/tail layout, the operator "
          "flattens it with deterministic md5-threshold sampling, and "
          "the oracle recomputes the EXACT per-group thresholds and "
          "membership in SQL — weights, caps, hex cutoffs and md5 "
          "membership all hash-checked cross-engine")
def _q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.withColumn(
        "grp",
        F.when(F.expr("CAST(substring(source, 4) AS INT)") < 15, "head")
        .when(F.expr("CAST(substring(source, 4) AS INT)") < 18, "mid")
        .otherwise("tail"))
    mixed = ops.temperature_mix(d, key_col="doc_id", source_col="grp",
                                temperature=0.7, salt="mix")
    return (mixed.groupBy("grp").agg(F.count("*").alias("kept"))
            .orderBy("grp"))


@_op("q135_delta_deletion_vectors", """
WITH cut AS (SELECT c_custkey, c_acctbal FROM customer
             WHERE c_custkey < 800),
numbered AS (SELECT c_custkey, c_acctbal,
                    row_number() OVER (ORDER BY c_custkey) - 1 AS pos
             FROM cut)
SELECT COUNT(*) AS n, MIN(c_custkey) AS mn, MAX(c_custkey) AS mx,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM numbered WHERE pos NOT IN (2, 4, 8, 100)
""", note="Delta deletion vectors (merge-on-read): a customer cut as a "
          "foreign _delta_log table over one sorted parquet file, then "
          "attach_deletion_vector commits a spec-shaped DV (portable "
          "RoaringBitmapArray, Z85 UUID file, size/CRC framing, "
          "protocol feature upgrade) deleting sorted positions "
          "2/4/8/100 — the registered read anti-joins them out, so the "
          "oracle is a row_number() filter; wrong roaring decode, Z85, "
          "framing, or anti-join addressing hash-mismatches")
def _q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import tempfile

    from . import deltalog
    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q135_"))
    eng.register_fixture_dir(sf_dir)
    d = tempfile.mkdtemp(prefix="ddbrs_q135_delta_")
    cut = eng.sql("SELECT c_custkey, c_acctbal FROM customer "
                  "WHERE c_custkey < 800")
    full = os.path.join(d, "f0")
    (cut.coalesce(1).sortWithinPartitions("c_custkey")
     .write.mode("overwrite").parquet(full))
    rel = next(f"f0/{f}" for f in sorted(os.listdir(full))
               if f.endswith(".parquet"))
    ddir = os.path.join(d, "_delta_log")
    os.makedirs(ddir)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t135",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": cut.schema.json(),
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 0}},
        {"add": {"path": rel, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(ddir, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(_json.dumps(a) for a in actions) + "\n")
    deltalog.attach_deletion_vector(d, rel, [2, 4, 8, 100])
    eng.register_versioned("t135", d)
    return eng.sql("""
SELECT COUNT(*) AS n, MIN(c_custkey) AS mn, MAX(c_custkey) AS mx,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM t135""")


@_op("q126_semantic_dedup", None,
     note="SemDeDup (k-means cells + within-cell cosine, arXiv 2303.09540)"
          " — kept ids are k-means-dependent (engine-specific), so "
          "rows-only; exact-dup removal and pair-subset properties are "
          "pinned in tests/test_operators.py")
def _q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    kept = ops.semantic_dedup(emb, threshold=0.4, n_cells=8, iters=3,
                              sample_fraction=0.3)
    return kept.select("vec_id").orderBy("vec_id")


@_op("q127_kmeans_cell_profile", None,
     note="trained-quantizer cell histogram: k-means cell sizes + mean "
          "within-cell similarity to the centroid — the IVF balance "
          "signal an operator would tune n_cells with; centroids are "
          "engine-specific floats, so rows-only")
def _q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ops.kmeans_centroids(emb, n_cells=8, iters=3,
                                 sample_fraction=0.3)
    assigned = ops.ivf_assign(emb, cents)
    return (assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("cell"))


@_op("q137_change_data_feed", """
WITH cut AS (SELECT c_custkey AS k, c_acctbal AS b FROM customer
             WHERE c_custkey < 1500),
ins AS (SELECT c_custkey + 100000 AS k, c_acctbal AS b FROM customer
        WHERE c_custkey < 300),
v2 AS (SELECT * FROM cut UNION ALL SELECT * FROM ins),
v3 AS (SELECT k, CASE WHEN k % 5 = 0 THEN b + 10 ELSE b END AS b FROM v2),
feed AS (
  SELECT 'insert' AS change_type, k, b FROM ins
  UNION ALL
  SELECT 'update_preimage', k, b FROM v2 WHERE k % 5 = 0
  UNION ALL
  SELECT 'update_postimage', k, b + 10 FROM v2 WHERE k % 5 = 0
  UNION ALL
  SELECT 'delete', k, b FROM v3 WHERE k % 7 = 0
)
SELECT change_type, COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx,
       CAST(SUM(CAST(b AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM feed GROUP BY change_type ORDER BY change_type
""", note="change data feed (Delta CDF table_changes surface): CTAS -> "
          "INSERT -> UPDATE -> DELETE, then the v2..v4 feed aggregated "
          "per _change_type; the oracle replays the same lifecycle as "
          "pure CTEs over the customer cut (inserts = the appended "
          "batch, update pre/post = the %5 rows of the v2 state, "
          "deletes = the %7 rows of the v3 state)")
def _q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q137_"))
    eng.execute("""
CREATE TABLE t137 AS
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 1500;
INSERT INTO t137
  SELECT c_custkey + 100000, c_acctbal FROM customer WHERE c_custkey < 300;
UPDATE t137 SET c_acctbal = c_acctbal + 10 WHERE c_custkey % 5 = 0;
DELETE FROM t137 WHERE c_custkey % 7 = 0;
""")
    return eng.sql("""
SELECT _change_type AS change_type, COUNT(*) AS n,
       MIN(c_custkey) AS mn, MAX(c_custkey) AS mx,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM table_changes('t137', 2, 4)
GROUP BY _change_type ORDER BY change_type""")


_Q138_SQL = """
SELECT c_custkey,
       round(jaro_winkler_similarity(c_name, 'Customer#000000420'), 6)
         AS jw,
       damerau_levenshtein(substr(c_name, 10), '000000420') AS dl
FROM customer
WHERE c_custkey < 1000
ORDER BY jw DESC, dl, c_custkey
LIMIT 25
"""


@_op("q138_fuzzy_match", _Q138_SQL,
     note="fuzzy-matching surface (DuckDB core jaro_winkler_similarity / "
          "damerau_levenshtein, here session Arrow UDFs — the JVM lacks "
          "the builtins): rank customer names against a probe key; both "
          "engines run the IDENTICAL text, values measured equal (same "
          "double arithmetic), rounded per SURVEY §2.0 anyway")
def _q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q138_"))
    return eng.sql(_Q138_SQL)


@_op("q139_stream_table_source", """
WITH cut AS (SELECT c_custkey AS k, c_acctbal AS b FROM customer
             WHERE c_custkey < 900),
unioned AS (SELECT * FROM cut
         UNION ALL
         SELECT c_custkey + 50000, c_acctbal FROM customer
         WHERE c_custkey < 200)
SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx,
       CAST(SUM(CAST(b AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM unioned
""", note="T11 streaming SOURCE: a versioned table (CTAS + one append) "
          "drained as a REAL file stream (availableNow -> memory sink), "
          "then aggregated; the oracle is the same two-leg union as "
          "plain SELECTs — batch/stream duality on the table log")
def _q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q139_"))
    eng.execute("""
CREATE TABLE t139 AS
  SELECT c_custkey AS k, c_acctbal AS b FROM customer
  WHERE c_custkey < 900;
INSERT INTO t139
  SELECT c_custkey + 50000, c_acctbal FROM customer WHERE c_custkey < 200;
""")
    sink = f"q139_sink_{uuid.uuid4().hex[:8]}"
    q = (eng.read_stream("t139").writeStream
         .format("memory").queryName(sink)
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="ddbrs_q139_ck_"))
         .trigger(availableNow=True).start())
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "q139: availableNow drain did not finish in 300s — "
            "refusing to aggregate a partially-filled sink")
    return spark.sql(f"""
SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx,
       CAST(SUM(CAST(b AS DECIMAL(18,2))) AS DOUBLE) AS sv
FROM {sink}""")


_Q140_TEXT = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
pairs AS (
  SELECT a.label AS label,
         CAST(CAST(list_cosine_similarity(a.v, b.v) AS DECIMAL(12,6))
              AS DOUBLE) AS cs,
         CAST(CAST(list_distance(a.v, b.v) AS DECIMAL(12,6))
              AS DOUBLE) AS dist,
         CAST(CAST(list_inner_product(a.v, b.v) AS DECIMAL(12,6))
              AS DOUBLE) AS ip
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1 AND b.label = a.label
)
SELECT label, COUNT(*) AS pairs,
       CAST(SUM(CAST(cs AS DECIMAL(18,6))) AS DOUBLE) AS sum_cs,
       MIN(dist) AS min_dist, MAX(ip) AS max_ip
FROM pairs GROUP BY label ORDER BY label
"""


@_op("q140_vector_sql_surface", _Q140_TEXT,
     note="F17 vector function family driven from VERBATIM DuckDB SQL in "
          "both engines (q48 hand-wrote the Spark HOF; this goes through "
          "the dialect rewrite): per-label stats over consecutive same-"
          "label pairs. DOUBLE[] casts force double math over the float32 "
          "embeddings; each pair value snaps to 6-d.p. decimal BEFORE the "
          "aggregate, and the sum aggregates decimals (SURVEY §2.0 no-raw-"
          "float-aggregation rule). The pair join is an equi-join on "
          "(vec_id+1, label) — shuffle-partitionable, no cross product")
def _q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q140_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q140_TEXT, dialect="duckdb")


@_op("q141_duplicate_spans", """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
  FROM documents
),
long AS (SELECT * FROM toks WHERE len(w) >= 20),
spans AS (
  SELECT doc_id,
         md5(array_to_string(array_slice(w, i, i + 19), ' ')) AS span_hash
  FROM long, UNNEST(generate_series(1, len(w) - 19)) AS s(i)
)
SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM spans
GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, span_hash
""", note="L26 exact substring-span dedup (the sliding-window flavor of "
          "training-data dedup): every 20-token span shared verbatim by "
          ">= 2 documents. The operator is one flatMap (a row per token "
          "window) + ONE hash groupBy with map-side combine — linear in "
          "corpus tokens, no pairwise work; the oracle rebuilds the same "
          "windows with a lateral UNNEST(generate_series) + array_slice")
def _q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ops.duplicate_spans(docs, window=20, min_docs=2)


_Q142_TEXT = """
SELECT o_orderpriority AS pri,
       string_agg(DISTINCT o_orderstatus ORDER BY o_orderstatus)
         AS statuses,
       first(o_orderkey ORDER BY o_orderdate, o_orderkey) AS first_k,
       last(o_orderkey ORDER BY o_orderdate, o_orderkey) AS last_k,
       count(*) FILTER (dayofweek(o_orderdate) = 0) AS sundays,
       count(*) FILTER (yearweek(CAST(o_orderdate AS DATE)) % 2 = 0)
         AS even_weeks
FROM orders
GROUP BY pri ORDER BY pri
"""


@_op("q142_function_breadth", _Q142_TEXT,
     note="late-r6 function breadth from VERBATIM DuckDB SQL: 1-arg "
          "string_agg default ',' separator (a silent wrong answer "
          "before the rewrite), DISTINCT+ORDER BY form, ordered "
          "first/last over a MULTI-KEY sort (struct-wrapped min_by/"
          "max_by), the FILTER-without-WHERE shorthand, and the "
          "dayofweek/yearweek collision fixes (0-based-Sunday / "
          "ISO year*100+week) — all inside one grouped query whose "
          "plan is a single partial->final aggregation")
def _q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q142_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q142_TEXT, dialect="duckdb")


_Q143_TEXT = """
SELECT doc_id,
       nfc_normalize('e' || chr(769) || lang) AS recomposed,
       strip_accents('Ång-' || substr(text, 1, 12)) AS stripped,
       strip_accents(nfc_normalize(text)) = text AS ascii_clean,
       regexp_replace(substr(text, 1, 40), ' ', '_') AS first_only
FROM documents
ORDER BY doc_id
LIMIT 300
"""


@_op("q143_unicode_normalize_sql", _Q143_TEXT,
     note="L22 as SQL (r7): nfc_normalize/strip_accents registered as "
          "session UDFs on the F14 precedent so VERBATIM DuckDB text "
          "runs unchanged — strip_accents pinned as NFD -> drop marks "
          "-> NFC recompose (the Hangul case proves utf8proc "
          "recomposes). chr(769) is the combining acute: nfc_normalize "
          "must fuse 'e'+mark into composed 'é' (and exercises the r7 "
          "full-Unicode chr). The trailing regexp_replace pins the "
          "3-arg FIRST-match-only rewrite on real data. Pure "
          "projection: zero shuffles, one Arrow batch boundary")
def _q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q143_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q143_TEXT, dialect="duckdb")


_Q144_TEXT = """
SELECT n_nationkey AS k,
       CASE WHEN n_nationkey IN (1, 3) THEN n_name || '_v2'
            ELSE n_name END AS name
FROM nation WHERE n_nationkey < 10 OR n_nationkey IN (20, 21)
ORDER BY k
"""


@_op("q144_hudi_merge_on_read", _Q144_TEXT,
     note="Hudi MERGE_ON_READ interop (r7, hudilog read_mor_table): a "
          "base parquet slice (keys 0-9) + a spec-framed .log file "
          "whose avro_data blocks update keys 1/3 TWICE (the later "
          "block must win) and insert keys 20/21, merged read-path-"
          "compaction style (newest base + latest log record per "
          "_hoodie_record_key). The oracle recomputes the merged state "
          "from nation directly — a stale-block win, dropped insert or "
          "double-applied base row all hash-mismatch. The log-format "
          "reader itself is pinned by a hand-authored byte fixture in "
          "tests/test_hudi.py")
def _q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import tempfile

    from pyspark.sql import functions as F

    from . import hudilog

    d = tempfile.mkdtemp(prefix="ddbrs_q144_hudi_") + "/t"
    os.makedirs(os.path.join(d, ".hoodie"))
    with open(os.path.join(d, ".hoodie", "hoodie.properties"), "w") as f:
        f.write("hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n")
    nation = load_table(spark, sf_dir, "nation")
    base = (nation.where("n_nationkey < 10")
            .select(F.col("n_nationkey").cast("string")
                    .alias("_hoodie_record_key"),
                    F.col("n_nationkey").cast("long").alias("k"),
                    F.col("n_name").alias("name")))
    tmp = os.path.join(d, "b.tmpdir")
    base.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, part), os.path.join(d, "g1_001.parquet"))
    with open(os.path.join(d, ".hoodie", "001.commit"), "w") as f:
        _json.dump({"partitionToWriteStats": {
            "": [{"fileId": "g1", "path": "g1_001.parquet"}]}}, f)
    names = {r["n_nationkey"]: r["n_name"]
             for r in nation.where(
                 "n_nationkey IN (1, 3, 20, 21)").collect()}
    schema = _json.dumps({
        "type": "record", "name": "rec", "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "k", "type": "long"},
            {"name": "name", "type": "string"}]})

    def rec(k, name):
        return {"_hoodie_record_key": str(k), "k": k, "name": name}

    hudilog.write_log_file(
        os.path.join(d, "g1_002.log.1"), schema,
        [[rec(1, "STALE"), rec(3, names[3] + "_v2")],
         [rec(1, names[1] + "_v2"),
          rec(20, names[20]), rec(21, names[21])]])
    with open(os.path.join(d, ".hoodie", "002.deltacommit"), "w") as f:
        _json.dump({"partitionToWriteStats": {
            "": [{"fileId": "g1", "path": "g1_002.log.1"}]}}, f)
    return (hudilog.read_hudi_table(spark, d)
            .select("k", "name").orderBy("k"))


_Q145_TEXT = """
SELECT c_custkey AS k,
       c_acctbal > ALL (SELECT o_totalprice / 100.0 FROM orders
                        WHERE o_custkey = c_custkey) AS above_all,
       c_nationkey = ANY (SELECT n_nationkey FROM nation
                          WHERE n_regionkey <= 1) AS in_r01,
       c_custkey <> ALL (SELECT o_custkey FROM orders
                         WHERE o_totalprice > 400000) AS no_big_order,
       c_nationkey >= ANY ([10, 20]) AS arr_any
FROM customer WHERE c_custkey <= 200 ORDER BY k
"""


@_op("q145_quantified_comparisons", _Q145_TEXT,
     note="r8: quantified subquery comparisons — = ANY compiles to IN, "
          "<> ALL to NOT IN (semi/anti joins), ordered ALL to a "
          "CASE-over-EXISTS pair with standard 3VL (customers without "
          "orders exercise the empty-set → TRUE arm); the array form "
          "maps to exists()/forall(). Identical text runs on DuckDB.")
def _q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q145_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q145_TEXT, dialect="duckdb")


_Q146_BODY = """
SELECT flag, CAST(quantile_cont(price, 0.25) AS VARCHAR) AS q25,
       CAST(median(price) AS VARCHAR) AS med,
       CAST(mad(price) AS VARCHAR) AS madp,
       CAST(quantile_cont(price, [0.5, 0.9]) AS VARCHAR) AS ql
FROM decprice GROUP BY flag ORDER BY flag
"""

_Q146_TEXT = f"""
WITH decprice AS (SELECT l_returnflag AS flag,
                         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
                  FROM lineitem)
{_Q146_BODY.strip()}
"""


@_op("q146_decimal_ordered_stats", _Q146_TEXT,
     note="r8: DECIMAL-typed ordered statistics — quantile_cont "
          "truncates toward zero to the operand scale, median takes the "
          "lower-middle element (no interpolation), mad interpolates "
          "then truncates; the Spark side reads a registered "
          "DECIMAL(12,2) view so the schema-aware dialect path "
          "dispatches on the decimal kind (judge probe r7)")
def _q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q146_"))
    eng.register_fixture_dir(sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW decprice AS "
        "SELECT l_returnflag AS flag, "
        "CAST(l_extendedprice AS DECIMAL(12,2)) AS price FROM lineitem")
    eng._bump_registration_epoch("decprice")
    return eng.sql(_Q146_BODY, dialect="duckdb")


_Q147_TEXT = """
SELECT extract(hour FROM TIME '13:14:15') AS h,
       CAST(TIME '23:30:00' + INTERVAL 2 HOUR AS VARCHAR) AS wrapped,
       epoch(INTERVAL '1 year 2 days 3 seconds') AS iv_epoch,
       CAST(list_transform([10, 20, 30], (x, i) -> x + i)
            AS VARCHAR) AS idx1,
       list_reduce([1, 2, 3, 4], (a, b, i) -> a + b * i) AS red3,
       CAST(([1, 2, 3, 4, 5, 6])[1:5:2] AS VARCHAR) AS sl,
       'abc' ~ 'a.*' AS rx,
       mad(x) AS madv,
       CAST(bitstring_agg(x, 0, 5) AS VARCHAR) AS bits
FROM (SELECT unnest([1, 3, 4]) AS x)
"""


@_op("q147_scalar_probe_tranche", _Q147_TEXT,
     note="r8 scalar/aggregate tranche as one verbatim-both-engines "
          "query: TIME-literal extract + wall-clock interval wrap, "
          "interval epoch folding, 1-based indexed lambdas (transform "
          "and 3-param reduce), step slices, the ~ full-match operator, "
          "mad and bitstring_agg")
def _q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q147_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q147_TEXT, dialect="duckdb")


_Q148_TEXT = """
SELECT "l_returnflag" AS flag,
       "l_orderkey" // 100 AS okey_bucket,
       count(*) AS n,
       CAST(CAST(sum("l_quantity") AS BIGINT) AS VARCHAR) AS qty,
       CAST(CAST(avg(l_extendedprice) AS DECIMAL(18,4)) AS DECIMAL(12,1))
           AS price_trunc,
       sum(l_quantity) / count(*) AS qty_ratio
FROM "lineitem"
WHERE "l_linenumber" % 2 = 1
GROUP BY "l_returnflag", "l_orderkey" // 100
ORDER BY flag, okey_bucket
LIMIT 40
"""


@_op("q148_quoted_floordiv", _Q148_TEXT,
     note="r9 headline tranche as one verbatim query: double-quoted "
          "identifiers in every position (the r8 silent divergence), "
          "// truncating integer division as a grouping key, "
          "decimal-downscale-cast truncation, and null-safe / and % "
          "spellings")
def _q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q148_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q148_TEXT, dialect="duckdb")


_Q149_TEXT = """
WITH j AS (
  SELECT doc_id,
         '{"id": ' || doc_id || ', "lang": "' || lang ||
         '", "meta": {"tok": ' || len(string_split(text, ' ')) ||
         ', "ratio": 2.50}}' AS payload
  FROM documents WHERE doc_id < 40)
SELECT doc_id,
       json_extract(payload, '$.meta.tok') AS tok_json,
       json_extract_string(payload, 'lang') AS lang_raw,
       json_type(payload) AS t_root,
       json_type(payload, '$.meta.ratio') AS t_ratio,
       json_extract(payload, '/meta/ratio') AS ratio_render,
       json_valid(payload) AS ok,
       payload -> 'meta' -> 'tok' AS tok_arrow
FROM j
ORDER BY doc_id
"""


@_op("q149_json_introspection", _Q149_TEXT,
     note="r9 json trio over constructed payloads: quote-keeping "
          "json_extract with $-path/bare/pointer forms, yyjson number "
          "re-rendering (2.50 → 2.5), json_type vocabulary, chain-final "
          "-> arrows")
def _q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q149_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q149_TEXT, dialect="duckdb")


_Q150_TEXT = """
SELECT doc_id,
       parse_filename('/corpus/' || lang || '/' || doc_id || '.txt', true)
           AS stem,
       parse_dirpath('/corpus/' || lang || '/' || doc_id || '.txt')
           AS dirp,
       lang COLLATE NOCASE = upper(lang) COLLATE NOCASE AS ci_eq,
       CAST(CAST(doc_id % 6 AS INTEGER)! AS VARCHAR) AS fact,
       @ (doc_id - 20) AS dist,
       date_sub('month', DATE '2023-11-15',
                DATE '2023-11-15' + to_days(CAST(doc_id AS INTEGER))) AS mdiff,
       isoyear(DATE '2024-01-01' + to_days(CAST(doc_id AS INTEGER))) AS iy,
       CAST(make_timestamp(1700000000000000 + doc_id * 1000000)
            AS VARCHAR) AS mts
FROM documents WHERE doc_id < 40
ORDER BY doc_id
"""


@_op("q150_pg_operator_tranche", _Q150_TEXT,
     note="r9 loud-gap batch as one verbatim query: parse_* path "
          "scalars, COLLATE comparisons, postfix factorial in "
          "DECIMAL(38,0), @ prefix abs, calendar date_sub, bare "
          "isoyear, 1-arg make_timestamp")
def _q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q150_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q150_TEXT, dialect="duckdb")


_Q151_TEXT = """
SELECT doc_id,
       upper(lang || 'ß') AS up,
       lower('İ-' || upper(lang)) AS lo,
       format('{1}#{0}', lang, doc_id % 7) AS fmt,
       format('{:.1f}', (doc_id % 40) + 0.25) AS fr,
       strftime(DATE '2024-01-01' + to_days(CAST(doc_id % 400 AS INTEGER)),
                '%G-%V (%U/%W) w%w u%u') AS wk,
       strftime(TIMESTAMP '2024-02-05 13:01:02.345678'
                + to_days(CAST(doc_id % 3 AS INTEGER)), 'ms=%g on %j') AS msj
FROM documents WHERE doc_id < 60
ORDER BY doc_id
"""


@_op("q151_case_format_strftime", _Q151_TEXT,
     note="r9b/r9c tranche as one verbatim query: per-codepoint case "
          "mapping (ß→ẞ, İ→i), positional format with half-even "
          "fraction ties, strftime week fields (%G/%V/%U/%W/%w/%u), "
          "%g milliseconds, pattern-quoted literal text")
def _q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q151_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q151_TEXT, dialect="duckdb")


_Q152_TEXT = """
SELECT doc_id,
       unnest(string_split(text, ' ')[1:4]) AS w,
       unnest([1,2,3,4]) AS pos,
       list_median(list_transform(string_split(text, ' ')[1:9],
                                  w2 -> length(w2))) AS med,
       list_aggregate(string_split(text, ' ')[1:3],
                      'string_agg', '|') AS joined
FROM documents WHERE doc_id < 12
ORDER BY doc_id, pos
"""


@_op("q152_multi_unnest_list_folds", _Q152_TEXT,
     note="multiple unnest() in one select list ZIP positionally with "
          "NULL padding (not cross-product); list_median and the "
          "generic list_aggregate string_agg dispatch ride along")
def _q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q152_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q152_TEXT, dialect="duckdb")


_Q153_TEXT = """
SELECT o_orderkey,
       (o_orderdate::TIMESTAMP AT TIME ZONE 'America/New_York')
           AT TIME ZONE 'UTC' AS instant,
       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1 day' / 2
           + INTERVAL '3:30:00' AS t2,
       (SELECT r_name FROM region ORDER BY r_regionkey) AS first_region,
       json_structure('{"k": ' || CAST(o_orderkey % 5 AS VARCHAR)
                      || ', "t": "' || o_orderstatus || '"}') AS js,
       json_quote(o_orderstatus) AS jq,
       mode(o_orderstatus) OVER () AS md
FROM orders WHERE o_orderkey < 60
ORDER BY o_orderkey
"""


@_op("q153_tz_interval_json", _Q153_TEXT,
     note="AT TIME ZONE (directional), component-wise interval "
          "division, INTERVAL 'H:M:S' literals, ordered scalar "
          "subquery first-row, json_structure/json_quote; the windowed "
          "mode stays verbatim (both engines agree)")
def _q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q153_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q153_TEXT, dialect="duckdb")


_Q154_TEXT = """
SELECT nullif(n_regionkey, 2) AS g,
       CAST(array_agg(n_name ORDER BY n_nationkey DESC)
            FILTER (WHERE n_nationkey % 7 = 0) AS VARCHAR) AS aa,
       string_agg(n_name, '|' ORDER BY n_nationkey) AS sa,
       CAST(avg(n_nationkey) AS VARCHAR) AS av,
       CAST(count(*) / 7 AS VARCHAR) AS dv,
       sem(n_nationkey) AS se,
       arg_max_null(n_name, n_nationkey) AS amx,
       count_star() AS cs
FROM nation
GROUP BY g
ORDER BY g
"""


@_op("q154_nulls_order_empty_aggs", _Q154_TEXT,
     note="r10 tranche as one verbatim query: bare ASC ORDER BY over a "
          "NULL-bearing key (DuckDB NULLS LAST default), fully-FILTERed "
          "array_agg groups → NULL (not []), avg/'/' → DOUBLE renders, "
          "sem (stddev_pop/sqrt n), arg_max_null, count_star")
def _q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q154_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q154_TEXT, dialect="duckdb")


_Q155_TEXT = """
SELECT n_nationkey AS k,
       CAST(INTERVAL '14 months' AS VARCHAR) AS ym,
       CAST(INTERVAL 90 MINUTE AS VARCHAR) AS dt,
       CAST((TIMESTAMP '2024-01-03 05:00:00'
             - TIMESTAMP '2024-01-01 02:30:00') AS VARCHAR) AS diff,
       INTERVAL '1 month' = INTERVAL '30 days' AS cmp,
       DATE '2024-01-31' + INTERVAL '1 month 2 days' AS promo,
       time_bucket(INTERVAL '15 minutes',
                   TIMESTAMP '2024-06-05 01:22:03') AS tb
FROM nation WHERE n_nationkey < 3 ORDER BY k
"""


@_op("q155_interval_surface", _Q155_TEXT,
     note="r10 interval tranche verbatim: component renders "
          "('1 year 2 months', '01:30:00', ts−ts day-time), "
          "cross-class literal comparison (1 month = 30 days), mixed "
          "ym+dt literal arithmetic promoting DATE→TIMESTAMP, "
          "quoted-unit time_bucket width")
def _q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q155_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q155_TEXT, dialect="duckdb")


_Q156_TEXT = """
SELECT n_nationkey AS k,
       strftime('%Y-%m', DATE '2024-06-05') AS sf,
       strptime('05 2024', '%m %Y') AS sp,
       strptime('07', '%m') AS sp1900,
       formatReadableDecimalSize(n_nationkey * 123456) AS frd,
       format_bytes(n_nationkey * 123456) AS fb,
       list_extract(n_name, 2) AS ch,
       left_grapheme(n_name, 3) AS lg,
       greatest(n_nationkey) AS g1,
       to_binary(substring(n_name, 1, 2)) AS tb
FROM nation WHERE n_nationkey < 5 ORDER BY k
"""


@_op("q156_catalog_sweep_fns", _Q156_TEXT,
     note="r10 catalog-sweep functions verbatim: reversed-order "
          "strftime, strptime 1900 default for year-less formats, "
          "formatReadable ladders, string list_extract, "
          "left_grapheme, 1-arg greatest, VARCHAR→BIT to_binary")
def _q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q156_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q156_TEXT, dialect="duckdb")


_Q157_TEXT = """
SELECT date_trunc('month', o_orderdate) AS mth,
       sum(o_totalprice) AS tot,
       CAST(sum(o_totalprice) AS VARCHAR) AS tot_s,
       CAST(CAST(corr(o_totalprice, o_orderkey) AS DECIMAL(10,6))
            AS DOUBLE) AS c,
       corr(o_custkey * 0, o_totalprice) AS c0
FROM orders
GROUP BY 1 ORDER BY 1 LIMIT 12
"""


@_op("q157_trunc_sum_corr", _Q157_TEXT,
     note="r11 tranche: GROUP BY date_trunc('month') keys as DATE "
          "(DuckDB's field-decided return type), sum(DOUBLE) duck-"
          "rendered via the class-preserving prover, corr rounded to "
          "6 places, and a zero-variance corr → NULL (Spark's corr "
          "throws DIVIDE_BY_ZERO under ANSI)")
def _q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q157_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q157_TEXT, dialect="duckdb")


_Q158_TEXT = """
SELECT n_nationkey AS k,
       extract(hour FROM INTERVAL '26:30:45.123456') AS h,
       extract(millisecond FROM INTERVAL '26:30:45.123456') AS ms,
       date_part('day', INTERVAL '400 days') AS d,
       year(INTERVAL '25 months') AS y,
       extract(quarter FROM INTERVAL '-11 months') AS q,
       CAST(to_timestamp(1718000000) AS VARCHAR) AS tts,
       CAST(make_timestamptz(2024, 6, 10, 7, 33, 20) AS VARCHAR) AS mtz,
       CAST(try_strptime('05-03', ['%Y-%m-%dT%H', '%m-%d'])
            AS VARCHAR) AS sp,
       CAST(date_trunc('isoyear', DATE '2021-01-01') AS VARCHAR) AS iso
FROM nation ORDER BY k LIMIT 5
"""


@_op("q158_interval_fields_instants", _Q158_TEXT,
     note="r11 tranche: extract/date_part/field-functions over "
          "interval literals on the three-field model (unbounded "
          "hours, within-minute milliseconds, trunc-of-months "
          "quarters), TIMESTAMPTZ constructors rendering '+00' "
          "(to_timestamp, make_timestamptz, list-form try_strptime), "
          "and isoyear truncation to Monday of ISO week 1")
def _q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q158_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q158_TEXT, dialect="duckdb")


_Q159_TEXT = """
SELECT g, k, med,
       (SELECT count(*) FROM (SELECT n_name AS v FROM nation
                              UNION ALL SELECT 42) u
        WHERE v = '42') AS unified
FROM (SELECT n_regionkey AS g, n_nationkey AS k,
             median(n_nationkey) OVER (PARTITION BY n_regionkey
                 ORDER BY n_nationkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS med
      FROM nation) t
ORDER BY g, k
"""


@_op("q159_frame_median_setop_unify", _Q159_TEXT,
     note="r11 tranche: median over an explicit ROWS frame (Spark's "
          "median refuses frames; rewritten to percentile 0.5) and a "
          "mixed VARCHAR/int set operation unified to VARCHAR like "
          "DuckDB ('42' is findable as a string)")
def _q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q159_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q159_TEXT, dialect="duckdb")


_Q160_TEXT = r"""
SELECT n_nationkey AS k,
       CAST(list_histogram([n_regionkey, n_regionkey + 1, NULL])
            AS VARCHAR) AS lh,
       least(n_nationkey, '10') AS lg,
       e'tab\tsep' AS esc,
       bit_count('1011'::BIT) AS bc,
       set_bit('101'::BIT, 1, 1)::VARCHAR AS sb,
       date_diff('minute', TIME '10:00:00', TIME '11:30:00') AS td,
       struct_insert({'a': n_nationkey}, b := 2).b AS si
FROM nation WHERE 1 ORDER BY k LIMIT 5
"""


@_op("q160_sweep_finds", _Q160_TEXT,
     note="r11 sweep finds verbatim: list_histogram NULL-skip sorted "
          "MAP, least string-vs-int unification, E-string escape "
          "literals, literal BITSTRING folds, date_diff over TIME "
          "literals, struct_insert named args, bare-integer WHERE")
def _q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q160_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q160_TEXT, dialect="duckdb")


_Q161_TEXT = """
SELECT l_orderkey AS k, l_linenumber AS ln,
       l_quantity::INTEGER AS qi,
       CAST(l_extendedprice / 100 AS INTEGER) AS pe,
       CAST(l_extendedprice AS DECIMAL(12,1)) AS pt,
       CAST(l_returnflag AS VARCHAR(1)) AS vc,
       l_linenumber::UTINYINT + 0 AS un,
       format('{:,}', l_orderkey * 1000) AS fm
FROM lineitem ORDER BY k, ln, qi LIMIT 15
"""


@_op("q161_cast_rounding_matrix", _Q161_TEXT,
     note="r12 tranche: DECIMAL->int postfix cast rounds away from "
          "zero, '/'-derived DOUBLE->int rounds HALF TO EVEN (bround), "
          "DECIMAL downscale truncates toward zero, VARCHAR(n) length "
          "strips, UTINYINT rides its lossless carrier, and "
          "format('{:,}') groups thousands")
def _q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q161_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q161_TEXT, dialect="duckdb")


_Q162_TEXT = """
SELECT n_nationkey AS k,
       CAST(n_nationkey IN (SELECT r_regionkey FROM region
                            WHERE r_regionkey > 2) AS VARCHAR) AS a,
       CAST(n_regionkey = ANY(SELECT CASE WHEN r_regionkey = 2 THEN
                              NULL ELSE r_regionkey END FROM region)
            AS VARCHAR) AS b,
       CAST(n_regionkey > ALL(SELECT r_regionkey FROM region
                              WHERE r_regionkey < 2) AS VARCHAR) AS c,
       CAST(n_nationkey NOT IN (SELECT CASE WHEN r_regionkey = 0 THEN
                                NULL ELSE r_regionkey END FROM region)
            AS VARCHAR) AS d
FROM nation ORDER BY k LIMIT 10
"""


@_op("q162_projected_membership_3vl", _Q162_TEXT,
     note="r12 tranche: PROJECTED [NOT] IN / = ANY / > ALL over "
          "null-bearing subqueries follow DuckDB's three-valued logic "
          "(NULL on a null-bearing no-match) via the CASE-over-EXISTS "
          "emission; filter positions keep the semi/anti join plan. "
          "Booleans CAST to VARCHAR per the driver-canon dtype "
          "contract (a NULL BOOLEAN stringifies 'None' vs 'nan' "
          "across the two pandas fetches)")
def _q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q162_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q162_TEXT, dialect="duckdb")


_Q163_TEXT = """
SELECT n_nationkey AS k,
       format('{:#x}|{:b}|{:e}', n_nationkey * 100 - 50,
              n_nationkey + 1, n_nationkey * 1.5) AS fm,
       printf('%g %i', n_nationkey * 0.5 + 0.125, n_nationkey) AS pf,
       extract(timezone FROM TIMESTAMP '2024-01-01 00:00:00') AS tz,
       typeof(TIME '13:00:00') AS tt,
       substr(n_name, 3, -2) AS sb,
       split_part(n_name, '_', 9) AS sp,
       (SELECT q.m['a'][1] FROM (SELECT MAP {'a': 7} AS m) q) AS mp
FROM nation ORDER BY k LIMIT 8
"""


@_op("q163_spec_long_tail", _Q163_TEXT,
     note="r12 tranche: fmt radix specs with sign-aware negatives "
          "('{:#x}' of -50 -> '-0x32'), binary '{:b}', scientific "
          "'{:e}', C printf %g trailing-zero strip + %i alias, "
          "extract(timezone) -> 0, typeof(TIME), left-extending "
          "negative substr length, out-of-range split_part -> '', "
          "and a DERIVED-map bracket lookup keeping list semantics")
def _q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q163_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q163_TEXT, dialect="duckdb")


_Q164_TEXT = """
SELECT n_regionkey AS r, n_nationkey % 2 AS p,
       grouping(n_regionkey, n_nationkey % 2) AS g,
       count(*) AS c,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY n_name) AS med
FROM nation GROUP BY CUBE(n_regionkey, n_nationkey % 2)
ORDER BY r NULLS LAST, p NULLS LAST, g LIMIT 24
"""


@_op("q164_grouping_bitmask_order_stats", _Q164_TEXT,
     note="r12 tranche: multi-arg grouping(a, b) -> grouping_id "
          "bitmask (b = LSB) over CUBE, with percentile_disc WITHIN "
          "GROUP as a type-agnostic order statistic over VARCHAR "
          "(Spark's native form casts to DOUBLE and crashes)")
def _q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q164_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q164_TEXT, dialect="duckdb")


_Q165_TEXT = """
SELECT n_nationkey AS k,
       n_name.lower() AS mn,
       list_product([n_regionkey + 1.0, 2.0]) AS lp,
       list_last(string_split(n_name, '_')) AS ll,
       TIMESTAMP_S '2024-01-01 12:30:45.9' AS ts,
       CAST({'a': n_regionkey} AS STRUCT(a BIGINT)).a AS sa,
       regexp_extract(n_name, '[[:digit:]]+') AS dg
FROM nation ORDER BY k LIMIT 8
"""


@_op("q165_method_types_lists", _Q165_TEXT,
     note="r12 continuation: dot-method call syntax, list_product/"
          "list_last shortcut folds, TIMESTAMP_S rounding literal, "
          "STRUCT(name TYPE) cast spelling, POSIX regex classes")
def _q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q165_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q165_TEXT, dialect="duckdb")


_Q166_TEXT = """
SELECT n_regionkey AS r, count(*) AS c,
       round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS pct,
       rank() OVER (ORDER BY count(*) DESC, n_regionkey) AS rk
FROM nation GROUP BY n_regionkey ORDER BY r
"""


@_op("q166_share_of_total", _Q166_TEXT,
     note="r12 continuation: the share-of-total reporting shape — a "
          "windowed aggregate DIVISOR (sum(count(*)) OVER ()) keeps "
          "its OVER clause inside the try_divide operand, and rank() "
          "over an aggregate key")
def _q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .engine import Engine

    eng = Engine(spark=spark,
                 warehouse_dir=tempfile.mkdtemp(prefix="ddbrs_q166_"))
    eng.register_fixture_dir(sf_dir)
    return eng.sql(_Q166_TEXT, dialect="duckdb")


def runners() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """name → (spark, sf_dir) -> DataFrame, with fixture registration."""

    def wrap(spec: OpQuerySpec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_tables(spark, sf_dir)
            return spec.runner(spark, sf_dir)

        run.__name__ = f"run_{spec.name}"
        return run

    return {name: wrap(spec) for name, spec in OP_QUERIES.items()}


def oracle_map() -> dict[str, str]:
    return {n: s.duckdb_sql for n, s in OP_QUERIES.items() if s.duckdb_sql is not None}
