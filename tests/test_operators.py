"""Operator-library tests (SURVEY §5.3): each custom operator against its
oracle query or a planted-ground-truth check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_read_spark.oracle import normalize_rows, spark_rows
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(engine):
    return engine.table("events")


@pytest.fixture(scope="module")
def documents(engine):
    return engine.table("documents")


@pytest.fixture(scope="module")
def embeddings(engine):
    return engine.table("embeddings")


@pytest.fixture(scope="module")
def docs_with_dups(documents):
    """documents plus 20 planted exact duplicates (doc_id offset +100000) —
    the fixture corpus only plants duplicates at sf0.1, so tests carry
    their own ground truth."""
    dups = (
        documents.filter(F.col("doc_id") < 20)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    return documents.unionByName(dups)


# --- asof ----------------------------------------------------------------

@pytest.mark.parametrize("strategy", ["join", "union"])
def test_asof_join_matches_q50_oracle(engine, events, strategy):
    from duckdb_read_spark.operators import asof_join
    from duckdb_read_spark.queries import QUERIES

    purchases = events.filter(F.col("event_type") == "purchase")
    signups = events.filter(F.col("event_type") == "signup")
    got = (
        asof_join(purchases, signups, on="ts", by="user_id",
                  right_cols=["event_id"], strategy=strategy)
        .select("event_id", F.col("event_id_right").alias("signup_event"))
        .orderBy("event_id")
    )
    want = engine.sql(QUERIES["q50_asof_join"].spark)
    assert spark_rows(got) == spark_rows(want)


def test_asof_join_equal_ts_is_inclusive(spark):
    from duckdb_read_spark.operators import asof_join

    left = spark.createDataFrame([(1, 10, "L")], "k int, t int, lv string")
    right = spark.createDataFrame(
        [(1, 10, "same-ts"), (1, 9, "earlier"), (1, 11, "later")],
        "k int, t int, rv string",
    )
    for strategy in ("join", "union"):
        row = asof_join(left, right, on="t", by="k", right_cols=["rv"],
                        strategy=strategy).collect()[0]
        assert row["rv"] == "same-ts", strategy


def test_asof_join_no_match_yields_null(spark):
    from duckdb_read_spark.operators import asof_join

    left = spark.createDataFrame([(1, 5, "L")], "k int, t int, lv string")
    right = spark.createDataFrame([(1, 9, "later")], "k int, t int, rv string")
    for strategy in ("join", "union"):
        row = asof_join(left, right, on="t", by="k", right_cols=["rv"],
                        strategy=strategy).collect()[0]
        assert row["rv"] is None, strategy


# --- sessionize ----------------------------------------------------------

def test_session_stats_matches_q46_oracle(engine, events):
    from duckdb_read_spark.operators import session_stats
    from duckdb_read_spark.queries import QUERIES

    got = session_stats(events)
    want = engine.sql(QUERIES["q46_sessionize"].spark)
    assert spark_rows(got) == spark_rows(want)


def test_sessionize_presplit_equivalent_on_fixture(engine, events):
    """SCALE.md §3.1 mitigation: (key, day-bucket) windows + stitch must
    reproduce the single-window session index exactly (q46 oracle shape)."""
    from duckdb_read_spark.operators import session_stats
    from duckdb_read_spark.queries import QUERIES

    got = session_stats(events, presplit="1 day")
    want = engine.sql(QUERIES["q46_sessionize"].spark)
    assert spark_rows(got) == spark_rows(want)


def test_sessionize_presplit_boundary_cases(spark):
    """Sessions that span a bucket boundary, gaps that span one, and empty
    buckets in between must all stitch to the unbounded-window answer."""
    from duckdb_read_spark.operators import sessionize

    day = 86400
    rows = [
        # key 1: session crosses midnight (gap 600s < 1800s)
        (1, day - 300, 0), (1, day + 300, 1),
        # then a >gap break inside day 2
        (1, day + 3000, 2),
        # then two empty days, then a new session (boundary gap >> 1800)
        (1, 3 * day + 50, 3),
        # key 2: break exactly at a boundary with gap > 1800
        (2, day - 1000, 0), (2, day + 1000, 1),
        # key 2: equal-gap edge (exactly 1800 is NOT a break)
        (2, day + 2800, 2),
    ]
    df = spark.createDataFrame(rows, "user_id int, tsd long, event_id int").withColumn(
        "ts", F.col("tsd").cast("timestamp")
    )
    base = {
        (r["user_id"], r["event_id"]): r["sess"]
        for r in sessionize(df).collect()
    }
    split = {
        (r["user_id"], r["event_id"]): r["sess"]
        for r in sessionize(df, presplit="1 day").collect()
    }
    assert split == base
    # and the hand-checked expectation, so both paths can't be wrong together
    assert base[(1, 0)] == base[(1, 1)] != base[(1, 2)] != base[(1, 3)]
    assert base[(2, 0)] != base[(2, 1)] == base[(2, 2)]


def test_sessionize_presplit_requires_bucket_gt_gap(spark):
    from duckdb_read_spark.operators import sessionize

    df = spark.createDataFrame([(1, 0, 0)], "user_id int, ts int, event_id int")
    with pytest.raises(ValueError, match="must exceed"):
        sessionize(df, gap_seconds=3600, presplit="1 hour")


def test_sessionize_presplit_plan_partitions_on_bucket(spark, events):
    """The big window's exchange must hash on (key, bucket), not key alone."""
    from duckdb_read_spark.operators import sessionize
    from duckdb_read_spark.plans.inspect import physical_plan

    plan = physical_plan(sessionize(events, presplit="1 day"))
    assert "__bkt" in plan, plan[:2000]


# --- dedup ---------------------------------------------------------------

def test_dedup_exact_counts(engine, docs_with_dups):
    from duckdb_read_spark.operators import dedup_exact

    total = docs_with_dups.count()
    uniq = docs_with_dups.select(F.md5("text")).distinct().count()
    assert uniq < total
    assert dedup_exact(docs_with_dups).count() == uniq
    kept = dedup_exact(docs_with_dups, keep_order_col="doc_id")
    assert kept.count() == uniq
    # survivor is the min doc_id of its content group
    dup_groups = docs_with_dups.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep")
    )
    assert kept.join(dup_groups, kept["doc_id"] == dup_groups["keep"], "left_anti").count() == 0


def test_exact_dup_groups_only_real_groups(docs_with_dups):
    from duckdb_read_spark.operators import exact_dup_groups

    g = exact_dup_groups(docs_with_dups).collect()
    assert all(r["n"] > 1 for r in g)
    assert len(g) > 0


def test_simhash_deterministic_and_dup_invariant(docs_with_dups):
    from duckdb_read_spark.operators import simhash

    fp1 = {r["doc_id"]: r["simhash"] for r in simhash(docs_with_dups.limit(200)).collect()}
    fp2 = {r["doc_id"]: r["simhash"] for r in simhash(docs_with_dups.limit(200)).collect()}
    assert fp1 == fp2, "simhash must be deterministic"
    # exact duplicates must collide
    dups = (
        docs_with_dups.groupBy("text").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1).limit(5).collect()
    )
    all_fp = {r["doc_id"]: r["simhash"] for r in simhash(docs_with_dups).collect()}
    for row in dups:
        fps = {all_fp[i] for i in row["ids"]}
        assert len(fps) == 1, "identical texts must have identical simhash"


def test_simhash_packed_lanes_match_unpacked_reference(docs_with_dups):
    """The r13 packed aggregate (two 32-bit ones-count lanes per long,
    ``(h >> j) & 0x100000001``) must produce BIT-IDENTICAL fingerprints
    to the one-sum-per-bit reference formulation it replaced."""
    from duckdb_read_spark.operators import simhash
    from duckdb_read_spark.operators.dedup import SIMHASH_BITS, SIMHASH_SEED

    docs = docs_with_dups.limit(300)
    toks = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("__tok"))
        .withColumn("__h", F.xxhash64(F.col("__tok"), F.lit(SIMHASH_SEED)))
    )
    bit_sums = [
        F.sum(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1))).alias(f"__b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"), *bit_sums)
    fp = None
    for i in range(SIMHASH_BITS):
        bit = F.when(
            F.col(f"__b{i}") * 2 > F.col("__n"), F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    ref = {r["doc_id"]: r["simhash"]
           for r in agg.select("doc_id", fp.alias("simhash")).collect()}
    packed = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert packed == ref


def test_simhash_candidates_find_exact_dups(docs_with_dups):
    from duckdb_read_spark.operators import simhash_candidates

    dup_pair = (
        docs_with_dups.groupBy("text").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1).limit(1).collect()
    )[0]["ids"][:2]
    a, b = sorted(dup_pair)
    cands = simhash_candidates(docs_with_dups, max_hamming=0)
    hit = cands.filter((F.col("id_a") == a) & (F.col("id_b") == b)).count()
    assert hit == 1


def test_corpus_bigram_scores_surprise_ordering(spark):
    """Perplexity-filter semantics: documents made of corpus-typical
    transitions score near 0; a document with a rare transition scores
    -log2 of its corpus probability."""
    import math

    from duckdb_read_spark.operators import corpus_bigram_scores

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # ab x3, ba x2
            (2, "a b a b"),       # ab x2, ba x1
            (3, "c d c d"),       # fully deterministic transitions
            (4, "a d"),           # the one rare transition: P(d|a) = 1/6
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_bigram_scores(docs).collect()}
    assert out[3]["cross_entropy"] == 0.0
    # doc1: ab scored -log2(5/6), ba scored 0 → avg = 3/5 * 0.263034
    assert out[1]["cross_entropy"] == pytest.approx(
        round(3 / 5 * -math.log2(5 / 6), 6), abs=2e-6)
    assert out[4]["cross_entropy"] == pytest.approx(
        round(-math.log2(1 / 6), 6), abs=2e-6)
    assert out[3]["cross_entropy"] < out[1]["cross_entropy"] < out[4]["cross_entropy"]
    assert out[4]["n_bigrams"] == 1 and out[1]["n_bigrams"] == 5


def test_entropy_stats_band_behavior(spark):
    """Entropy quality signals: all-same-token spam collapses toward 0
    token bits; a uniform vocabulary hits exactly log2(k); char entropy
    of 'aab' is the textbook 0.918296."""
    import math

    from duckdb_read_spark.operators import entropy_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "a b c d e f g h"),     # 8 uniform tokens → 3.0 bits
            (3, "aab"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in entropy_stats(docs).collect()}
    assert out[1]["token_entropy"] == 0.0
    assert out[2]["token_entropy"] == 3.0
    assert abs(out[3]["char_entropy"] - round(-2/3*math.log2(2/3)
                                              - 1/3*math.log2(1/3), 6)) < 1e-6
    assert out[3]["n_chars"] == 3
    # natural-text band: fixture-style prose sits between spam and noise
    assert 0.0 < out[1]["char_entropy"] < out[2]["char_entropy"]


def test_dedup_paragraphs_keep_first_and_reassemble(spark):
    """Corpus-wide paragraph dedup: a boilerplate footer shared by every
    doc survives only in its first occurrence; documents reassemble from
    surviving paragraphs in original order; an all-duplicate doc keeps
    an empty string."""
    from duckdb_read_spark.operators import dedup_paragraphs

    footer = "contact us at example dot com"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta\n\n{footer}"),
            (2, f"{footer}\n\ngamma delta"),
            (3, f"{footer}"),
            (4, f"epsilon zeta\n\nalpha beta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
    assert out[1]["text_kept"] == f"alpha beta\n\n{footer}"  # first sees both
    assert out[2]["text_kept"] == "gamma delta"              # footer dropped
    assert out[3]["text_kept"] == ""                         # nothing left
    assert out[4]["text_kept"] == "epsilon zeta"             # alpha beta dup
    assert [(out[i]["n_paras"], out[i]["n_kept"]) for i in (1, 2, 3, 4)] == \
        [(2, 2), (2, 1), (1, 0), (2, 1)]


def test_simhash_band_cap_bounds_hot_buckets(spark):
    """max_band_df (VERDICT r3 item 8): a planted boilerplate cluster of 50
    identical docs floods its band buckets (C(50,2)=1225 candidate pairs);
    the cap drops those hot buckets while the planted non-boilerplate dup
    pair is still recalled through its own (cold) buckets."""
    from duckdb_read_spark.operators import simhash_candidates

    boiler = [(i, "terms of service apply to all content herein forever "
                  "and no liability is accepted by the site operator")
              for i in range(50)]
    planted = [(100, "quick brown fox jumps over the lazy dog near a river "
                     "bank at dawn while birds sing"),
               (101, "quick brown fox jumps over the lazy dog near a river "
                     "bank at dawn while birds sing")]
    docs = spark.createDataFrame(boiler + planted, "doc_id long, text string")
    uncapped = simhash_candidates(docs, max_hamming=0)
    assert uncapped.count() == 1225 + 1
    capped = simhash_candidates(docs, max_hamming=0, max_band_df=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(100, 101)}
    with pytest.raises(ValueError, match="max_band_df"):
        simhash_candidates(docs, max_band_df=1)


def test_minhash_candidates_recall_on_exact_dups(docs_with_dups):
    from duckdb_read_spark.operators import minhash_candidates

    sub = docs_with_dups.filter((F.col("doc_id") < 300) | (F.col("doc_id") >= 100000))
    pairs = minhash_candidates(sub, jaccard_threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    dup_groups = (
        sub.groupBy("text").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1).collect()
    )
    planted = set()
    for row in dup_groups:
        ids = sorted(row["ids"])
        planted.update((a, b) for i, a in enumerate(ids) for b in ids[i + 1:])
    assert planted, "need planted dups in the slice"
    recall = len(planted & got) / len(planted)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_ngram_jaccard_exact_dups_score_one(docs_with_dups):
    from duckdb_read_spark.operators import ngram_jaccard_pairs

    sub = docs_with_dups.filter((F.col("doc_id") < 200) | (F.col("doc_id") >= 100000))
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(sub, threshold=0.999).collect()}
    dup_groups = (
        sub.groupBy("text").agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1).collect()
    )
    for row in dup_groups:
        ids = sorted(row["ids"])
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                assert pairs.get((a, b)) == pytest.approx(1.0), (a, b)


def test_embedding_neardup_symmetric_self(embeddings):
    from duckdb_read_spark.operators import embedding_neardup_pairs

    sub = embeddings.filter(F.col("vec_id") < 100)
    pairs = embedding_neardup_pairs(sub, threshold=-1.1)
    n = sub.count()
    assert pairs.count() == n * (n - 1) // 2  # all ordered pairs, once each


# --- similarity ----------------------------------------------------------

def _probe(embeddings):
    return embeddings.filter(F.col("vec_id") == 0).collect()[0]["embedding"]


def test_cosine_topk_matches_q48_oracle(engine, embeddings):
    from duckdb_read_spark.operators import cosine_topk
    from duckdb_read_spark.queries import QUERIES

    probe = _probe(embeddings)
    got = cosine_topk(embeddings.filter(F.col("vec_id") != 0), probe, k=5)
    want = engine.sql(QUERIES["q48_cosine_topk"].spark)
    got_n = [(r["vec_id"], round(r["sim"], 6)) for r in got.collect()]
    want_n = [(r["vec_id"], float(r["sim"])) for r in want.collect()]
    assert got_n == want_n


def test_cosine_topk_pandas_matches_expression_path(embeddings):
    from duckdb_read_spark.operators import cosine_topk, cosine_topk_pandas

    probe = _probe(embeddings)
    rest = embeddings.filter(F.col("vec_id") != 0)
    a = [(r["vec_id"], round(r["sim"], 6)) for r in cosine_topk(rest, probe, k=10).collect()]
    b = [(r["vec_id"], round(r["sim"], 6)) for r in cosine_topk_pandas(rest, probe, k=10).collect()]
    assert a == b


def test_zero_norm_vectors_rank_last_in_both_exact_paths(spark):
    """A zero vector must score sim=0.0 (not NaN) in BOTH exact tiers:
    Spark sorts NaN above every double, so an unguarded 0/0 would rank zero
    vectors FIRST in ORDER BY sim DESC (ADVICE r1)."""
    import math

    from duckdb_read_spark.operators import cosine_topk, cosine_topk_pandas

    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probe = [1.0, 0.0]
    for fn in (cosine_topk, cosine_topk_pandas):
        got = fn(df, probe, k=3).collect()
        sims = {r["vec_id"]: r["sim"] for r in got}
        assert not any(math.isnan(s) for s in sims.values())
        assert sims[2] == 0.0
        assert [r["vec_id"] for r in got] == [1, 3, 2]
    # zero PROBE: every sim is 0.0, never NaN, in both paths
    for fn in (cosine_topk, cosine_topk_pandas):
        got = fn(df, [0.0, 0.0], k=3).collect()
        assert [r["sim"] for r in got] == [0.0, 0.0, 0.0]


def test_ann_topk_finds_planted_neighbor(spark):
    """LSH preserves actual neighborhoods, not rankings over structureless
    random data — so the test plants a true near-duplicate of the probe and
    asserts the bucketed search recovers it."""
    import numpy as np

    from duckdb_read_spark.operators import ann_topk

    rng = np.random.RandomState(7)
    base = rng.standard_normal((200, 64))
    probe = rng.standard_normal(64)
    planted = probe + 0.01 * rng.standard_normal(64)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((999, [float(x) for x in planted]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = ann_topk(df, [float(x) for x in probe], k=1, n_planes=8).collect()
    assert top and top[0]["vec_id"] == 999


# --- text ----------------------------------------------------------------

def test_token_count_matches_q34(engine, documents):
    from duckdb_read_spark.operators import token_count
    from duckdb_read_spark.queries import QUERIES

    got = (
        token_count(documents.filter(F.col("doc_id") < 50))
        .select("doc_id", F.col("n_tokens"))
        .orderBy("doc_id")
    )
    want = engine.sql(QUERIES["q34_string_split"].spark)
    assert spark_rows(got) == spark_rows(want)


def test_lang_scores_and_quality_are_deterministic_projections(documents):
    from duckdb_read_spark.operators import lang_scores, quality_score

    sub = documents.limit(100)
    a = normalize_rows(tuple(r) for r in lang_scores(sub).select("doc_id", "lang_pred").collect())
    b = normalize_rows(tuple(r) for r in lang_scores(sub).select("doc_id", "lang_pred").collect())
    assert a == b
    q = quality_score(sub).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in q)


def test_fingerprint_collides_only_for_equal_text(documents):
    from duckdb_read_spark.operators import fingerprint

    sub = documents.filter(F.col("doc_id") < 300)
    rows = fingerprint(sub).select("doc_id", "text", "fp").collect()
    by_text: dict[str, set[int]] = {}
    for r in rows:
        by_text.setdefault(r["text"], set()).add(r["fp"])
    for fps in by_text.values():
        assert len(fps) == 1  # equal text → equal fp


# --- multimodal ----------------------------------------------------------

def test_decode_image_plumbing(spark):
    from duckdb_read_spark.operators import decode_image, make_demo_assets

    assets = make_demo_assets(spark, n=32)
    feats = decode_image(assets, embed_dim=8)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["embedding"]) == 8 for r in rows)
    # deterministic across runs
    again = {r["asset_id"]: r["embedding"] for r in decode_image(assets, embed_dim=8).collect()}
    assert all(again[r["asset_id"]] == r["embedding"] for r in rows)


def test_decode_audio_true_values(spark):
    """Real PCM16 WAVs decode to their TRUE layout and sample statistics:
    a 440 Hz sine at amplitude a has RMS ~ a/sqrt(2) and peak ~ a."""
    from duckdb_read_spark.operators import decode_audio
    from duckdb_read_spark.operators.multimodal import ASSET_SCHEMA, make_wav

    wav = make_wav(16000, sample_rate=16000, channels=1,
                   freq_hz=440.0, amplitude=0.5)
    stereo = make_wav(8000, sample_rate=8000, channels=2,
                      freq_hz=220.0, amplitude=0.25)
    assets = spark.createDataFrame(
        [(0, "audio", bytearray(wav), None, "audio/wav"),
         (1, "audio", bytearray(stereo), None, "audio/wav")], ASSET_SCHEMA)
    rows = {r["asset_id"]: r for r in decode_audio(assets, strict=True).collect()}
    a0 = rows[0]
    assert (a0["channels"], a0["sample_rate"], a0["n_samples"]) == (1, 16000, 16000)
    assert abs(a0["duration_s"] - 1.0) < 1e-9
    assert abs(a0["rms"] - 0.5 / 2 ** 0.5) < 0.01 and abs(a0["peak"] - 0.5) < 0.01
    a1 = rows[1]
    assert (a1["channels"], a1["sample_rate"]) == (2, 8000)
    assert abs(a1["duration_s"] - 1.0) < 1e-9


def test_decode_audio_strict_raises_on_unparseable_bytes(spark):
    from duckdb_read_spark.operators import decode_audio
    from duckdb_read_spark.operators.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [(0, "audio", bytearray(b"ID3\x03not-a-wav" * 10), None, "audio/mpeg")],
        ASSET_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_audio(assets, strict=True).collect()
    # non-strict: deterministic fake keeps the pipeline exercisable
    row = decode_audio(assets, strict=False).first()
    again = decode_audio(assets, strict=False).first()
    assert tuple(row) == tuple(again)


def test_decode_image_strict_raises_on_unparseable_bytes(spark):
    from duckdb_read_spark.operators import decode_image, make_demo_assets

    assets = make_demo_assets(spark, n=4, fmt="raw")
    with pytest.raises(Exception, match="NotImplementedError|pillow"):
        decode_image(assets, strict=True).collect()


def test_decode_image_real_formats_true_dimensions(spark):
    """Planted PPM / BMP / PNG / GIF / JPEG bytes decode to their TRUE dimensions
    under strict=True (self-contained parsers, no codec library)."""
    import struct
    import zlib

    from duckdb_read_spark.operators import decode_image
    from duckdb_read_spark.operators.multimodal import ASSET_SCHEMA, make_ppm

    # 24-bit bottom-up BMP, 5x3, all-red pixels
    w, h, ch = 5, 3, 3
    stride = (w * ch + 3) & ~3
    raster = b"".join(
        (b"\x00\x00\xff" * w).ljust(stride, b"\x00") for _ in range(h))
    bmp = (b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                         2835, 2835, 0, 0) + raster)
    # Minimal PNG: signature + IHDR (7x9 RGBA); raster chunks irrelevant for dims
    ihdr = struct.pack(">II", 7, 9) + bytes([8, 6, 0, 0, 0])
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    gif = b"GIF89a" + struct.pack("<HH", 11, 4) + b"\x00" * 6
    # Minimal JPEG: SOI + APP0 + a 3-component SOF0 (13x8); the SOFn
    # marker walk never needs the entropy-coded scan
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 8, 13) + b"\x03"
            + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01")
    # an extra 0xFF fill byte before the SOF marker is spec-valid
    jpg = b"\xff\xd8" + app0 + b"\xff" + sof0
    rows = [
        (1, "image", bytearray(make_ppm(10, 6, seed=2)), None, "image/x-portable-pixmap"),
        (2, "image", bytearray(bmp), None, "image/bmp"),
        (3, "image", bytearray(png), None, "image/png"),
        (4, "image", bytearray(gif), None, "image/gif"),
        (5, "image", bytearray(jpg), None, "image/jpeg"),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in decode_image(df, strict=True, embed_dim=4).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (10, 6, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (5, 3, 3)
    assert (got[3]["width"], got[3]["height"], got[3]["channels"]) == (7, 9, 4)
    assert (got[4]["width"], got[4]["height"], got[4]["channels"]) == (11, 4, 3)
    assert (got[5]["width"], got[5]["height"], got[5]["channels"]) == (13, 8, 3)
    # pixel tiers carry a content embedding; header-only tiers are NULL
    assert got[1]["embedding"] is not None and abs(sum(got[1]["embedding"]) - 1.0) < 1e-9
    # all-red BMP: every luma value 85 → single hist bin gets everything
    assert got[2]["embedding"] == [0.0, 1.0, 0.0, 0.0]
    assert got[3]["embedding"] is None and got[4]["embedding"] is None
    assert got[5]["embedding"] is None


def test_sample_frames(spark):
    from duckdb_read_spark.operators import sample_frames

    df = spark.createDataFrame([(1, 25)], "asset_id long, n_frames int")
    idx = [r["frame_idx"] for r in sample_frames(df, every_n=10).collect()]
    assert idx == [0, 10, 20]


# --- hypertable rollups ---------------------------------------------------

def test_rollup_ladder_nesting_validation(spark):
    import pytest as _pytest

    from duckdb_read_spark.operators import rollup_ladder

    df = spark.range(1).selectExpr("CAST('2024-01-01' AS TIMESTAMP) AS ts", "1.0 AS value")
    with _pytest.raises(ValueError, match="nest"):
        rollup_ladder(df, widths_seconds=(900, 1000))


def test_rollup_daily_from_hourly_matches_direct(engine):
    from duckdb_read_spark.operators import bucket_agg, rollup_ladder

    ev = engine.table("events")
    ladder = rollup_ladder(ev, widths_seconds=(900, 3600, 86400))
    direct = bucket_agg(ev, width_seconds=86400)
    got = {tuple(map(str, r)) for r in ladder[86400].collect()}
    want = {tuple(map(str, r)) for r in direct.collect()}
    assert got == want


def test_clean_corpus_near_dup_removal(spark):
    from duckdb_read_spark.operators import clean_corpus

    # Repeated base makes the per-bit sums decisive: the one-token change
    # lands at Hamming ≤ 3, inside the 4-band pigeonhole guarantee.
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 3
    rows = [
        (1, base + "today", "en"),
        (2, base + "today", "en"),  # exact dup
        (3, base + "now", "en"),    # near dup
        (4, "completely different content about database engines and query planning systems", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    cleaned = clean_corpus(df, min_quality=0.0, drop_near_dups=True, near_dup_hamming=3)
    ids = {r["doc_id"] for r in cleaned.collect()}
    assert 2 not in ids          # exact dup gone (min-id survivor kept)
    assert 1 in ids and 4 in ids
    assert 3 not in ids          # near dup of 1 dropped (higher id loses)


def test_asof_direction_and_tolerance_strategies_agree(engine):
    from duckdb_read_spark.operators import asof_join

    ev = engine.table("events")
    p = ev.filter("event_type = 'purchase'")
    s = ev.filter("event_type = 'signup'").select("user_id", "ts", "event_id")
    for kw in (
        {"direction": "forward"},
        {"tolerance_seconds": 86400},
        {"direction": "forward", "tolerance_seconds": 3600},
    ):
        a = asof_join(p, s, on="ts", by="user_id", right_cols=["event_id"],
                      strategy="union", **kw)
        b = asof_join(p, s, on="ts", by="user_id", right_cols=["event_id"],
                      strategy="join", **kw)
        ga = sorted((r["event_id"], r["event_id_right"]) for r in a.collect())
        gb = sorted((r["event_id"], r["event_id_right"]) for r in b.collect())
        assert ga == gb, kw


def test_asof_rejects_bad_direction(spark):
    import pytest as _pytest

    from duckdb_read_spark.operators import asof_join

    df = spark.range(1).selectExpr("CAST('2024-01-01' AS TIMESTAMP) AS ts", "id AS k")
    with _pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on="ts", by="k", direction="sideways")


def test_ivf_topk_finds_planted_neighbor(spark):
    import numpy as np

    from duckdb_read_spark.operators import ivf_topk

    rng = np.random.RandomState(7)
    base = rng.standard_normal((300, 32))
    probe = rng.standard_normal(32)
    base[250] = probe + 0.01 * rng.standard_normal(32)  # planted near-neighbor
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    top = ivf_topk(df, [float(x) for x in probe], k=3, n_cells=8, n_probe=3)
    ids = [r["vec_id"] for r in top.collect()]
    assert 250 in ids


def test_ivf_assign_deterministic_partition(spark):
    import numpy as np

    from duckdb_read_spark.operators import ivf_assign

    rng = np.random.RandomState(3)
    rows = [(int(i), [float(x) for x in rng.standard_normal(16)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    cents = [r["embedding"] for r in df.orderBy("vec_id").limit(4).collect()]
    a = {r["vec_id"]: r["cell"] for r in ivf_assign(df, cents).collect()}
    b = {r["vec_id"]: r["cell"] for r in ivf_assign(df, cents).collect()}
    assert a == b and set(a.values()) <= {0, 1, 2, 3}


def test_asof_range_join_preserves_duplicate_left_rows(spark):
    from duckdb_read_spark.operators import asof_join

    left = spark.createDataFrame([(1, 10, "L"), (1, 10, "L")], "k int, t int, lv string")
    right = spark.createDataFrame([(1, 9, "r")], "k int, t int, rv string")
    for strategy in ("join", "union"):
        out = asof_join(left, right, on="t", by="k", right_cols=["rv"], strategy=strategy)
        assert out.count() == 2, strategy


def test_dedup_exact_ties_and_null_keep_col(spark):
    from duckdb_read_spark.operators import dedup_exact

    df = spark.createDataFrame(
        [("dup text", 5), ("dup text", 5), ("null group", None), ("null group", None)],
        "text STRING, ord INT",
    )
    out = dedup_exact(df, keep_order_col="ord")
    counts = {r["text"]: 1 for r in out.collect()}
    assert out.count() == 2 and set(counts) == {"dup text", "null group"}


def test_sample_frames_zero_frames(spark):
    from duckdb_read_spark.operators import sample_frames

    df = spark.createDataFrame([(1, 25), (2, 0)], "asset_id LONG, n_frames INT")
    rows = sample_frames(df).collect()
    assert all(r["asset_id"] == 1 for r in rows) and len(rows) == 3


# --- duplicate clustering -------------------------------------------------

def test_duplicate_clusters_transitive_chain(spark):
    """a-b, b-c, and separately d-e: clusters must close transitively
    (keep-min on raw pairs would wrongly keep both a and b)."""
    from duckdb_read_spark.operators import duplicate_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_duplicate_clusters_matches_union_find(spark):
    """Random graph vs a plain union-find ground truth."""
    import random

    from duckdb_read_spark.operators import duplicate_clusters

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(200))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {n: find(n) for n in nodes}
    # union-find roots are not guaranteed minimal; normalize per component
    comp: dict[int, list[int]] = {}
    for n, r in want.items():
        comp.setdefault(r, []).append(n)
    want = {n: min(members) for members in comp.values() for n in members}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == want


def test_duplicate_clusters_unconverged_raises(spark):
    """A chain the rounds can't cover must RAISE, not silently return
    split clusters (ADVICE r2). With pointer jumping each round roughly
    doubles reach (reach 2 rounds ≈ 7 hops), so a 100-node path cannot
    converge in 2 rounds."""
    from duckdb_read_spark.operators import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(chain, max_iter=2, strategy="propagate").collect()
    # O(log d) rounds suffice for the 100-node path (d=100 → ~7 rounds),
    # regardless of probe batching
    got = {r["cluster_id"]
           for r in duplicate_clusters(chain, max_iter=10, probe_every=3,
                                       strategy="propagate").collect()}
    assert got == {0}


def test_duplicate_clusters_pointer_jump_log_rounds(spark):
    """The label-doubling shortcut: a 30-node path converges within 6
    rounds — impossible for pure one-hop min propagation (needs ~30)."""
    from duckdb_read_spark.operators import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    got = {r["cluster_id"]
           for r in duplicate_clusters(chain, max_iter=6,
                                       strategy="propagate").collect()}
    assert got == {0}


def test_duplicate_clusters_contract_few_rounds(spark):
    """The contraction strategy is diameter-independent: a 100-node path
    (diameter 100) converges within 4 rounds — partition-local union-find
    collapses everything a partition sees, the relabeled graph shrinks
    multiplicatively."""
    from duckdb_read_spark.operators import duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "id_a long, id_b long"
    )
    got = {r["cluster_id"]
           for r in duplicate_clusters(chain, max_iter=4,
                                       strategy="contract").collect()}
    assert got == {0}


def test_duplicate_clusters_strategies_agree(spark):
    """contract and propagate are independent implementations; on random
    graphs they must produce identical labelings."""
    import random

    from duckdb_read_spark.operators import duplicate_clusters

    rng = random.Random(11)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(220)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {r["doc_id"]: r["cluster_id"]
         for r in duplicate_clusters(pairs, strategy="contract").collect()}
    b = {r["doc_id"]: r["cluster_id"]
         for r in duplicate_clusters(pairs, strategy="propagate").collect()}
    assert a == b


def test_duplicate_clusters_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to a reliable checkpoint;
    results must be identical and checkpoint files must land in the dir."""
    import os

    from duckdb_read_spark.operators import duplicate_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    ckpt = str(tmp_path / "cc_ckpt")
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs, checkpoint_dir=ckpt).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert any(os.scandir(ckpt)), "no checkpoint data written"


def test_ngram_jaccard_df_cap_equivalence(docs_with_dups):
    """On a corpus whose shingle document frequencies stay under the cap,
    the capped tier must emit EXACTLY the uncapped pairs (the cap only
    drops boilerplate shingles); and the cap must bound candidate pairs."""
    from duckdb_read_spark.operators import ngram_jaccard_pairs

    sub = docs_with_dups.filter((F.col("doc_id") < 200) | (F.col("doc_id") >= 100000))
    uncapped = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
                for r in ngram_jaccard_pairs(sub, threshold=0.5).collect()}
    capped = {(r["id_a"], r["id_b"], round(r["jaccard"], 9))
              for r in ngram_jaccard_pairs(sub, threshold=0.5,
                                           max_shingle_df=64).collect()}
    assert capped == uncapped and uncapped
    # exact duplicates share ALL shingles, so under any cap each planted
    # pair either vanishes entirely (every shingle dropped) or keeps
    # jaccard exactly 1.0 — a surviving planted pair can never dilute
    tiny = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(sub, threshold=0.999,
                                         max_shingle_df=3).collect()}
    planted = {(i, i + 100000) for i in range(20)}
    surviving = {p: j for p, j in tiny.items() if p in planted}
    assert surviving and all(j == 1.0 for j in surviving.values())


def test_contamination_overlap_planted(documents):
    """A train split that contains verbatim copies of eval docs must score
    those eval docs at frac == 1.0; untouched eval docs keep frac < 1."""
    from duckdb_read_spark.operators import contamination_overlap

    ev = documents.filter(F.col("doc_id") < 40)
    # train = the rest, plus copies of eval docs 0..9 under new ids
    leaked = (
        documents.filter(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 500000)
    )
    train = documents.filter(F.col("doc_id") >= 40).unionByName(leaked)
    out = {r["doc_id"]: (r["shared"], r["n_shingles"], r["frac"])
           for r in contamination_overlap(train, ev, n=8).collect()}
    leaked_ids = {i for i in range(10) if i in out}
    assert leaked_ids, "need leaked docs long enough to have 8-gram shingles"
    for i in leaked_ids:
        assert out[i][2] == 1.0, f"doc {i} should be fully contaminated: {out[i]}"
    # clean docs: mostly uncontaminated (a natural exact duplicate inside
    # the corpus can legitimately score 1.0, so assert the distribution,
    # not every row)
    clean = [v[2] for k, v in out.items() if k >= 10]
    assert clean and min(clean) < 0.5
    assert sum(1 for f in clean if f < 1.0) >= len(clean) * 0.8


def test_attach_clusters_survivors(spark, docs_with_dups):
    """attach_clusters gives every doc a cluster (singletons = self) and
    filtering doc_id == cluster_id yields exactly one survivor per
    content group."""
    from duckdb_read_spark.operators import attach_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs_with_dups, n=3, threshold=0.5)
    labeled = attach_clusters(docs_with_dups, pairs)
    assert labeled.count() == docs_with_dups.count()
    assert labeled.filter(F.col("cluster_id").isNull()).count() == 0
    survivors = labeled.filter(F.col("doc_id") == F.col("cluster_id"))
    # exact dups (jaccard 1.0) are in some pair, so each planted dup's
    # cluster keeps only the original (min id)
    assert survivors.filter(F.col("doc_id") >= 100000).count() == 0


# --- deterministic sampling -----------------------------------------------

def test_sample_by_hash_deterministic_and_stable(documents):
    from duckdb_read_spark.operators import sample_by_hash

    s1 = sorted(r["doc_id"] for r in sample_by_hash(documents, 0.2, "doc_id").collect())
    s2 = sorted(
        r["doc_id"]
        for r in sample_by_hash(documents.repartition(13), 0.2, "doc_id").collect()
    )
    assert s1 == s2, "sample must not depend on physical partitioning"
    n = documents.count()
    assert 0.1 * n < len(s1) < 0.3 * n
    # independent salt → different (but same-sized-ish) sample
    s3 = sorted(r["doc_id"] for r in sample_by_hash(documents, 0.2, "doc_id", salt="x").collect())
    assert s3 != s1


def test_sample_by_hash_edge_fractions(documents):
    from duckdb_read_spark.operators import sample_by_hash

    assert sample_by_hash(documents, 0.0, "doc_id").count() == 0
    assert sample_by_hash(documents, 1.0, "doc_id").count() == documents.count()


def test_stratified_sample_fractions(documents):
    from duckdb_read_spark.operators import stratified_sample_by_hash

    got = stratified_sample_by_hash(
        documents, key_col="doc_id", strata_col="lang",
        fractions={"en": 0.0, "de": 1.0}, default_fraction=0.5,
    )
    by_lang = {r["lang"]: r["n"] for r in
               got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in
            documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "en" not in by_lang
    assert by_lang["de"] == base["de"]
    for lang in set(base) - {"en", "de"}:
        assert 0 < by_lang.get(lang, 0) < base[lang]


def test_hash_split_partitions_everything(documents):
    from duckdb_read_spark.operators import hash_split

    tagged = hash_split(documents, "doc_id", eval_fraction=0.1)
    counts = {r["split"]: r["n"] for r in
              tagged.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == documents.count()
    assert set(counts) == {"train", "eval"}
    # same key always lands on the same side
    again = hash_split(documents.repartition(7), "doc_id", eval_fraction=0.1)
    a = {r["doc_id"]: r["split"] for r in tagged.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in again.select("doc_id", "split").collect()}
    assert a == b


# --- sequence packing -----------------------------------------------------

def test_pack_greedy_respects_budget(documents):
    from duckdb_read_spark.operators import pack_greedy, pack_stats

    packed = pack_greedy(documents, budget=512, n_shards=4)
    assert packed.count() == documents.count()
    stats = pack_stats(packed).collect()
    max_doc = documents.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).first()["m"]
    for r in stats:
        assert r["tokens"] <= 512 or r["n_docs"] == 1, r
        assert r["tokens"] <= max(512, max_doc)


def test_pack_greedy_deterministic_under_repartition(documents):
    from duckdb_read_spark.operators import pack_greedy

    a = {r["doc_id"]: r["pack_id"]
         for r in pack_greedy(documents, budget=512, n_shards=4).collect()}
    b = {r["doc_id"]: r["pack_id"]
         for r in pack_greedy(documents.repartition(11), budget=512, n_shards=4).collect()}
    assert a == b


def test_pack_by_offset_bounded_overflow(documents):
    from duckdb_read_spark.operators import pack_by_offset, pack_stats

    packed = pack_by_offset(documents, budget=512, n_shards=4)
    assert packed.count() == documents.count()
    max_doc = documents.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).first()["m"]
    for r in pack_stats(packed).collect():
        # a pack holds the docs *starting* inside its range: overflow is
        # bounded by one straddling document
        assert r["tokens"] < 512 + max_doc, r


def test_pack_ids_partition_docs(documents):
    """Every doc gets exactly one pack; packs are contiguous id ranges
    within a shard (packing never reorders)."""
    from duckdb_read_spark.operators import pack_greedy

    packed = pack_greedy(documents, budget=512, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r["pack_id"])
    for shard, pids in by_shard.items():
        assert pids == sorted(pids), f"pack ids must be monotone in shard {shard}"


# --- scrubbing / repetition ----------------------------------------------

def test_scrub_text_replaces_pii(spark):
    from duckdb_read_spark.operators import scrub_text

    df = spark.createDataFrame(
        [(1, "see https://x.io/a?b=1 or mail a.b+c@ex-ample.co.uk or call +1 555-123 4567 now")],
        "doc_id int, text string",
    )
    out = scrub_text(df).first()["text"]
    assert "<URL>" in out and "<EMAIL>" in out and "<PHONE>" in out
    assert "x.io" not in out and "@" not in out and "555" not in out


def test_scrub_text_preserves_clean_text(documents):
    from duckdb_read_spark.operators import scrub_text

    clean = documents.filter(
        ~F.col("text").rlike(r"https?://|@|\d{7}")
    ).limit(50)
    joined = clean.select("doc_id", F.col("text").alias("before")).join(
        scrub_text(clean).select("doc_id", F.col("text").alias("after")), "doc_id"
    )
    assert joined.filter(F.col("before") != F.col("after")).count() == 0


def test_repetition_stats_planted(spark):
    from duckdb_read_spark.operators import repetition_stats

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here differ")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["n_distinct"] == 1
    assert got[1]["rep_ratio"] == 0.75 and got[1]["top_share"] == 1.0
    assert got[2]["rep_ratio"] == 0.0 and got[2]["top_share"] == 0.25


# --- column profiler ------------------------------------------------------

def test_profile_columns_planted(spark):
    from duckdb_read_spark.operators import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, None, 30.0), (4, "a", 20.0)],
        "id int, s string, v double",
    )
    got = {r["column"]: r for r in profile_columns(df, exact_distinct=True).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_nulls"] == 0
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_nulls"] == 1 and got["v"]["med"] == 20.0
    assert got["s"]["mean"] is None and got["id"]["min_str"] == "1"


def test_profile_columns_single_scan(documents):
    """The profiler must be ONE aggregation over ONE scan, not a scan per
    column."""
    from duckdb_read_spark.operators import profile_columns
    from duckdb_read_spark.plans.inspect import physical_plan

    plan = physical_plan(
        profile_columns(documents, ["doc_id", "lang", "n_chars"]), mode="simple"
    )
    assert plan.count("Scan parquet") == 1, plan[:1500]


# --- presplit top-k -------------------------------------------------------

def test_topk_presplit_equals_plain(engine):
    from duckdb_read_spark.operators import topk_per_group

    cust = engine.table("customer")
    plain = topk_per_group(cust, "c_nationkey", "c_acctbal", k=3,
                           tiebreak="c_custkey")
    split = topk_per_group(cust, "c_nationkey", "c_acctbal", k=3,
                           tiebreak="c_custkey", presplit_buckets=8)
    cols = ["c_nationkey", "c_custkey", "rn"]
    assert sorted(map(tuple, plain.select(cols).collect())) == \
        sorted(map(tuple, split.select(cols).collect()))


def test_topk_presplit_plan_salts_first_window(engine):
    from duckdb_read_spark.operators import topk_per_group
    from duckdb_read_spark.plans.inspect import physical_plan

    plan = physical_plan(
        topk_per_group(engine.table("customer"), "c_nationkey", "c_acctbal",
                       k=3, tiebreak="c_custkey", presplit_buckets=8)
    )
    assert "__salt" in plan


# --- int8 quantization ----------------------------------------------------

def test_quantize_embeddings_bounds_and_determinism(embeddings):
    from duckdb_read_spark.operators import quantize_embeddings

    q = quantize_embeddings(embeddings.limit(100))
    rows = q.select("vec_id", "embedding", "qvec", "qscale").collect()
    for r in rows:
        assert all(-127 <= v <= 127 for v in r["qvec"])
        # reconstruction error per coordinate <= scale/2
        for orig, code in zip(r["embedding"], r["qvec"]):
            assert abs(float(orig) - code * r["qscale"]) <= r["qscale"] / 2 + 1e-9
    again = {r["vec_id"]: r["qvec"] for r in
             quantize_embeddings(embeddings.limit(100)).collect()}
    assert {r["vec_id"]: r["qvec"] for r in rows} == again


def test_cosine_topk_int8_recall_vs_exact(embeddings):
    """Quantized top-10 must substantially overlap the exact top-10 (int8
    error is <= ~0.4% per coordinate)."""
    from duckdb_read_spark.operators import (
        cosine_topk, cosine_topk_int8, quantize_embeddings,
    )

    probe = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    base = embeddings.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in cosine_topk(base, probe, k=10).collect()]
    quant = [r["vec_id"] for r in
             cosine_topk_int8(quantize_embeddings(base), probe, k=10).collect()]
    overlap = len(set(exact) & set(quant)) / 10
    assert overlap >= 0.8, (exact, quant)
    # and the single nearest neighbor survives quantization
    assert exact[0] == quant[0]


def test_quantize_zero_vector_safe(spark):
    from duckdb_read_spark.operators import cosine_topk_int8, quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 2.0]), (2, [2.0, 1.0])],
        "vec_id int, embedding array<float>",
    )
    q = quantize_embeddings(df)
    assert q.filter(F.col("vec_id") == 0).first()["qvec"] == [0, 0]
    top = cosine_topk_int8(q, [1.0, 2.0], k=3).collect()
    # zero vector must sort last, not first (sim 0, not NaN)
    assert top[-1]["vec_id"] == 0 and top[-1]["sim"] == 0.0


def test_gap_fill_policies_planted(spark):
    """Planted gaps: zero-fill counts, LOCF gauges, null keeps holes."""
    from duckdb_read_spark.operators import gap_fill

    rows = [  # key 'a' has buckets 0,2; key 'b' only bucket 1 (of 0..2)
        ("a", 0, 2, 10.0), ("a", 2, 1, 30.0), ("b", 1, 5, 99.0),
    ]
    df = (
        spark.createDataFrame(rows, "k string, b long, n long, g double")
        .withColumn("b", F.timestamp_seconds(F.col("b") * 900))
    )
    out = gap_fill(df, bucket="b", width_seconds=900, keys=["k"],
                   fill={"n": "zero", "g": "locf"}).orderBy("k", "b")
    got = [(r["k"], r["n"], r["g"]) for r in out.collect()]
    assert got == [
        ("a", 2, 10.0), ("a", 0, 10.0), ("a", 1, 30.0),   # gap: n=0, g carried
        ("b", 0, None), ("b", 5, 99.0), ("b", 0, 99.0),   # pre-first g stays null
    ]
    # dense: every key gets every bucket in the global range
    assert out.count() == 6


def test_gap_fill_constant_and_empty(spark):
    from duckdb_read_spark.operators import gap_fill

    df = spark.createDataFrame([], "b timestamp, v double")
    assert gap_fill(df, bucket="b", width_seconds=60).count() == 0

    one = spark.createDataFrame([(0, None), (2, 5.0)], "bs long, v double") \
        .withColumn("b", F.timestamp_seconds(F.col("bs") * 60)).drop("bs")
    out = gap_fill(one, bucket="b", width_seconds=60, fill={"v": -1.0})
    assert [r["v"] for r in out.orderBy("b").collect()] == [-1.0, -1.0, 5.0]


# --- BM25 retrieval (L19) -------------------------------------------------

def test_bm25_planted_relevance(spark):
    from duckdb_read_spark.operators import bm25_topk

    docs = spark.createDataFrame(
        [(0, "cat dog fish"),
         (1, "cat cat cat dog banana"),
         (2, "banana apple pear"),
         (3, "dog"),
         (4, "totally unrelated words here")],
        "doc_id int, text string")
    out = bm25_topk(docs, ["cat", "dog"], k=5).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1                      # highest query-term mass wins
    assert 2 not in ids and 4 not in ids    # zero-match docs are absent
    assert ids.index(0) < ids.index(3)      # two matched terms beat one
    assert all(out[i].bm25 >= out[i + 1].bm25 for i in range(len(out) - 1))


def test_bm25_tf_saturation(spark):
    """Okapi tf saturation: term repetitions gain sublinearly — 10x the tf
    must score well under 10x the weight."""
    from duckdb_read_spark.operators import bm25_topk

    docs = spark.createDataFrame(
        [(0, "cat"), (1, " ".join(["cat"] * 10)), (2, "dog dog dog")],
        "doc_id int, text string")
    rows = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["cat"], k=3).collect()}
    assert rows[1] > rows[0]
    assert rows[1] < 4 * rows[0]


def test_tfidf_vectors_similarity(spark):
    """Hashed TF-IDF vectors: shared-vocabulary docs are cosine-closer
    than disjoint-vocabulary docs; vectors are deterministic; common
    terms are down-weighted relative to rare ones."""
    import math

    from duckdb_read_spark.operators import tfidf_vectors

    docs = spark.createDataFrame(
        [(0, "spark shuffle join agg window"),
         (1, "spark shuffle join agg filter"),
         (2, "banana apple pear kiwi mango"),
         (3, "the the the the rare")],
        "doc_id int, text string")
    vecs = {r.doc_id: r.tfidf
            for r in tfidf_vectors(docs, n_features=64).collect()}
    assert all(len(v) == 64 for v in vecs.values())

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    assert cos(vecs[0], vecs[1]) > 0.5          # 4/5 shared terms
    assert cos(vecs[0], vecs[2]) < 0.2          # disjoint vocab
    # deterministic across invocations
    vecs2 = {r.doc_id: r.tfidf
             for r in tfidf_vectors(docs, n_features=64).collect()}
    assert vecs == vecs2
    # 'the' (df high if present in many docs) — idf smoothing keeps every
    # weight positive; nonzero count equals distinct bucketed terms
    assert sum(1 for x in vecs[3] if x > 0) <= 2


def test_tfidf_feeds_cosine_topk(spark):
    from duckdb_read_spark.operators import cosine_topk, tfidf_vectors

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 == 0 else "delta epsilon zeta")
         for i in range(10)],
        "doc_id int, text string")
    vecs = tfidf_vectors(docs, n_features=32, out="embedding") \
        .withColumnRenamed("doc_id", "vec_id")
    probe = [r.embedding for r in vecs.where("vec_id = 0").collect()][0]
    top = cosine_topk(vecs.where("vec_id <> 0"), probe, k=4).collect()
    assert {r.vec_id for r in top} == {2, 4, 6, 8}  # the same-text family


# --- chunk_documents (L21) ------------------------------------------------

def test_chunk_documents_properties(spark):
    from duckdb_read_spark.operators import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(100))),  # long: multiple chunks
         (1, "a b c"),                                # short: one whole chunk
         (2, " ".join(f"x{i}" for i in range(16)))],  # exactly chunk-size
        "doc_id int, text string")
    out = chunk_documents(docs, chunk_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.chunk_id)

    # short docs stay whole
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk == "a b c"
    assert len(by_doc[2]) == 1 and len(by_doc[2][0].chunk.split()) == 16
    # long doc: ceil((100-4)/12) = 8 chunks
    assert len(by_doc[0]) == 8
    chunks = [r.chunk.split() for r in by_doc[0]]
    assert all(len(c) == 16 for c in chunks[:-1])
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(chunks, chunks[1:]):
        assert a[-4:] == b[:4]
    # full coverage, in order, no token lost
    merged = chunks[0] + [t for c in chunks[1:] for t in c[4:]]
    assert merged == [f"t{i}" for i in range(100)]

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


# --- unicode normalization (L22) ------------------------------------------

def test_normalize_text_forms(spark):
    from duckdb_read_spark.operators import normalize_text

    docs = spark.createDataFrame(
        [(0, "café"), (1, "ﬁne"), (2, "CAFÉ"), (3, None)],
        "doc_id int, text string")
    nfc = {r.doc_id: r.text for r in normalize_text(docs, form="NFC").collect()}
    assert nfc[0] == "café"          # combining acute composes
    assert nfc[3] is None                 # NULL passthrough
    nfkc = {r.doc_id: r.text
            for r in normalize_text(docs, form="NFKC").collect()}
    assert nfkc[1] == "fine"              # fi ligature folds
    low = {r.doc_id: r.text
           for r in normalize_text(docs, strip_accents=True,
                                   lowercase=True).collect()}
    assert low[0] == "cafe" and low[2] == "cafe"  # byte-identical for dedup
    with pytest.raises(ValueError):
        normalize_text(docs, form="XXX")


def test_duplicate_clusters_string_ids(spark):
    """Both CC strategies accept non-long id columns (review finding r5:
    the contract tier hardcoded long output schema)."""
    from duckdb_read_spark.operators import duplicate_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string")
    for strat in ("contract", "propagate"):
        out = {r.doc_id: r.cluster_id
               for r in duplicate_clusters(
                   pairs, "id_a", "id_b", out_id="doc_id",
                   strategy=strat).collect()}
        assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}, strat


def test_ngram_jaccard_prefix_filter_exact_equivalence(spark):
    """AllPairs prefix filtering (r6): the prefix-filtered path must emit
    EXACTLY the naive inverted-index path's pairs — same ids, same
    jaccard values — across thresholds and with/without the DF cap, on a
    corpus with planted near-dups, exact dups, disjoint docs, and a
    boilerplate cluster (the hot-shingle case the filter exists for)."""
    from duckdb_read_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" tail{i} end{i} x{i} y{i}") for i in range(30)]
    rows += [(100, base + " tail0 end0 x0 y0")]          # near-dup of 0
    rows += [(101, rows[5][1])]                          # exact dup of 5
    rows += [(200 + i, "totally different words here nothing shared "
              f"unique{i} item{i} row{i} val{i}") for i in range(10)]
    boiler = "standard footer text appearing in every single document"
    rows += [(300 + i, boiler + f" plus{i}") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for thr in (0.3, 0.5, 0.8):
        for cap in (None, 16):
            naive = {(r.id_a, r.id_b, round(r.jaccard, 9))
                     for r in dedup.ngram_jaccard_pairs(
                         docs, n=3, threshold=thr,
                         max_shingle_df=cap).collect()}
            pref = {(r.id_a, r.id_b, round(r.jaccard, 9))
                    for r in dedup.ngram_jaccard_pairs(
                        docs, n=3, threshold=thr, max_shingle_df=cap,
                        prefix_filter=True).collect()}
            assert pref == naive, (thr, cap)
    # and the filter actually filters: candidates < all-sharing pairs
    n_cand = dedup.ngram_jaccard_prefix_candidates(
        docs, n=3, threshold=0.8).count()
    n_all = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.0).count()
    assert 0 < n_cand < n_all


def test_pair_emitters_reliable_checkpoint_dir(spark, tmp_path):
    """r13 (VERDICT item 9): ngram_jaccard_pairs and simhash_candidates
    accept ``checkpoint_dir`` — the materialization barrier then uses a
    RELIABLE checkpoint (survives executor loss) instead of executor-
    local blocks, with identical emitted pairs."""
    from duckdb_read_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + f" tail{i} end{i}") for i in range(20)]
    rows += [(100, base + " tail0 end0")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    d1 = str(tmp_path / "ck_jac")
    local = {(r.id_a, r.id_b, round(r.jaccard, 9))
             for r in dedup.ngram_jaccard_pairs(docs, n=3,
                                                threshold=0.3).collect()}
    reliable = {(r.id_a, r.id_b, round(r.jaccard, 9))
                for r in dedup.ngram_jaccard_pairs(
                    docs, n=3, threshold=0.3,
                    checkpoint_dir=d1).collect()}
    assert reliable == local and local
    import os
    assert any(os.scandir(d1)), "reliable checkpoint wrote nothing"

    d2 = str(tmp_path / "ck_sim")
    local = {(r.id_a, r.id_b) for r in dedup.simhash_candidates(
        docs, max_hamming=3).collect()}
    reliable = {(r.id_a, r.id_b) for r in dedup.simhash_candidates(
        docs, max_hamming=3, checkpoint_dir=d2).collect()}
    assert reliable == local
    assert any(os.scandir(d2)), "reliable checkpoint wrote nothing"


def test_ngram_jaccard_prefix_ieee_boundary(spark):
    """Review r6: 0.55*100 = 55.000000000000007 in IEEE doubles — without
    an epsilon the prefix length AND the size filter both drop a pair
    whose exact jaccard sits ON the threshold. |X|=20, |Y|=11, Y⊂X:
    J = 11/20 = 0.55 exactly; the naive tier emits it, the prefix tier
    must too (0.55*20 = 11.000000000000002 would otherwise ceil to 12
    and reject |Y|=11 >= 11.000000000000002)."""
    from duckdb_read_spark.operators import dedup

    x = " ".join(f"w{i}" for i in range(21))   # 20 distinct bigrams
    y = " ".join(f"w{i}" for i in range(12))   # 11 bigrams, all shared
    docs = spark.createDataFrame([(1, x), (2, y)],
                                 "doc_id long, text string")
    naive = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
        docs, n=2, threshold=0.55).collect()}
    pref = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
        docs, n=2, threshold=0.55, prefix_filter=True).collect()}
    assert naive == {(1, 2)}
    assert pref == naive


# --- semantic dedup (SemDeDup: k-means cells + within-cell cosine) --------

def test_kmeans_centroids_deterministic_and_spherical(spark, embeddings):
    from duckdb_read_spark.operators import kmeans_centroids

    import numpy as np
    c1 = kmeans_centroids(embeddings, n_cells=6, iters=3)
    c2 = kmeans_centroids(embeddings.repartition(7), n_cells=6, iters=3)
    assert len(c1) == 6 and len(c1[0]) == 64
    # partitioning-invariant (deterministic init + exact means)
    assert np.allclose(np.array(c1), np.array(c2), atol=1e-9)
    # spherical: every updated centroid is unit-norm
    for c in c1:
        n = float(np.linalg.norm(np.array(c)))
        assert abs(n - 1.0) < 1e-6 or n == 0.0


def test_semantic_dedup_removes_planted_dups(spark, embeddings):
    """Exact duplicates always share a k-means cell (identical vector →
    identical nearest centroid), so SemDeDup must remove every planted
    copy; near-copies (tiny noise) fall in the same cell too."""
    from duckdb_read_spark.operators import (
        semantic_dedup, semantic_neardup_pairs, embedding_neardup_pairs,
    )

    base = embeddings.limit(50)
    copies = (base.filter(F.col("vec_id") < 10)
              .withColumn("vec_id", F.col("vec_id") + 100000))
    corpus = base.unionByName(copies)
    kept = semantic_dedup(corpus, threshold=0.999, n_cells=5, iters=2)
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    # keep-first: every planted high-id copy dropped, every original kept
    assert not any(i >= 100000 for i in kept_ids)
    assert {r.vec_id for r in base.select("vec_id").collect()} <= kept_ids

    # cell-bucketed pairs are a SUBSET of brute-force pairs at the same
    # threshold (banded-candidate tradeoff), and find all exact copies
    sem = {(r.id_a, r.id_b) for r in semantic_neardup_pairs(
        corpus, threshold=0.9, n_cells=5, iters=2).collect()}
    brute = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(
        corpus, threshold=0.9).collect()}
    assert sem <= brute
    assert {(i, i + 100000) for i in range(10)} <= sem


def test_ivf_topk_trained_centroids(spark, embeddings):
    """Trained IVF: probing ALL cells is exact (equals brute force);
    probing 1 cell with a probe equal to a stored vector must return
    that vector first (its cell IS the probe's nearest centroid)."""
    from duckdb_read_spark.operators import (
        cosine_topk, ivf_topk, kmeans_centroids,
    )

    cents = kmeans_centroids(embeddings, n_cells=6, iters=3)
    probe = list(embeddings.filter("vec_id = 7").first()["embedding"])
    exact = [r.vec_id for r in cosine_topk(
        embeddings, probe, k=5).collect()]
    allcells = [r.vec_id for r in ivf_topk(
        embeddings, probe, k=5, n_cells=6, n_probe=6,
        centroids=cents).collect()]
    assert allcells == exact
    one = [r.vec_id for r in ivf_topk(
        embeddings, probe, k=3, n_cells=6, n_probe=1,
        centroids=cents).collect()]
    assert one[0] == 7


def test_source_report_flags_bad_sources(spark):
    """Source-level curation: a boilerplate source (all-dup) and a
    short-doc source are flagged keep=false; a healthy source passes."""
    from duckdb_read_spark.operators import source_report

    rows = []
    rows += [(i, "good long document with plenty of distinct words "
              f"number {i} here", "en", "good") for i in range(10)]
    rows += [(100 + i, "same boilerplate text in every doc", "en", "dupes")
             for i in range(10)]
    rows += [(200 + i, f"tiny {i}", "en", "short") for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    rep = {r.source: r for r in source_report(df).collect()}
    assert rep["good"].keep
    assert not rep["dupes"].keep and rep["dupes"].dup_rate == 1.0
    assert not rep["short"].keep and rep["short"].mean_tokens < 5.0


# --- positional join -------------------------------------------------------

def test_with_row_position_multi_file_and_no_shuffle(spark, tmp_path):
    """Positions follow (lexicographic file order, in-file order) and are
    computed as a pure projection — the plan has NO Exchange."""
    from duckdb_read_spark.operators import with_row_position

    d = str(tmp_path / "pj")
    (spark.range(0, 30).withColumnRenamed("id", "k")
     .repartitionByRange(3, "k").sortWithinPartitions("k")
     .write.mode("overwrite").parquet(d))
    df = with_row_position(spark, d)
    rows = df.orderBy("pos").collect()
    assert [r.pos for r in rows] == list(range(30))
    # file order is lexicographic: part-00000 < part-00001 < part-00002,
    # and range-partitioned ascending keys mean pos order == key order
    assert [r.k for r in rows] == sorted(r.k for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_positional_join_pads_shorter_side(spark, tmp_path):
    from duckdb_read_spark.operators import positional_join

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    (spark.range(0, 10).withColumnRenamed("id", "x").coalesce(1)
     .sortWithinPartitions("x").write.mode("overwrite").parquet(a))
    (spark.range(100, 103).withColumnRenamed("id", "y").coalesce(1)
     .sortWithinPartitions("y").write.mode("overwrite").parquet(b))
    out = positional_join(spark, a, b, pos_col="pos").orderBy("pos")
    rows = out.collect()
    assert len(rows) == 10
    assert [r.y for r in rows[:3]] == [100, 101, 102]
    assert all(r.y is None for r in rows[3:])
    assert out.columns == ["pos", "x", "y"]


# --- temperature mixing ----------------------------------------------------

def test_temperature_mix_flattens_and_is_deterministic(spark):
    from duckdb_read_spark.operators import temperature_mix

    import pyspark.sql.functions as F
    rows = ([("big", i) for i in range(900)]
            + [("small", i + 10_000) for i in range(100)])
    df = spark.createDataFrame(rows, "src string, k long")
    mixed = temperature_mix(df, key_col="k", source_col="src",
                            temperature=0.5, salt="t")
    got = {r["src"]: r["n"] for r in
           mixed.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # τ=0.5: weights 30/10 → shares .75/.25 → fractions .833/1.0 — the
    # small source keeps everything, the big one downsamples near the
    # target (md5 threshold realizes the fraction within binomial noise)
    assert got["small"] == 100
    assert 700 < got["big"] < 820
    # head share flattened: 90% in, strictly less out
    assert got["big"] / (got["big"] + got["small"]) < 0.9
    # deterministic under repartitioning: identical kept-key sets
    k1 = {r.k for r in mixed.select("k").collect()}
    k2 = {r.k for r in temperature_mix(
        df.repartition(7), key_col="k", source_col="src",
        temperature=0.5, salt="t").select("k").collect()}
    assert k1 == k2


def test_temperature_mix_validates(spark):
    import pytest as _pytest

    from duckdb_read_spark.operators import temperature_mix

    df = spark.createDataFrame([("a", 1)], "src string, k long")
    with _pytest.raises(ValueError, match="temperature"):
        temperature_mix(df, "k", "src", temperature=0.0)
    with _pytest.raises(ValueError, match="max_sources"):
        temperature_mix(df, "k", "src", max_sources=0)


def test_positional_join_path_with_space(spark, tmp_path):
    """Review r6: percent-encoded _metadata.file_path must still match
    the footer-derived offset map."""
    from duckdb_read_spark.operators import with_row_position

    d = str(tmp_path / "pos dir")
    (spark.range(0, 6).coalesce(2).write.mode("overwrite").parquet(d))
    rows = with_row_position(spark, d).collect()
    assert sorted(r.pos for r in rows) == list(range(6))
    assert all(r.pos is not None for r in rows)


def test_duplicate_spans_planted(spark):
    """Plant a shared 25-token passage inside otherwise-unrelated docs:
    the window-20 span scan must flag spans shared by the planted pair
    and nothing from the unique-text docs; short docs contribute no
    windows (sequence(1, n<1) would count DOWN without the guard)."""
    from duckdb_read_spark.operators import duplicate_spans

    passage = " ".join(f"tok{i}" for i in range(25))
    rows = [
        (1, "intro one " + passage + " tail one"),
        (2, "different lead " + passage),
        (3, " ".join(f"uniq{i}" for i in range(40))),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = duplicate_spans(df, window=20, min_docs=2).collect()
    assert got, "planted 25-token passage must yield shared 20-windows"
    # a 25-token shared passage has 6 shared 20-windows
    assert all(r.n_docs == 2 and {r.min_doc, r.max_doc} == {1, 2}
               for r in got)
    assert len(got) == 6
    # no spans from the unique doc; raising min_docs filters everything
    assert duplicate_spans(df, window=20, min_docs=3).count() == 0
