"""Deduplication operators for training-data pipelines (SURVEY §2.1 L1/L2).

Five escalating strategies, all shuffle-conscious:

* exact          — content hash + keep-first. One shuffle on the hash.
* minhash_lsh    — Spark ML MinHashLSH banded candidate join (Jaccard).
* simhash        — 64-bit SimHash computed entirely JVM-side (xxhash64 +
                   conditional sums; no Python UDF), banded self-join on
                   16-bit sub-fingerprints, bit_count Hamming verify.
* ngram_jaccard  — exact Jaccard over word n-gram shingles via shingle
                   inverted-index self-join (the oracle-checkable one).
* embedding_cosine — near-dup pairs by cosine over an embedding column;
                   brute-force pair join with block pre-filter.

Scale notes: every strategy is a (shingle|band|bucket) explode followed by
a hash-shuffle join — no driver-side collection anywhere. The banded
variants (minhash/simhash) are the 100 TB path: candidate generation cost
is O(docs x bands), never O(docs^2); exact verification only touches
bucket-colliding pairs. ngram_jaccard's self-join is quadratic per shared
shingle and is meant for verification corpora, not the full crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 64
SIMHASH_SEED = 42


def _lazy_barrier(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Materialize-once barrier for a relation with several consumers.

    ``checkpoint_dir=None`` (default) truncates lineage into executor
    blocks (``localCheckpoint`` — lost on executor death, fine for a
    query-sized run); a directory switches to a RELIABLE ``checkpoint``
    so long cluster runs survive executor loss (r13, parity with
    ``duplicate_clusters``). Lazy either way: the first action both
    materializes and consumes."""
    if checkpoint_dir is not None:
        df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


# --- exact ----------------------------------------------------------------

def dedup_exact(df: DataFrame, text_col: str = "text", keep_order_col: str | None = None) -> DataFrame:
    """Keep exactly one row per distinct ``text_col`` content (md5 identity).

    With ``keep_order_col`` the survivor is the group minimum of that column
    (deterministic when the column is unique per row, e.g. a doc id); NULLs
    order last so a group never vanishes, and ties keep a single row.
    Without it, dropDuplicates keeps an arbitrary row (cheaper — no
    per-group ordering state)."""
    from pyspark.sql import Window

    if keep_order_col is None:
        return df.dropDuplicates([text_col])
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(
        F.asc_nulls_last(keep_order_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups: hash, survivor id, group size (>1 only)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# --- MinHash LSH (Spark ML) ----------------------------------------------

def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash LSH over token sets.

    Returns (id_a, id_b, jaccard_distance) with id_a < id_b. Spark ML's
    approxSimilarityJoin banding keeps this sub-quadratic.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="__tokens")
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features",
        numFeatures=num_features, binary=True,
    )
    featurized = tf.transform(tok.transform(df.select(id_col, text_col)))
    # Empty token sets break MinHash; documents are non-empty by contract.
    mh = MinHashLSH(inputCol="__features", outputCol="__hashes",
                    numHashTables=num_hash_tables, seed=SIMHASH_SEED)
    model = mh.fit(featurized)
    pairs = model.approxSimilarityJoin(
        featurized, featurized, 1.0 - jaccard_threshold, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_distance",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


# --- SimHash (pure DataFrame ops, no UDF) --------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, computed with JVM-side expressions only.

    token → xxhash64(token, seed) → per-bit +/-1 weight sums → sign bits
    reassembled into one BIGINT. One explode + one hash shuffle on id.

    The per-bit ones-counts are PACKED two to a long (r13, guide §2.3):
    ``(h >> j) & 0x100000001`` drops bit ``j`` into lane 0 and bit
    ``j+32`` into lane 32 with ONE shift+mask, so the aggregate is 32
    packed sums + a count instead of 64 single-bit sums + a count —
    half the per-token expression work and a near-halved partial-agg
    buffer in the map-side-combined shuffle. Each 32-bit lane counts up
    to 2^31 tokens per document (a 2 GB string column cannot exceed
    that), so the unpacked counts — and the resulting fingerprints —
    are bit-identical to the unpacked form (pinned by pytest).
    """
    toks = (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("__tok"))
        .withColumn("__h", F.xxhash64(F.col("__tok"), F.lit(SIMHASH_SEED)))
    )
    # Per bit i the signed weight sum is 2*ones_i - n, so it suffices to sum
    # the raw bit (cheaper than a CASE per token) plus one shared count.
    half = SIMHASH_BITS // 2
    lane_sums = [
        F.sum(F.shiftright(F.col("__h"), j)
              .bitwiseAND(F.lit(0x1_0000_0001))).alias(f"__l{j}")
        for j in range(half)
    ]
    agg = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"), *lane_sums)
    fp = None
    for i in range(SIMHASH_BITS):
        lane = F.col(f"__l{i % half}")
        # low lane = bit j count; high lane = bit j+32 count (the sum's
        # sign bit is never set — each lane < 2^31 — so the arithmetic
        # shift is exact)
        ones = (F.shiftright(lane, 32) if i >= half
                else lane.bitwiseAND(F.lit(0xFFFF_FFFF)))
        # bit set ⟺ ones_i > n/2 ⟺ 2*ones_i - n > 0 (ties → 0, as before)
        bit = F.when(ones * 2 > F.col("__n"), F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select(id_col, fp.alias("simhash"))


def simhash_banded_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """(id, simhash, band, key) — the banded bucket keys simhash_candidates
    self-joins on; exposed so callers (bench counters, skew audits) can
    measure band-bucket sizes without re-deriving the banding."""
    width = SIMHASH_BITS // bands
    fps = simhash(df, text_col, id_col)
    mask = (1 << width) - 1
    return fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("__bk"),
    ).select(id_col, "simhash", F.col("__bk.band").alias("band"), F.col("__bk.key").alias("key"))


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    max_band_df: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs: band the 64-bit simhash into ``bands`` sub-keys,
    bucket-join on any equal band, verify Hamming ≤ ``max_hamming`` via
    bit_count(a XOR b). By pigeonhole, any pair within Hamming ≤ bands-1
    shares at least one band, so bands=4 is exact for max_hamming ≤ 3.

    ``max_band_df`` is the skew lever (the banded analog of
    ngram_jaccard_pairs' max_shingle_df): a band bucket shared by d docs
    contributes C(d,2) candidates, so one boilerplate-heavy bucket can
    dominate the join. Buckets with more than ``max_band_df`` members are
    dropped (broadcast anti-join against the small hot-bucket list),
    capping per-bucket fan-out at C(cap,2). Near-dups of a hot template
    still pair through their other ``bands-1`` buckets unless ALL their
    shared buckets are hot — the pigeonhole guarantee weakens only for
    pairs living entirely inside boilerplate clusters, which exact-dedup
    (L1) catches first.

    ``checkpoint_dir`` upgrades the banded-key materialization barrier
    from executor-local blocks to a reliable checkpoint directory (the
    ``duplicate_clusters`` option, threaded here in r13): pass it on
    long cluster runs where executor loss must not kill the job."""
    banded = simhash_banded_keys(df, text_col, id_col, bands)
    if max_band_df is not None:
        if max_band_df < 2:
            raise ValueError(f"max_band_df must be >= 2, got {max_band_df}")
        hot = (
            banded.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_band_df)
            .select("band", "key")
        )
        banded = banded.join(F.broadcast(hot), ["band", "key"], "left_anti")
    # The banded-key relation feeds both self-join sides; materialize the
    # (explode + packed simhash groupBy) once per invocation instead of
    # once per side (lazy barrier — fresh per call, guide §2.4).
    banded = _lazy_barrier(banded, checkpoint_dir)
    a = banded.alias("a")
    b = banded.alias("b")
    # Hamming-verify BEFORE the pair dedup: the filter is per-row compute
    # in the join stage, while dropDuplicates is a shuffle — verifying
    # first shuffles only the pairs that survive (sf0.1: 494k band
    # collisions → 1.4k verified pairs; med 3.45 → 2.39 s with the
    # checkpoint, guide §2.3 "shuffle fewer bytes"). A pair colliding in
    # several bands has the same (sh_a, sh_b) in every copy, so the
    # verdict is copy-invariant and filter/dedup commute exactly.
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


# --- exact n-gram Jaccard -------------------------------------------------

def ngram_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document.

    Precondition: ``id_col`` identifies a document — exactly one row per
    id. With several rows sharing an id, "distinct per document" is only
    deduped per ROW (the r12 ``array_distinct`` form), so downstream
    document frequencies / Jaccard set sizes / contamination counts
    would count a shingle once per carrying row. Dedup ids upstream if
    your corpus violates this (ADVICE r12).

    Per-document uniqueness only needs a PER-ROW dedup, so it runs as
    ``array_distinct`` on the shingle array before the explode — entirely
    inside the scan stage — instead of a corpus-wide ``.distinct()``,
    which cost a full (id, shingle) hash shuffle for rows that were
    already unique across documents by construction (r12 guide §2.4:
    removed one Exchange; measured -8-14% on the q55 pair pipeline).

    The token array is bound to a real COLUMN before the lambda slices
    it: an inline split(text) referenced from inside transform() is not
    shared — it re-evaluated the split per shingle, O(tokens²) per doc
    (r12 measured: shingle explode 1.57 s inline vs 0.51 s projected at
    sf0.1; guide §1.2 "per-task work")."""
    d = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__t"))
    toks = F.col("__t")
    # Guard: sequence(0, negative) would generate a DESCENDING range for
    # docs shorter than n tokens — emit no shingles for those instead.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
    return d.select(id_col, F.explode(shingles).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    prefix_filter: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets, pairs ≥ threshold.

    Inverted-index self-join: pairs only materialize for docs sharing a
    shingle — cost is quadratic in per-shingle document frequency, so a
    shingle shared by d docs alone contributes C(d,2) candidate pairs.

    ``max_shingle_df`` is the scale lever: shingles appearing in more than
    that many documents are treated as boilerplate stopwords and excluded
    from BOTH the intersection and the union (set sizes), capping the
    per-shingle join fan-out at C(cap,2). The semantics stay exact over
    the reduced shingle universe (deterministic + SQL-expressible, so the
    capped tier keeps a DuckDB oracle twin); on corpora whose true
    near-dups share discriminative shingles the emitted pairs are
    unchanged (pinned by the planted-dup equivalence pytest). ``None``
    keeps the full universe — verification corpora only.

    ``prefix_filter=True`` switches candidate generation to the AllPairs/
    PPJoin prefix-filtering principle (Bayardo et al., WWW'07; Chaudhuri
    et al., ICDE'06 — both public): order each doc's shingles by a global
    canonical order (ascending document frequency, shingle tie-break);
    two sets with Jaccard ≥ t MUST share an element within each one's
    first ``sz - ceil(t·sz) + 1`` shingles, so only those PREFIX entries
    enter the inverted-index join — the hot high-df shingles that drive
    the quadratic blowup sit at the END of the order and never join.
    A size filter (t·|X| ≤ |Y|) cuts further, and survivors are verified
    EXACTLY via array_intersect over the full sets, so the emitted pairs
    are IDENTICAL to the naive path (equivalence pytest + the unchanged
    q55/q80 oracles pin this). This turns the exact tier from
    verification-only into the scale path.

    ``checkpoint_dir`` upgrades the capped-shingle materialization
    barrier (naive tier) from executor-local blocks to a reliable
    checkpoint directory — pass it on long cluster runs (r13, parity
    with ``duplicate_clusters``)."""
    if prefix_filter:
        sh = _shingles_with_df(df, text_col, id_col, n, max_shingle_df)
        return _jaccard_pairs_prefix(sh, id_col, threshold)
    # The capped shingle relation feeds THREE consumers (self-join a/b
    # sides + per-doc sizes); without a materialization barrier the plan
    # replays scan → explode → window-cap once per consumer (4 subtree
    # copies in the r12 before-plan, AQE reused only part of them).
    # A lazy localCheckpoint computes it once per invocation — same
    # intra-query materialization the CC edge list already uses; nothing
    # persists across calls (each call builds a fresh plan). Measured
    # q55 pipeline: 3.02 → 2.44 s min-of-5 with the array_distinct
    # shingle change included (guide §2.4 / §5 lineage truncation).
    sh = _capped_shingles(df, text_col, id_col, n, max_shingle_df)
    sh = _lazy_barrier(sh, checkpoint_dir)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    j = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _capped_shingles(df: DataFrame, text_col: str, id_col: str, n: int,
                     max_shingle_df: int | None) -> DataFrame:
    sh = ngram_shingles(df, text_col, id_col, n)
    if max_shingle_df is not None:
        from pyspark.sql import Window

        dfreq = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(dfreq))
            .filter(F.col("__df") <= max_shingle_df)
            .drop("__df")
        )
    return sh


def _shingles_with_df(df: DataFrame, text_col: str, id_col: str, n: int,
                      max_shingle_df: int | None) -> DataFrame:
    """(id, shingle, __df) — document frequency attached in the SAME
    window pass the cap uses, so the prefix path pays one shuffle for
    both instead of a second groupBy+join."""
    from pyspark.sql import Window

    sh = ngram_shingles(df, text_col, id_col, n).withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
    if max_shingle_df is not None:
        sh = sh.filter(F.col("__df") <= max_shingle_df)
    return sh


def ngram_jaccard_prefix_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Just the candidate id pairs the prefix filter admits (bench
    introspection — the scale_counters honesty surface)."""
    sh = _shingles_with_df(df, text_col, id_col, n, max_shingle_df)
    _, cand = _prefix_candidates(sh, id_col, threshold)
    return cand


def _prefix_candidates(sh: DataFrame, id_col: str, threshold: float
                       ) -> tuple[DataFrame, DataFrame]:
    """(per-doc canonical shingle arrays, candidate id pairs) for the
    prefix-filtering principle — split out so bench can count the
    candidate set the filter admits. ``sh`` carries (id, shingle, __df)."""
    docs = (
        sh.groupBy(id_col)
        .agg(F.array_sort(
            F.collect_list(F.struct("__df", "shingle"))).alias("__ss"))
        .select(
            F.col(id_col),
            F.col("__ss.shingle").alias("__toks"),
        )
        .withColumn("__sz", F.size("__toks"))
        .withColumn(
            # AllPairs bound sz - ⌈t·sz⌉ + 1, with an epsilon inside the
            # ceil: IEEE gives e.g. 0.55*100 = 55.000000000000007, whose
            # ceil (56) would shorten the prefix below the bound and DROP
            # pairs the naive tier emits at exact-boundary sizes.
            "__plen",
            F.col("__sz")
            - F.ceil(F.lit(threshold) * F.col("__sz")
                     - F.lit(1e-9)).cast("int") + 1)
)
    prefix = docs.select(
        F.col(id_col), F.col("__sz"),
        F.posexplode(F.expr("slice(__toks, 1, __plen)"))
        .alias("__pos", "shingle"))
    pa = prefix.select(F.col(id_col).alias("id_a"),
                       F.col("__sz").alias("__za"),
                       F.col("__pos").alias("__pa"), "shingle")
    pb = prefix.select(F.col(id_col).alias("id_b"),
                       F.col("__sz").alias("__zb"),
                       F.col("__pos").alias("__pb"), "shingle")
    # PPJoin positional filter (Xiao et al., WWW'08 — public; r13): with
    # both shingle arrays in the SAME canonical total order, any match
    # not already seen among the shared prefix tokens must sit strictly
    # AFTER the last shared position on BOTH sides (x[i]=y[j] with
    # i<mpa forces y[j]<y[mpb], i.e. j<mpb, i.e. a prefix-prefix match
    # — already counted). So the total overlap is bounded by
    #   o + min(|X|-1-mpa, |Y|-1-mpb)            (0-based positions)
    # and a candidate whose bound cannot reach the Jaccard-≥t overlap
    # requirement inter ≥ t/(1+t)·(|X|+|Y|) is pruned BEFORE the
    # verification join ships the full shingle arrays (guide §2.3 —
    # the epsilon keeps IEEE boundary sizes, same as the size filter;
    # verification stays exact, so emitted pairs are unchanged).
    jt = threshold / (1.0 + threshold)
    cand = (
        pa.join(pb, "shingle")
        .where((F.col("id_a") < F.col("id_b"))
               # epsilon-relaxed size filter for the same IEEE boundary
               # (|Y| = 55 vs t·|X| = 55.000000000000007); the exact
               # jaccard verification downstream removes any extras
               & (F.col("__zb") >= threshold * F.col("__za") - F.lit(1e-9))
               & (F.col("__za") >= threshold * F.col("__zb") - F.lit(1e-9)))
        .groupBy("id_a", "id_b", "__za", "__zb")
        .agg(F.count(F.lit(1)).alias("__o"),
             F.max("__pa").alias("__mpa"),
             F.max("__pb").alias("__mpb"))
        .where(F.col("__o")
               + F.least(F.col("__za") - F.col("__mpa") - 1,
                         F.col("__zb") - F.col("__mpb") - 1)
               >= jt * (F.col("__za") + F.col("__zb")) - F.lit(1e-9))
        .select("id_a", "id_b")
    )
    return docs, cand


def _jaccard_pairs_prefix(sh: DataFrame, id_col: str,
                          threshold: float) -> DataFrame:
    """Prefix-filtered exact Jaccard over a (id, shingle, __df) table.

    Shuffle budget: 1 window pass attaching df (shared with the cap) +
    1 per-doc collect + the prefix self-join (bounded by RARE-shingle
    frequencies) + 2 candidate joins for verification. Candidate count is
    the sum over PREFIX shingles of C(df,2) — the canonical order pushes
    boilerplate to the suffix, so the hot-shingle blowup term vanishes.
    Measured honesty note: on the sf0.1 fixture candidates drop 1.13 M →
    310 k (3.6×), and the r13 PPJoin positional filter cuts the pairs
    entering verification further to 120 k — but WALL TIME is still
    ~1.6× the naive path (r13 interleaved min-of-5: naive 1.38 s vs
    prefix 2.21 s; was ~3× before the positional filter). That corpus
    has no boilerplate tail (pairs come from the mid-frequency bulk, so
    the index ≈ candidate set) and verification ships both docs' full
    shingle arrays per candidate. The filter's win condition is
    candidates ≫ index (boilerplate-heavy crawls): the planted-
    boilerplate pytest shows the C(boiler,2) term vanishing. Hence the
    declared q55/q80 keep the naive tier at fixture scale;
    prefix_filter=True is the documented crawl-scale escape hatch,
    exactness pinned by the equivalence pytest."""
    docs, cand = _prefix_candidates(sh, id_col, threshold)
    da = docs.select(F.col(id_col).alias("id_a"),
                     F.col("__toks").alias("__ta"),
                     F.col("__sz").alias("sz_a"))
    db = docs.select(F.col(id_col).alias("id_b"),
                     F.col("__toks").alias("__tb"),
                     F.col("__sz").alias("sz_b"))
    return (
        cand.join(da, "id_a").join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("__ta", "__tb")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Train/eval contamination check: for each eval document, how many of
    its word n-gram shingles also appear anywhere in the training corpus
    (the n-gram-overlap decontamination standard for benchmark leakage).

    Returns (id, n_shingles, shared, frac) per eval doc — filter
    ``frac >= threshold`` to quarantine. Scale shape: the train side
    collapses to a DISTINCT shingle set (bounded by vocabulary of n-grams,
    not corpus size) and the check is one hash semi-join per eval shingle
    — linear, no pair materialization. Long shingles (default n=8) make
    coincidental overlap negligible, so the join key distribution is
    near-unique and skew-free."""
    tr = ngram_shingles(train, text_col, id_col, n).select("shingle").distinct()
    ev = ngram_shingles(eval_df, text_col, id_col, n)
    sizes = ev.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        ev.join(tr, "shingle")
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .withColumn("shared", F.coalesce(F.col("shared"), F.lit(0)))
        .withColumn("frac", F.col("shared") / F.col("n_shingles"))
    )


# --- embedding cosine near-dup -------------------------------------------

from .similarity import _dot, _norm  # noqa: E402  (shared HOF kernels)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. Brute-force pair join (verification
    scale); the banded scale path is similarity.lsh_bucket_candidates."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("__va"), F.col("__vb")) / (_norm(F.col("__va")) * _norm(F.col("__vb")))
    return pairs.withColumn("cosine", cos).filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cosine"
    )


def semantic_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_cells: int = 16,
    iters: int = 4,
    centroids: list[list[float]] | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """SemDeDup-style near-dup pairs: k-means-bucketed cosine (Abbas et
    al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication" — public arXiv 2303.09540).

    The brute-force tier (:func:`embedding_neardup_pairs`) is O(n^2) pair
    join — verification corpora only. This is the scale path: cluster
    with spherical k-means (similarity.kmeans_centroids), self-join
    WITHIN cells only — candidate cost is sum of per-cell C(sz,2), i.e.
    ~n^2/k for balanced cells, and the join is a hash-shuffle on the cell
    id, never a cartesian. Near-identical vectors share a nearest
    centroid except at cell boundaries (exact duplicates ALWAYS do), so
    recall loss is confined to threshold-straddling boundary pairs —
    the same banded-candidate tradeoff as MinHash/SimHash above.
    """
    from .similarity import ivf_assign, kmeans_centroids

    if centroids is None:
        centroids = kmeans_centroids(
            df, n_cells=n_cells, vec_col=vec_col, id_col=id_col,
            iters=iters, sample_fraction=sample_fraction)
    assigned = ivf_assign(df.select(id_col, vec_col), centroids, vec_col)
    a = assigned.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("__va"), "cell")
    b = assigned.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("__vb"), "cell")
    pairs = a.join(b, "cell").where(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("__va"), F.col("__vb")) / (
        _norm(F.col("__va")) * _norm(F.col("__vb")))
    return (pairs.withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cell", "cosine"))


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_cells: int = 16,
    iters: int = 4,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Rows surviving SemDeDup: within each k-means cell, any row with a
    cosine->=threshold neighbor of LOWER id is dropped (keep-first, the
    same survivor rule as dedup_exact). One anti-join against the pair
    set's right side — no collect, no loop."""
    pairs = semantic_neardup_pairs(
        df, vec_col=vec_col, id_col=id_col, threshold=threshold,
        n_cells=n_cells, iters=iters, sample_fraction=sample_fraction)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")


# --- paragraph-level dedup ------------------------------------------------

def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    out_col: str = "text_kept",
) -> DataFrame:
    """Corpus-wide exact paragraph dedup, keep-first: every paragraph that
    already appeared earlier in the corpus (by ``id_col``, then position)
    is dropped, and documents are reassembled from their surviving
    paragraphs — the remove-duplicated-boilerplate step of crawl
    pipelines (headers/footers/nav text repeat across pages; document-
    level dedup never sees them).

    Returns (id, n_paras, n_kept, ``out_col``) — a doc whose every
    paragraph was seen before keeps an empty string.

    Plan shape: posexplode → one window shuffle on md5(paragraph) for
    keep-first → one groupBy(id) shuffle to reassemble (order restored by
    sorting (pos, para) structs inside the aggregate, not a global sort).
    Linear in total paragraphs; the md5 partition is per unique
    paragraph, so boilerplate-heavy corpora shuffle-skew on the HOT
    paragraph hash at worst to its duplicate count — bounded by corpus
    repetition, and those rows reduce to rn=1 immediately.
    """
    from pyspark.sql import Window

    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    )
    w = Window.partitionBy(F.md5(F.col("__para"))).orderBy(id_col, "__pos")
    ranked = parts.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.count(F.when(F.col("__rn") == 1, 1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1,
                                F.struct(F.col("__pos"), F.col("__para")),
                            )
                        )
                    ),
                    lambda x: x["__para"],
                ),
                sep,
            ).alias(out_col),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring-span dedup: find every ``window``-token span that
    appears (verbatim) in at least ``min_docs`` DISTINCT documents — the
    sliding-window flavor of training-data dedup (the "deduplicating
    training data" recipe: repeated 50-token substrings are memorization
    fuel even when documents as a whole differ). Whole-document and
    paragraph dedup both miss a license block pasted mid-document; this
    catches it.

    Returns (span_hash, n_docs, n_occurrences, min_doc, max_doc) sorted
    by (n_docs DESC, span_hash).

    Plan shape: split -> posexplode(sequence) flatMap (one row per
    token-window, ~|corpus tokens| rows) -> md5 -> ONE groupBy shuffle on
    the span hash with map-side combine. Linear in corpus tokens; no
    pairwise comparisons — the hash groupBy replaces the suffix array of
    the single-node recipe, which is the 100 TB-viable formulation. Docs
    shorter than ``window`` tokens contribute nothing (sequence guard:
    Spark's sequence(1, n) with n < 1 would COUNT DOWN, not return
    empty).
    """
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias(
            "__w"
        ),
    ).filter(F.size("__w") >= window)
    spans = toks.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), F.size("__w") - (window - 1))
        ).alias("__i"),
        F.col("__w"),
    ).select(
        F.col(id_col),
        F.md5(
            F.array_join(F.slice(F.col("__w"), F.col("__i"), window), " ")
        ).alias("span_hash"),
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), "span_hash")
    )


# --- duplicate clustering (connected components) --------------------------

def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "doc_id",
    cluster_col: str = "cluster_id",
    max_iter: int = 25,
    probe_every: int = 1,
    checkpoint_dir: str | None = None,
    strategy: str = "contract",
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every node in
    ``pairs`` gets ``cluster_col`` = the minimum id reachable from it, so a
    chain a-b, b-c collapses to one cluster labeled a (the pairs→clusters
    step of a dedup pipeline — pair emitters alone over-keep: keep-min on
    a-b and b-c would keep both a and b even though a~c transitively).

    Two strategies, both driver-free and hash-shuffle-shaped:

    * ``'contract'`` (default) — two-level contraction: each round
      relabels the edge list by the current labels, drops intra-cluster
      edges, and runs a PARTITION-LOCAL union-find over the surviving
      label-graph edges (Arrow-batched ``mapInPandas`` — the map-side
      combine of connected components). Everything a partition can see
      merges in one round, so the label graph shrinks multiplicatively:
      round 1 contracts all partition-local structure, round 2's relabeled
      graph is usually small enough for AQE to coalesce into few
      partitions where the union-find finishes, round 3 proves emptiness.
      O(log P)-ish rounds independent of component diameter, vs O(diam)
      for propagation — measured 3 rounds where min-label propagation
      with pointer jumping needed 9 (sf0.1 banded-simhash graph).
      Per-partition memory is O(nodes in that partition's edges), the
      usual CC contraction bound.
    * ``'propagate'`` — min-label propagation with pointer jumping: one
      neighbor-min hop (edges ⋈ labels → groupBy min) plus one label-
      doubling hop per round; O(diameter) rounds. Kept as the
      no-Python-boundary fallback and as an independent implementation
      the equivalence pytest cross-checks against.

    An unconverged exit RAISES rather than silently returning wrong labels
    (a component the rounds couldn't cover would otherwise keep several
    "survivors" of one true cluster).

    ``checkpoint_dir`` switches lineage truncation from executor-local
    blocks (``localCheckpoint`` — lost on executor death) to a reliable
    ``checkpoint`` directory, the right choice for long cluster runs.
    """
    if probe_every < 1:
        raise ValueError(f"probe_every must be >= 1, got {probe_every}")
    if strategy not in ("contract", "propagate"):
        raise ValueError(f"strategy must be contract|propagate, got {strategy!r}")
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def _truncate_lazy(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    if strategy == "contract":
        return _cc_contract(pairs, id_a, id_b, out_id, cluster_col,
                            max_iter, _truncate, _truncate_lazy)

    fwd = pairs.select(F.col(id_a).alias("__src"), F.col(id_b).alias("__dst"))
    # Materialize the edge list ONCE: every iteration joins against it, and
    # without this the (possibly expensive) pair-emitter upstream would be
    # recomputed per round x per job — measured 2-5x total wall time on the
    # banded dedup composition.
    edges = _truncate(
        fwd.union(
            fwd.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
        ).distinct()
    )
    labels = (
        edges.select(F.col("__src").alias("__node")).distinct()
        .withColumn("__label", F.col("__node"))
    )

    converged = False
    for it in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["__dst"] == labels["__node"])
            .groupBy("__src").agg(F.min("__label").alias("__nbr"))
        )
        stepped = (
            labels.join(nbr_min, labels["__node"] == nbr_min["__src"], "left")
            .select(
                F.col("__node"),
                F.col("__label").alias("__old"),
                F.least(
                    F.col("__label"), F.coalesce(F.col("__nbr"), F.col("__label"))
                ).alias("__lab1"),
            )
        )
        # pointer jump: follow the label's own label (label doubling) —
        # labels are node ids, so the label map is `stepped` itself
        lmap = stepped.select(
            F.col("__node").alias("__k"), F.col("__lab1").alias("__lab2"))
        new_labels = _truncate(
            stepped.join(lmap, stepped["__lab1"] == lmap["__k"], "left")
            .select(
                F.col("__node"),
                F.least(
                    F.col("__lab1"), F.coalesce(F.col("__lab2"), F.col("__lab1"))
                ).alias("__label"),
                F.col("__old"),
            )
            .withColumn("__changed", F.col("__label") != F.col("__old"))
            .drop("__old")
        )
        probe = (it + 1) % probe_every == 0 or it == max_iter - 1
        if probe:
            # cached-filter probe: no join, just a scan of the round's
            # checkpointed output
            if new_labels.filter("__changed").limit(1).count() == 0:
                labels = new_labels.select("__node", "__label")
                converged = True
                break
        labels = new_labels.select("__node", "__label")
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge after {max_iter} rounds — "
            "the pair graph has a component with diameter > max_iter; "
            "raise max_iter (labels would be silently wrong otherwise)"
        )
    return labels.select(
        F.col("__node").alias(out_id), F.col("__label").alias(cluster_col)
    )


def _uf_partition(batches):
    """Partition-local union-find over (x, y) label-edge batches: one
    union-find accumulated across the partition's Arrow batches, emitting
    (x, r) with r = the minimum label of x's partition-local component.
    Pure per-partition imperative logic — the case mapInPandas exists for."""
    import pandas as pd

    parent: dict = {}

    def find(a):
        root = a
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(a, a) != a:  # path compression
            parent[a], a = root, parent[a]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

    seen = set()
    for pdf in batches:
        for a, b in zip(pdf["__x"], pdf["__y"]):
            union(a, b)
            seen.add(a)
            seen.add(b)
    if seen:
        nodes = sorted(seen)
        yield pd.DataFrame({"__x": nodes, "__r": [find(n) for n in nodes]})


def _cc_contract(pairs, id_a, id_b, out_id, cluster_col, max_iter,
                 _truncate, _truncate_lazy):
    """Two-level contraction CC (see duplicate_clusters docstring).

    r12 job-count pass (guide §1.2 — the loop's cost at fixture scale is
    Spark's per-job floor, not data): the per-round label update is
    DEFERRED — each round only contracts the label graph; the node labels
    are composed once at the end by folding the (checkpointed) per-round
    update maps over the identity labeling, which is the same join
    sequence the loop used to run eagerly, now in one job. The relabeled
    graph's materialization and the convergence probe are FUSED: a lazy
    checkpoint's first action is ``count()``, which both materializes the
    round's graph and answers "empty?". 4 jobs+1 round → 2 jobs/round.
    """
    fwd = pairs.select(F.col(id_a).alias("__src"), F.col(id_b).alias("__dst"))
    edges = _truncate(fwd.filter(F.col("__src") != F.col("__dst")).distinct())
    # node-id type carries through the union-find output — hardcoding
    # long would crash on string/non-long document ids that the
    # propagate strategy always supported
    id_type = dict(edges.dtypes)["__src"]
    uf_schema = f"__x {id_type}, __r {id_type}"
    # round 1 skips the relabel joins: labels are the identity map, so the
    # label graph IS the edge list. Group a node's edges into one
    # partition (repartition on __x) so star-shaped neighborhoods
    # contract locally in the first pass.
    lgraph = (edges.select(F.col("__src").alias("__x"),
                           F.col("__dst").alias("__y"))
              .repartition("__x"))
    upds: list[DataFrame] = []
    converged = False
    for it in range(max_iter):
        # upd feeds three consumers (both relabel sides + the final label
        # fold) — truncate/materialize once or the mapInPandas union-find
        # pass re-executes per consumer
        upd = _truncate(
            lgraph.mapInPandas(_uf_partition, uf_schema)
            .groupBy("__x").agg(F.min("__r").alias("__r")))
        upds.append(upd)
        # relabel the label graph by the round's updates (L_{k+1} = U∘L_k,
        # so relabeling lgraph is equivalent to relabeling the original
        # edges — and lgraph SHRINKS every round). Surviving inter-label
        # edges = what the partition-local pass couldn't see; AQE
        # coalesces the shrinking shuffle, so late rounds run on few
        # partitions and finish the job.
        ux = upd.select(F.col("__x").alias("__xk"), F.col("__r").alias("__xr"))
        uy = upd.select(F.col("__x").alias("__yk"), F.col("__r").alias("__yr"))
        lgraph = _truncate_lazy(
            lgraph.join(ux, lgraph["__x"] == ux["__xk"], "left")
            .join(uy, lgraph["__y"] == uy["__yk"], "left")
            .select(
                F.coalesce(F.col("__xr"), F.col("__x")).alias("__x"),
                F.coalesce(F.col("__yr"), F.col("__y")).alias("__y"),
            )
            .filter(F.col("__x") != F.col("__y"))
            .distinct()
        )
        # one job: materializes the lazy checkpoint AND probes emptiness
        if lgraph.count() == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge after {max_iter} rounds — "
            "raise max_iter (labels would be silently wrong otherwise)"
        )
    # fold the round updates over the identity labeling — the exact join
    # sequence the loop applied eagerly before, evaluated in one job over
    # checkpointed inputs (≤ max_iter small left joins)
    labels = (
        edges.select(F.col("__src").alias("__node"))
        .union(edges.select(F.col("__dst").alias("__node")))
        .distinct()
        .withColumn("__label", F.col("__node"))
    )
    for upd in upds:
        labels = (
            labels.join(upd, labels["__label"] == upd["__x"], "left")
            .select(
                F.col("__node"),
                F.coalesce(F.col("__r"), F.col("__label")).alias("__label"),
            )
        )
    return labels.select(
        F.col("__node").alias(out_id),
        F.col("__label").alias(cluster_col),
    )


def attach_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Join cluster labels back onto the corpus: docs in no pair become
    singleton clusters of themselves; ``df.filter(col(id_col) ==
    col(cluster_col))`` is then the deduplicated corpus (one survivor per
    cluster, the minimum id)."""
    labels = duplicate_clusters(pairs, id_a, id_b, out_id=id_col, cluster_col=cluster_col)
    return df.join(labels, on=id_col, how="left").withColumn(
        cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col))
    )
