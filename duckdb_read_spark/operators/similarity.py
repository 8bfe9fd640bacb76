"""Similarity search over embedding columns (SURVEY §2.1 L3).

Three tiers:

* cosine_topk          — brute-force exact top-k, pure JVM expressions
                         (zip_with/aggregate HOFs). Baseline + oracle path.
* cosine_topk_pandas   — same semantics, Arrow-batched numpy matmul via
                         mapInPandas: the per-row HOF evaluation becomes one
                         BLAS call per batch. The hot path once vectors are
                         wide or probes are many.
* lsh_bucket_candidates / ann_topk — random-hyperplane LSH: deterministic
                         signed projections bucket vectors; search only the
                         probe's bucket (plus optional multi-probe flips).
                         Sub-linear candidate generation — the 100 TB path
                         (bucket table can be precomputed and partitioned by
                         bucket id, so a probe touches one partition).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANN_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_scores(df: DataFrame, probe: list[float], vec_col: str = "embedding") -> DataFrame:
    """Attach exact cosine similarity to ``probe`` as column ``sim``.

    A zero-norm vector (either side) gets sim=0.0, NOT NaN: Spark sorts NaN
    greater than any double, so an unguarded 0/0 would rank zero vectors
    first in ORDER BY sim DESC — and the pandas path maps the same case to
    0.0, so both exact tiers must agree.
    """
    p = F.array(*[F.lit(float(x)) for x in probe])
    denom = _norm(F.col(vec_col)) * _norm(p)
    sim = F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(F.col(vec_col), p) / denom)
    return df.withColumn("sim", sim)


def cosine_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine (ORDER BY sim DESC LIMIT k compiles
    to TakeOrderedAndProject — per-partition heaps, no global sort)."""
    return (
        cosine_scores(df, probe, vec_col)
        .select(id_col, "sim")
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def cosine_topk_pandas(
    df: DataFrame,
    probe: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k via Arrow-batched numpy: per batch, one matrix-vector
    product + partial top-k; global top-k by the same TakeOrdered."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_field = df.schema[id_col]
    out_schema = StructType([
        StructField(id_col, id_field.dataType, True),
        StructField("sim", DoubleType(), True),
    ])
    p = np.asarray(probe, dtype=np.float64)
    pn = np.linalg.norm(p)
    p = p / pn if pn else p  # zero probe → all sims 0.0, matching cosine_scores

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            sims = (m @ p) / norms
            top = np.argsort(-sims)[: min(k, len(sims))]
            yield pdf.iloc[top][[id_col]].assign(sim=sims[top])

    scored = df.select(id_col, vec_col).mapInPandas(score, out_schema)
    return scored.orderBy(F.desc("sim"), F.col(id_col)).limit(k)


# --- LSH (random hyperplanes) --------------------------------------------

def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.RandomState(ANN_SEED)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 12, vec_col: str = "embedding") -> DataFrame:
    """Attach an LSH ``bucket`` id: sign bits of ``n_planes`` fixed random
    projections. Deterministic (seeded planes, literal arrays — the same
    planes on every executor without a broadcast variable)."""
    planes = _hyperplanes(dim, n_planes)
    bucket = None
    for i, plane in enumerate(planes):
        proj = _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in plane]))
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return df.withColumn("bucket", bucket)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Attach the index of the nearest centroid (by dot product over
    normalized centroids ⇒ cosine argmax). Centroids are literal arrays —
    identical on every executor with no broadcast variable; the centroid
    count is bounded (≤ a few hundred), the data side never moves."""
    import numpy as _np

    if not centroids:
        raise ValueError("ivf_assign needs at least one centroid")
    sims = []
    for c in centroids:
        arr = _np.asarray(c, dtype=_np.float64)
        n = _np.linalg.norm(arr)
        arr = arr / n if n else arr
        sims.append(_dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in arr])))
    best = F.greatest(*sims) if len(sims) > 1 else sims[0]
    cell = None
    for i, s in enumerate(sims):
        cell = F.when(s == best, i) if cell is None else cell.when(s == best, i)
    return df.withColumn(cell_col, cell)


def kmeans_centroids(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 4,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Spherical k-means (Lloyd's) centroids as plain Python lists —
    upgrades the IVF skeleton's first-N "centroids" into a trained
    quantizer while staying fully deterministic:

    * **init**: the first ``n_cells`` vectors ordered by md5 of the id —
      a seeded pseudo-random draw that is engine-, partitioning- and
      retry-stable (same convention as operators/sampling.py).
    * **assign**: :func:`ivf_assign` — centroid literals compiled into the
      plan, cosine argmax JVM-side, no broadcast variable, no UDF.
    * **update**: one ``posexplode`` + per-(cell, dim) mean; the aggregate
      output is k x dim rows (driver-bounded by construction). Means are
      re-normalized (spherical k-means: centroids live on the unit sphere,
      matching the cosine assignment metric). Empty cells keep their
      previous centroid.

    Scale shape: each iteration costs one explode shuffle of n x dim rows
    with map-side partial aggregation; ``sample_fraction`` trains on a
    deterministic md5-threshold sample (the 100 TB pattern — train on ~1M
    vectors, assign the full corpus once at the end).
    """
    import numpy as _np

    train = df.select(id_col, vec_col)
    if sample_fraction is not None:
        bound = int(sample_fraction * 0xFFFFFFFF)
        train = train.filter(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("long") < bound)
    init_rows = (train
                 .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
                 .limit(n_cells).select(vec_col).collect())
    cents = [list(r[vec_col]) for r in init_rows]
    if not cents:
        raise ValueError("kmeans_centroids: no vectors to train on")
    dim = len(cents[0])
    for _ in range(iters):
        assigned = ivf_assign(train, cents, vec_col)
        stats = (assigned
                 .select("cell", F.posexplode(vec_col).alias("pos", "val"))
                 .groupBy("cell", "pos")
                 .agg(F.avg(F.col("val").cast("double")).alias("m"))
                 .collect())
        means: dict[int, dict[int, float]] = {}
        for r in stats:
            means.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        nxt = []
        for i, old in enumerate(cents):
            if i in means and len(means[i]) == dim:
                v = _np.array([means[i][p] for p in range(dim)])
                n = _np.linalg.norm(v)
                nxt.append(list(v / n) if n else list(old))
            else:  # empty cell: keep the previous centroid
                nxt.append(list(old))
        cents = nxt
    return [[float(x) for x in c] for c in cents]


def ivf_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: partition vectors into ``n_cells``
    centroid cells, scan only the ``n_probe`` cells nearest the probe.

    ``centroids`` takes a trained quantizer (:func:`kmeans_centroids`);
    without one, the first ``n_cells`` vectors by id serve as a
    deterministic skeleton. At 100 TB the assignment is precomputed once,
    the table is written partitioned by cell, and a probe becomes a
    partition-pruned scan of n_probe/n_cells of the data.
    """
    import numpy as _np

    cents = centroids if centroids is not None else [
        list(r[vec_col])
        for r in df.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    ]
    p = _np.asarray(probe, dtype=_np.float64)
    pn = p / (_np.linalg.norm(p) or 1.0)
    scores = []
    for i, c in enumerate(cents):
        arr = _np.asarray(c, dtype=_np.float64)
        n = _np.linalg.norm(arr)
        scores.append((float(pn @ (arr / n if n else arr)), i))
    probe_cells = [i for _, i in sorted(scores, reverse=True)[:n_probe]]
    assigned = ivf_assign(df, cents, vec_col)
    cand = assigned.filter(F.col("cell").isin(probe_cells))
    return cosine_topk(cand, probe, k, vec_col, id_col)


def ann_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is the probe's
    bucket or differs by ≤ ``multiprobe_bits`` plane signs (multi-probe
    recovers near-boundary neighbors)."""
    dim = len(probe)
    planes = _hyperplanes(dim, n_planes)
    p = np.asarray(probe, dtype=np.float64)
    pbucket = 0
    for i, plane in enumerate(planes):
        if float(plane @ p) > 0:
            pbucket |= 1 << i
    # All bucket ids within Hamming distance <= multiprobe_bits of the
    # probe's bucket (C(n_planes, b) combinations per level).
    from itertools import combinations

    buckets = {pbucket}
    for b in range(1, multiprobe_bits + 1):
        for flips in combinations(range(n_planes), b):
            mask = 0
            for i in flips:
                mask |= 1 << i
            buckets.add(pbucket ^ mask)
    bucketed = lsh_bucket(df, dim, n_planes, vec_col)
    cand = bucketed.filter(F.col("bucket").isin([int(b) for b in buckets]))
    return cosine_topk(cand, probe, k, vec_col, id_col)


# --- int8 quantization tier ------------------------------------------------

def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale). 4× less storage/shuffle than float32 and int8
    SIMD dot products downstream — the standard memory/bandwidth lever for
    vector search at corpus scale. Pure JVM HOFs; zero vectors get scale 0
    and an all-zero code (dequantizes to the zero vector, cosine 0 by the
    zero-norm guard)."""
    amax = F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = amax / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") / scale).cast("tinyint")),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(scale_col, scale).withColumn(qvec_col, q)


def cosine_topk_int8(
    df: DataFrame,
    probe: list[float],
    k: int = 5,
    qvec_col: str = "qvec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k over int8 codes (run quantize_embeddings first):
    per Arrow batch one int8→float32 matvec. Cosine of the quantized vector
    is scale-invariant, so per-vector scales don't even need to be read —
    quantization error (≤ ~0.4% per coordinate) is the only approximation."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_field = df.schema[id_col]
    out_schema = StructType([
        StructField(id_col, id_field.dataType, True),
        StructField("sim", DoubleType(), True),
    ])
    p = np.asarray(probe, dtype=np.float64)
    pn = np.linalg.norm(p)
    p = p / pn if pn else p

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[qvec_col].to_numpy()).astype(np.float32)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            sims = (m @ p.astype(np.float32)) / norms
            top = np.argsort(-sims)[: min(k, len(sims))]
            yield pdf.iloc[top][[id_col]].assign(sim=sims[top].astype(np.float64))

    scored = df.select(id_col, qvec_col).mapInPandas(score, out_schema)
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
