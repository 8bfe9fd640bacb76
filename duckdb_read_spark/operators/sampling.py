"""Deterministic hash-based sampling (training-data pipeline primitive).

``DataFrame.sample`` is seeded per-partition: the sampled set changes when
the input repartitions, a task retries, or the file layout shifts — useless
for reproducible corpus construction at 100 TB. These operators sample by
content identity instead: a row is kept iff the first ``digits`` hex chars
of ``md5(key || salt)`` fall below a threshold derived from the fraction.
The decision is a pure projection (no shuffle, no RNG state), survives
repartitioning/retries, is stable across engines (DuckDB's md5 of the same
string is byte-identical — the oracle twin is plain SQL), and different
``salt`` values give independent samples of the same corpus.

Granularity: 8 hex digits → fractions resolve to 1/2^32; the md5 prefix is
uniform, so the realized fraction concentrates tightly around the target
(binomial). Lexicographic compare of fixed-width lowercase hex equals
numeric compare, so no integer conversion is needed on either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DIGITS = 8


def hash_threshold(fraction: float, digits: int = _DIGITS) -> str:
    """Fraction → fixed-width lowercase hex cutoff; 'g' (sorts after every
    hex string) for fraction 1.0 so keep-all needs no special-casing."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(round(fraction * (16 ** digits)))
    if n >= 16 ** digits:
        return "g"
    return format(n, f"0{digits}x")


def _bucket(key: Column, salt: str, digits: int) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, digits)


def sample_by_hash(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "",
    digits: int = _DIGITS,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided by ``key_col``
    identity. All rows sharing a key land on the same side (sampling by
    document/user, not by physical row)."""
    return df.filter(_bucket(F.col(key_col), salt, digits) < hash_threshold(fraction, digits))


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    digits: int = _DIGITS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones): ``fractions`` maps stratum value →
    keep fraction; strata not listed get ``default_fraction``."""
    cutoff: Column = F.lit(hash_threshold(default_fraction, digits))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(hash_threshold(frac, digits))
        ).otherwise(cutoff)
    return df.filter(_bucket(F.col(key_col), salt, digits) < cutoff)


def temperature_mix(
    df: DataFrame,
    key_col: str,
    source_col: str,
    temperature: float = 0.7,
    target_rows: int | None = None,
    salt: str = "mix",
    digits: int = _DIGITS,
    max_sources: int = 100_000,
) -> DataFrame:
    """Temperature-scaled source rebalancing — the corpus-mixing step of
    a training-data pipeline (the ``p_s ∝ n_s^τ`` sampling rule used by
    multilingual/multi-domain corpus builds; τ<1 flattens the source
    distribution toward uniform, τ=1 keeps it proportional).

    Per-source row counts ``n_s`` give unnormalized weights
    ``n_s**temperature``; each source's target share of ``target_rows``
    (default: the input total, i.e. pure rebalancing) becomes a keep
    fraction ``min(1, target·share/n_s)`` applied with the same
    deterministic md5-threshold rule as :func:`sample_by_hash` — so the
    realized mix is reproducible across partitioning, retries, and
    engines (the DuckDB oracle twin recomputes the identical
    thresholds in SQL). Over-demanded sources cap at fraction 1.0:
    this operator never repeats rows (upsampling is a separate,
    explicit explode-by-repeat decision, not a sampling one).

    Scale shape: one partial-agg count per source (shuffle bounded by
    source cardinality, guarded by ``max_sources``), one bounded
    driver collect of the per-source table, then a pure projection
    filter — no data-sized shuffle, no RNG state.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = df.groupBy(source_col).count().limit(max_sources + 1).collect()
    if len(counts) > max_sources:
        raise ValueError(
            f"more than {max_sources} distinct {source_col!r} values — "
            f"raise max_sources if the source cardinality is intended")
    n_by_src = {r[source_col]: r["count"] for r in counts}
    total = sum(n_by_src.values())
    target = total if target_rows is None else int(target_rows)
    weights = {s: n ** temperature for s, n in n_by_src.items()}
    wsum = sum(weights.values())
    fractions = {
        s: min(1.0, target * (weights[s] / wsum) / n_by_src[s])
        for s in n_by_src
    }
    return stratified_sample_by_hash(
        df, key_col=key_col, strata_col=source_col, fractions=fractions,
        default_fraction=0.0, salt=salt, digits=digits)


def hash_split(
    df: DataFrame,
    key_col: str,
    eval_fraction: float = 0.01,
    salt: str = "split",
    digits: int = _DIGITS,
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'eval' / 'train' by key hash — a stable train/eval
    partition that no amount of re-reading or repartitioning can leak
    across (same key, same side, forever)."""
    thresh = hash_threshold(eval_fraction, digits)
    return df.withColumn(
        split_col,
        F.when(_bucket(F.col(key_col), salt, digits) < thresh, F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )
