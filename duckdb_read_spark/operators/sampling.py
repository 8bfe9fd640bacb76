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
