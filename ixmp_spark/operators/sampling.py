"""Deterministic sampling / split operators for training-data pipelines.

Training pipelines need sampling that is (a) reproducible across runs and
engines, (b) stable under repartitioning, and (c) expressible as a pure
filter so it pushes into the scan stage. Spark's ``df.sample`` is none of
those (seeded per-partition RNG — resplitting the input changes the
sample). Everything here derives the randomness from a content hash
(md5 hex prefix → integer bucket), so the decision for a row is a pure
function of the row itself: map-only, shuffle-free, identical on any
engine with md5 (the DuckDB oracle mirrors it verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket count for hash-based rates; 10_000 gives 0.01% rate granularity
BUCKETS = 10_000


def hash_bucket(col, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): integer value of the first 8
    hex chars of md5(col), mod buckets. 8 hex chars < 2^32 so the conv
    stays well inside a long (ANSI mode would raise on overflow)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def train_val_split(
    df: DataFrame, key_col: str, val_frac: float = 0.1, col: str = "split"
) -> DataFrame:
    """Assign each row to 'train' or 'val' by content hash of ``key_col``.

    Hashing the KEY (not a random draw) means the same document lands in
    the same split across runs, engines, and data layouts — the property
    that keeps eval sets stable while the corpus grows (new docs hash
    into either side at the same ratio)."""
    cut = int(val_frac * BUCKETS)
    return df.withColumn(
        col,
        F.when(hash_bucket(key_col) < cut, F.lit("val")).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, rates: dict[str, float], key_col: str
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows: stratum-specific
    rate thresholds over the content-hash bucket. The standard corpus
    rebalancing step (e.g. downsample the dominant language).

    Strata absent from ``rates`` are DROPPED (rate 0) — pass an explicit
    rate for every stratum to keep. The filter is a pure map-side
    predicate: it pushes below shuffles and costs one md5 per row."""
    bucket = hash_bucket(key_col)
    expr = F.lit(False)
    for stratum, rate in rates.items():
        expr = expr | (
            (F.col(strata_col) == stratum) & (bucket < int(rate * BUCKETS))
        )
    return df.where(expr)


def domain_mix(
    df: DataFrame, domain_col: str, weights: dict[str, int], copy_col: str = "copy"
) -> DataFrame:
    """Integer-weight domain upsampling: emit ``weights[domain]`` copies of
    each row (1 for unlisted domains), tagged 1..w in ``copy_col`` so
    downstream shuffles can keep copies apart.

    The epoch-mixing step of training-data assembly (e.g. Wikipedia ×3,
    web ×1). explode(sequence(1, w)) is a generator inside the same stage
    — no shuffle, output size = Σ weights; fractional weights compose from
    an integer part here + a stratified_sample for the remainder."""
    w = F.lit(1)
    for domain, mult in weights.items():
        w = F.when(F.col(domain_col) == domain, F.lit(int(mult))).otherwise(w)
    return df.withColumn(copy_col, F.explode(F.sequence(F.lit(1), w)))
