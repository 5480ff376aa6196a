"""Reusable DataFrame operator library — the engine's building blocks.

Each module re-expresses one operator family from SURVEY.md §2 as
composable, Catalyst-friendly DataFrame transforms (no row-at-a-time
Python in any hot path).

Cache discipline
----------------
Several operators persist an expensive intermediate (tokenized/shingled/
banded/assigned frames) that *backs the returned plan* — unpersisting
inside the operator would force the caller's first action to recompute
the dominant projection. Those operators attach their cache handles to
the returned DataFrame; a long-running session can release them once the
result has been materialized/written:

    out = semantic_dedup(df, "id", "vec")
    out.write.parquet(path)          # materialize first
    release_cache(out)               # then free the backing caches

After release, re-running an action on ``out`` recomputes the full
lineage (correct, just slower). The handles live on the exact returned
object — derived DataFrames do not carry them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: attribute carrying the persisted frames that back an operator result
_CACHE_ATTR = "_ixmp_spark_caches"


def attach_caches(df: DataFrame, *caches: DataFrame) -> DataFrame:
    """Record ``caches`` (persisted frames) as backing ``df``'s plan so
    :func:`release_cache` can free them; returns ``df`` for chaining.
    Extends (never overwrites) handles already attached — fused operators
    compose, e.g. minhash_lsh_neardup adds its shingle frame on top of
    lsh_band_pairs' banded frame."""
    existing = tuple(getattr(df, _CACHE_ATTR, ()))
    setattr(df, _CACHE_ATTR, existing + tuple(caches))
    return df


def release_cache(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every cached frame attached to ``df`` by its producing
    operator (see module docstring); returns the number released. Safe
    on any DataFrame — frames without attached handles release 0."""
    caches = tuple(getattr(df, _CACHE_ATTR, ()))
    for c in caches:
        c.unpersist(blocking)
    if caches:
        setattr(df, _CACHE_ATTR, ())
    return len(caches)
