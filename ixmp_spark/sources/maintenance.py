"""Table maintenance: parquet small-file compaction + layout clustering.

At 100 TB the dominant operational failure of a parquet warehouse is not
a wrong query plan — it's the SMALL-FILE PROBLEM: streaming/micro-batch
ingest (one part per trigger per partition) and over-parallel writers
leave directories with 10⁵–10⁶ tiny files, and every subsequent scan
pays a per-file open/footer-read cost that dwarfs the data read, while
the driver burns memory listing them. The fix is a periodic rewrite into
target-sized files — what Delta calls OPTIMIZE and Hive calls
compaction — expressed here as plain DataFrame ops so it runs anywhere.

Sizing uses the Hadoop FileSystem API (scheme-agnostic: file://, hdfs://,
s3a://) rather than os.listdir, so the same code runs on a laptop and a
cluster. The ENCODED size on disk predicts the output size — compaction
rewrites the same rows with the same codec, so bytes-in ≈ bytes-out is
the right estimator (row-count heuristics are wrong by whatever the
compression ratio is).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory, via the
    Hadoop FileSystem of the path's own scheme. Hidden/metadata files
    (``_SUCCESS``, ``.crc``) are excluded — they are not scan inputs."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n = total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += f.getLen()
    return n, total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 << 20,
    sort_by: str | list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite ``src`` into ``dest`` as ≈``target_file_bytes``-sized
    parquet files; returns ``(n_files_before, n_files_after)``.

    - Output file count = ceil(encoded_bytes / target): same rows, same
      codec, so on-disk size carries over.
    - ``sort_by=None`` → ``coalesce`` when reducing the file count: a
      map-side concatenation with NO shuffle (each output task reads a
      few input files whole). Falls back to ``repartition`` only when
      the target is MORE files than the source has (splitting requires
      redistribution).
    - ``sort_by=cols`` → ``repartitionByRange + sortWithinPartitions``:
      one range shuffle that CLUSTERS the layout, so every output file
      covers a disjoint key range and parquet row-group min/max stats
      let later filtered scans skip whole files — compaction and
      Z-order-style data skipping in the same rewrite. Worth the
      shuffle when the table is read far more often than compacted.

    ``dest`` must differ from ``src``: Spark reads lazily while the
    write runs, so overwriting the input in place would destroy the
    data mid-job. Swap via rename AFTER the write commits (the
    warehouse's atomic-catalog pattern, sources/warehouse.py)."""
    if dest.rstrip("/") == src.rstrip("/"):
        raise ValueError(
            "compact_parquet: dest must differ from src (lazy reads make "
            "in-place overwrite destroy the input); write aside, then swap"
        )
    n_before, total_bytes = parquet_file_stats(spark, src)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(src)
    if sort_by:
        cols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        out = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    elif n_out < len(df.inputFiles()):
        out = df.coalesce(n_out)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dest)
    n_after, _ = parquet_file_stats(spark, dest)
    return n_before, n_after


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Morton (Z-order) key over ``cols`` as a Column: each column is
    min-max scaled to ``bits`` bits (bounds from one tiny agg job —
    2·len(cols) driver scalars), then the bit patterns are interleaved
    so nearby key values are nearby in EVERY dimension at once.

    Why not just sort by (a, b): a lexicographic layout clusters the
    leading column perfectly and the trailing one not at all — a filter
    on ``b`` alone skips nothing. The Morton curve trades a little
    locality in each dimension for bounded locality in all of them,
    which is what parquet row-group min/max pruning needs when queries
    filter on EITHER column (Delta OPTIMIZE ZORDER BY; public Morton
    construction). Numeric columns only; non-numeric dims should hash
    first. The interleave is a driver-built expression of
    2·bits·len(cols) shifts/ors — pure codegen, no UDF.

    ``bits`` is capped so the interleaved key fits a signed 64-bit long:
    shiftleft past bit 63 wraps mod 64 in Spark, which would silently
    scramble the Morton order instead of failing."""
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_key: need at least one column")
    bits = min(bits, 63 // len(cols))
    if bits < 1:
        raise ValueError(
            f"zorder_key: {len(cols)} columns cannot interleave into a "
            "63-bit key with >=1 bit each"
        )
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        span = (mx - mn) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top
                ).cast("long"),
            )
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + i)
            )
    return key


def zorder_cluster(
    spark: SparkSession,
    src: str,
    dest: str,
    cols: list[str],
    target_file_bytes: int = 128 << 20,
    bits: int = 16,
) -> tuple[int, int]:
    """Compaction + multi-dimensional clustering in one rewrite: range-
    partition and sort the table by its Morton key so every output file
    covers a small region of the ``cols`` space — filtered scans on ANY
    of the clustered columns then skip most files via parquet min/max
    stats (single-column ``compact_parquet(sort_by=...)`` only buys
    this for the leading column). Same encoded-size-driven file count
    and same dest≠src contract as ``compact_parquet``."""
    if dest.rstrip("/") == src.rstrip("/"):
        raise ValueError("zorder_cluster: dest must differ from src")
    n_before, total_bytes = parquet_file_stats(spark, src)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(src)
    key = zorder_key(df, cols, bits)
    out = (
        df.withColumn("__z", key)
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(dest)
    n_after, _ = parquet_file_stats(spark, dest)
    return n_before, n_after


def stats_partials(
    df: DataFrame,
    keys,
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Mergeable fixed-point summary partials — the incremental-rollup
    primitive: aggregate each ingest batch / partition / day ONCE into
    (n, sum_units, min_units, max_units) and answer any coarser
    grouping later by MERGING partials (``merge_stats_partials``)
    instead of rescanning raw data. At warehouse scale this is the
    difference between a month-end report touching 30 partial rows per
    key and re-reading a month of raw events.

    Exactness is the design point: the value is converted to integer
    units at ``scale`` decimals (``floor(v·10^s + 0.5)``, the repo's
    shared half-up spelling) and summed as BIGINT — integer addition
    is associative, so merged partials equal a direct scan BIT-exactly
    regardless of partition order, which a double sum cannot promise.
    One keyed aggregation with map-side partials; NULL values are
    excluded from n and every unit column.

    Output: keys + ``n``, ``sum_units``, ``min_units``, ``max_units``.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value_col).cast("double")
    units = F.floor(v * F.lit(float(10 ** int(scale))) + F.lit(0.5)).cast(
        "long"
    )
    return df.where(v.isNotNull()).groupBy(*ks).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(units).cast("long").alias("sum_units"),
        F.min(units).cast("long").alias("min_units"),
        F.max(units).cast("long").alias("max_units"),
    )


def merge_stats_partials(
    partials: DataFrame,
    keys,
    scale: int = 2,
) -> DataFrame:
    """Merge ``stats_partials`` rows to a coarser grouping and read the
    summary back out in value units. The merge is the monoid fold —
    sum of n, sum of sum_units, min of mins, max of maxes — so it is
    exact and order-independent; the readout divides by 10^scale once
    at the end (one double division per column, spelled identically in
    the oracle).

    Output: keys + ``n``, ``sum_value``, ``min_value``, ``max_value``,
    ``avg_value`` (rounded to 6).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    s = F.lit(float(10 ** int(scale)))
    merged = partials.groupBy(*ks).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_units").cast("long").alias("_su"),
        F.min("min_units").cast("long").alias("_mn"),
        F.max("max_units").cast("long").alias("_mx"),
    )
    return merged.select(
        *ks,
        "n",
        (F.col("_su") / s).alias("sum_value"),
        (F.col("_mn") / s).alias("min_value"),
        (F.col("_mx") / s).alias("max_value"),
        F.round(F.col("_su") / s / F.col("n"), 6).alias("avg_value"),
    )
