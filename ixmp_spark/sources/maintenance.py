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
