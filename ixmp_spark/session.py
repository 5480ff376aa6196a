"""SparkSession construction tuned for the target shapes.

Local testing runs ``local[N]`` (single JVM); the configuration is chosen so
the same code scales to a multi-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), shuffle partitions sized to
cores locally but overridable via env for cluster runs, Arrow enabled for
the few pandas-interop paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_SHUFFLE = max(8, os.cpu_count() or 8)


def get_spark(
    app_name: str = "ixmp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism; on a real cluster the
    ``master``/resource settings come from spark-submit and only the SQL
    configs below apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    # scale-adaptive, not a constant: defaults to the local core count
    # (AQE coalescing shrinks small stages from there), overridable for
    # cluster runs where the right number tracks data volume (guide
    # §2.2: size post-shuffle partitions toward 100 MB-1 GB).
    # defensive parse (ADVICE r14): an empty or non-numeric env value
    # must fall back to the core count, not crash session startup
    env_shuffle = os.environ.get("IXMP_SPARK_SHUFFLE_PARTITIONS", "")
    shuffle = str(
        shuffle_partitions
        or (int(env_shuffle) if env_shuffle.strip().isdigit() else 0)
        or int(cpus)
    )
    # shuffle codec: lz4 locally (local dirs are RAM-backed tmpfs, so
    # shuffle bytes are nearly free and lz4's lower CPU wins — A-B on
    # the three shuffle-heaviest bench queries showed zstd flat-to-
    # slower, e.g. d3 warm 1.75 s lz4 vs 2.35 s zstd); on a real
    # cluster set IXMP_SPARK_IO_CODEC=zstd — the markedly better ratio
    # pays when shuffle blocks cross a real network (guide §2.3).
    io_codec = os.environ.get("IXMP_SPARK_IO_CODEC", "lz4")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.io.compression.codec", io_codec)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("IXMP_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fact tables are bucketed by their join key (warehouse.py
        # BUCKET_KEYS); joins on a SUPERSET of the bucket key — e.g.
        # (name, key) in the update_par merge over key-bucketed
        # par_data — must still count as co-partitioned, which the
        # default (true) forbids. Safe here: bucket keys are
        # high-cardinality by design, so partial-key partitioning
        # carries no skew the full key would have avoided.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # shuffle/spill local dirs belong on the fastest device
        # available: this host's /tmp sits on a virtio disk whose
        # latency was measured drifting 0.6 -> 1.5 s per 64 MB probe
        # within one session (BENCH_DETAIL sys blocks, r8), which
        # inflated shuffle-heavy bench queries ~1.3-1.9x. RAM-backed
        # /dev/shm (126 GB, empty) takes the local dirs out of that
        # noise — the local[32] analogue of the NVMe-local-dir rule on
        # a real cluster. Tradeoff (deliberate, bench-scale only):
        # tmpfs "spill" consumes RAM, so under real memory pressure it
        # degrades to OOM rather than to disk — on a production
        # deployment set IXMP_SPARK_LOCAL_DIR to fast DISK so spills
        # spill. Env-overridable; hard fallback is /tmp when /dev/shm
        # is absent.
        .config(
            "spark.local.dir",
            os.environ.get(
                "IXMP_SPARK_LOCAL_DIR",
                "/dev/shm/spark-local"
                if os.path.isdir("/dev/shm")
                else "/tmp",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
