"""Local warehouse: the engine's storage layer.

Replaces the reference's JDBC/ixmp4 backends (SURVEY.md §1.6) with a
Spark-readable parquet layout plus an atomic driver-side catalog:

    <root>/catalog.json                  runs, codelists, meta, docs
    <root>/runs.parquet  meta.parquet    Spark-readable catalog mirrors
    <root>/runs/<run_id>/                one directory per run (version)
        items.json                       dynamic item registry
        set_data.parquet  par_data.parquet  sol_data.parquet
        ts_data.parquet   geo_data.parquet  cat_data.parquet
        history/<commit_n>/              per-commit snapshots (hardlinks)

Commit protocol (SURVEY.md §7 step 1 "hard part"): a commit's tables are
written into a writer-unique ``.staging-<pid>-<n>/`` dir, then — under an
exclusive per-run file lock (``.commit.lock``) — swapped in with atomic
per-file renames and the catalog's ``commit`` counter flipped last.
Concurrent committers on the same run serialize on the lock; a reader
that loads multiple tables without the lock can still observe tables
from two adjacent commits (single-file reads are always atomic) — whole-
run snapshot isolation is what Delta's log supplies on a cluster. On a
production cluster the same protocol is one Delta transaction per commit
(each table write = one AddFile set, visibility = the Delta log); the
catalog.json is this repo's stand-in for the metastore + Delta log.

Scale design: fact tables are partitioned by ``run_id`` (every query is
run-scoped — SURVEY.md §4 P11, the dominant pruning axis); model data per
run is model-sized (the reference stages it in pandas/Java heaps), so the
write path uses pyarrow directly — no Spark job per small commit — while
every *read* is a Spark parquet scan with pushdown. Bulk time-series
ingest goes through the Spark writer (``append_ts_spark``).
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import time
from contextlib import contextmanager
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# Long-format fact schemas (SURVEY.md §1.6): keys are array<string> so one
# schema fits any item arity; labels string, values double, year int.
SCHEMAS: dict[str, pa.Schema] = {
    "set_data": pa.schema(
        [
            ("run_id", pa.int64()),
            ("name", pa.string()),
            ("key", pa.list_(pa.string())),
            ("comment", pa.string()),
        ]
    ),
    "par_data": pa.schema(
        [
            ("run_id", pa.int64()),
            ("name", pa.string()),
            ("key", pa.list_(pa.string())),
            ("value", pa.float64()),
            ("unit", pa.string()),
        ]
    ),
    "sol_data": pa.schema(
        [
            ("run_id", pa.int64()),
            ("name", pa.string()),
            ("ix_type", pa.string()),  # 'var' | 'equ'
            ("key", pa.list_(pa.string())),
            ("lvl", pa.float64()),
            ("mrg", pa.float64()),
        ]
    ),
    # FIELDS["ts_get"] + meta flag (reference backend/common.py:33)
    "ts_data": pa.schema(
        [
            ("run_id", pa.int64()),
            ("region", pa.string()),
            ("variable", pa.string()),
            ("unit", pa.string()),
            ("subannual", pa.string()),
            ("year", pa.int32()),
            ("value", pa.float64()),
            ("meta", pa.bool_()),
        ]
    ),
    # geodata: value is a string (reference timeseries.py:33–41)
    "geo_data": pa.schema(
        [
            ("run_id", pa.int64()),
            ("region", pa.string()),
            ("variable", pa.string()),
            ("unit", pa.string()),
            ("subannual", pa.string()),
            ("year", pa.int32()),
            ("value", pa.string()),
            ("meta", pa.bool_()),
        ]
    ),
    # category mapping sets (U5, reference base.py:1232–1288): categories
    # over the elements of a simple set; one row per (set, cat, element)
    "cat_data": pa.schema(
        [
            ("run_id", pa.int64()),
            ("name", pa.string()),  # the categorized set's name
            ("cat", pa.string()),
            ("key", pa.string()),
        ]
    ),
}

FACT_TABLES = tuple(SCHEMAS)

#: Bucketed fact layout (SURVEY.md §1.6 "partition by run_id, bucket by
#: name/key"): Spark-path snapshot writes cluster each fact table by its
#: JOIN key so the warehouse's hot joins — version diff (J1), update_par
#: anti-join (J2), write-path key validation (J3) — see co-partitioned
#: scans and need no shuffle of the fact side(s). run_id partitioning
#: stays structural (one directory per run). Keyed tables bucket by the
#: full ``key`` array (high cardinality — name alone would put a whole
#: parameter in one bucket); time-series tables by (region, variable),
#: a subset of every TS alignment join's keys.
BUCKET_KEYS: dict[str, tuple[str, ...]] = {
    "par_data": ("key",),
    "set_data": ("key",),
    "sol_data": ("key",),
    "ts_data": ("region", "variable"),
    "geo_data": ("region", "variable"),
}

#: marker written INSIDE a bucketed snapshot directory (underscore prefix:
#: both Spark's file-source listing and pyarrow's dataset discovery skip
#: it), so the bucket spec travels with the directory through the atomic
#: staging rename and into history hardlink snapshots
BUCKET_MARKER = "_ixmp_buckets.json"


def fact_buckets() -> int:
    """Default bucket count for Spark-path fact writes, FROZEN into a
    warehouse's catalog at creation (exchange-free joins need EQUAL
    bucket counts on both sides, so every snapshot in one warehouse must
    agree — an env change mid-life would silently bring the shuffle
    back). Sizing rule: ~1–3M rows (≲128 MB) per bucket of the largest
    fact table — the r10 1e8-row smoke measured 32 buckets (3.1M
    rows/bucket) spilling the write-side sort at 52.7 s while 128
    buckets committed in 22.7 s. Local default = cores; a production
    deployment sets IXMP_SPARK_FACT_BUCKETS to its target scan
    parallelism before creating the warehouse (0 disables bucketing)."""
    return int(os.environ.get("IXMP_SPARK_FACT_BUCKETS", "32"))


def fact_sort() -> bool:
    """Whether bucketed fact writes also SORT each bucket by the key
    (``IXMP_SPARK_FACT_SORT``, default on). Unlike the bucket COUNT —
    frozen per warehouse because co-partitioned joins need equal counts
    on both sides — sortedness is a per-snapshot property recorded in
    its own marker: a sorted and an unsorted snapshot with the same
    CLUSTERED BY spec still join exchange-free, the unsorted side just
    pays a per-partition in-memory sort at read time. The knob exists
    because write-side sort pressure was the superlinear term in the
    r10 2e8-row commit (REHEARSAL_warehouse_200x_r10: 31.4 -> 113.9 s
    for 2x rows): write-heavy ingest pipelines set it to 0 and move the
    sort to the (cheap, exchange-free) read side; diff-many warehouses
    keep the default and pre-pay it once."""
    return os.environ.get("IXMP_SPARK_FACT_SORT", "1").lower() not in (
        "0",
        "false",
        "off",
    )

#: Spark DDL forms of SCHEMAS (explicit schemas for createDataFrame —
#: inference fails on empty staged frames)
SPARK_DDL: dict[str, str] = {
    "set_data": "run_id long, name string, key array<string>, comment string",
    "par_data": (
        "run_id long, name string, key array<string>, value double, "
        "unit string"
    ),
    "sol_data": (
        "run_id long, name string, ix_type string, key array<string>, "
        "lvl double, mrg double"
    ),
    "ts_data": (
        "run_id long, region string, variable string, unit string, "
        "subannual string, year int, value double, meta boolean"
    ),
    "geo_data": (
        "run_id long, region string, variable string, unit string, "
        "subannual string, year int, value string, meta boolean"
    ),
    "cat_data": "run_id long, name string, cat string, key string",
}

#: Spark-readable mirrors of the catalog's runs / meta sections — written
#: alongside catalog.json on every catalog update so scenario_list /
#: search_meta-style queries run as parquet scans, not driver JSON loops.
RUNS_SCHEMA = pa.schema(
    [
        ("run_id", pa.int64()),
        ("model", pa.string()),
        ("scenario", pa.string()),
        ("version", pa.int32()),
        ("scheme", pa.string()),
        ("is_default", pa.bool_()),
        ("commit", pa.int32()),
        ("annotation", pa.string()),
        ("cre_user", pa.string()),
        ("cre_date", pa.string()),
        ("upd_user", pa.string()),
        ("upd_date", pa.string()),
        ("locked", pa.bool_()),
    ]
)
META_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("value_json", pa.string()),  # JSON-encoded (meta values are typed)
        ("model", pa.string()),
        ("scenario", pa.string()),
        ("version", pa.int32()),
    ]
)


def _empty(table: str) -> pd.DataFrame:
    return SCHEMAS[table].empty_table().to_pandas()


class LocalWarehouse:
    """Catalog + per-run parquet snapshots with atomic commit swap."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(os.path.join(self.root, "runs"), exist_ok=True)
        self._catalog_path = os.path.join(self.root, "catalog.json")
        self._staging_seq = itertools.count()
        # (run_id, table) -> registered bucketed-table name (spark_fact)
        self._registered: dict[tuple[int, str], str] = {}
        # history-snapshot table registrations (spark_fact_at), keyed by
        # (run_id, commit) -> set of table names, so vacuum() can drop
        # the Spark-catalog entries whose locations it deletes
        # (run_id, commit) -> {table_name: registering SparkSession}.
        # The session is tracked PER registration (ADVICE r11): with one
        # last-seen session, names registered from another still-open
        # session survive vacuum over a deleted location — the exact
        # empty-scan bug this tracking exists to prevent.
        self._hist_registered: dict[tuple[int, int], dict[str, object]] = {}
        if os.path.exists(self._catalog_path) and not os.path.exists(
            os.path.join(self.root, "runs.parquet")
        ):
            # warehouse created before the parquet mirrors existed
            self._write_catalog_mirrors(self.catalog())
        if not os.path.exists(self._catalog_path):
            self._write_catalog(
                {
                    "fact_buckets": fact_buckets(),
                    "next_run_id": 1,
                    "runs": {},
                    "units": [],
                    # region -> {hierarchy, parent}; synonyms resolved on write
                    "regions": {},
                    "region_synonyms": {},
                    # name -> {category, duration}; 'Year' predefined
                    "timeslices": {"Year": {"category": "Common", "duration": 1.0}},
                    "models": [],
                    "scenarios": [],
                    "meta": [],
                    "docs": {},
                }
            )
        # frozen at warehouse creation (see fact_buckets); warehouses
        # created before the bucketed layout fall back to the env default
        self.n_buckets: int = self.catalog().get(
            "fact_buckets", fact_buckets()
        )

    # -- catalog ----------------------------------------------------------
    def catalog(self) -> dict[str, Any]:
        with open(self._catalog_path) as f:
            return json.load(f)

    def _write_catalog(self, cat: dict[str, Any]) -> None:
        tmp = self._catalog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cat, f, indent=1)
        os.replace(tmp, self._catalog_path)  # atomic visibility flip
        self._write_catalog_mirrors(cat)

    @property
    def runs_path(self) -> str:
        """Spark-readable runs dimension table (parquet)."""
        return os.path.join(self.root, "runs.parquet")

    @property
    def meta_path(self) -> str:
        """Spark-readable meta entries table (parquet)."""
        return os.path.join(self.root, "meta.parquet")

    def _write_catalog_mirrors(self, cat: dict[str, Any]) -> None:
        """Mirror runs/meta into parquet so registry queries are Spark
        scans (broadcast-sized dims, but scan-able with pushdown — the
        catalog JSON stays only the commit pointer / codelist store)."""
        runs = pd.DataFrame(
            [{"run_id": int(rid), **r} for rid, r in cat["runs"].items()],
            columns=[f.name for f in RUNS_SCHEMA],
        )
        meta = pd.DataFrame(
            [
                {
                    "name": m["name"],
                    "value_json": json.dumps(m["value"]),
                    "model": m["model"],
                    "scenario": m["scenario"],
                    "version": m["version"],
                }
                for m in cat["meta"]
            ],
            columns=[f.name for f in META_SCHEMA],
        )
        for path, df, schema in (
            (self.runs_path, runs, RUNS_SCHEMA),
            (self.meta_path, meta, META_SCHEMA),
        ):
            tmp = path + ".tmp"
            pq.write_table(
                pa.Table.from_pandas(df, schema=schema, preserve_index=False),
                tmp,
                compression="zstd",
            )
            os.replace(tmp, path)

    def update_catalog(self, fn) -> dict[str, Any]:
        """Read-modify-write under an advisory file lock: concurrent
        drivers (e.g. CLI + notebook on the same warehouse) serialize
        their catalog mutations. On a cluster the metastore/Delta log
        provides this; locally fcntl does."""
        import fcntl

        lock_path = self._catalog_path + ".lock"
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                cat = self.catalog()
                fn(cat)
                self._write_catalog(cat)
                return cat
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    # -- runs -------------------------------------------------------------
    def run_dir(self, run_id: int) -> str:
        return os.path.join(self.root, "runs", str(run_id))

    def new_run(
        self, model: str, scenario: str, scheme: str | None = None,
        annotation: str | None = None, user: str = "ixmp_spark",
    ) -> tuple[int, int]:
        """Allocate a run: version = max existing version + 1 (W2)."""
        out: dict[str, int] = {}

        def alloc(cat):
            rid = cat["next_run_id"]
            cat["next_run_id"] = rid + 1
            versions = [
                r["version"]
                for r in cat["runs"].values()
                if r["model"] == model and r["scenario"] == scenario
            ]
            version = (max(versions) + 1) if versions else 1
            now = time.strftime("%Y-%m-%d %H:%M:%S")
            cat["runs"][str(rid)] = {
                "model": model,
                "scenario": scenario,
                "version": version,
                "scheme": scheme,
                "is_default": False,
                "commit": 0,
                "annotation": annotation,
                "cre_user": user,
                "cre_date": now,
                "upd_user": None,
                "upd_date": None,
                "locked": False,
            }
            if model not in cat["models"]:
                cat["models"].append(model)
            if scenario not in cat["scenarios"]:
                cat["scenarios"].append(scenario)
            out["rid"], out["version"] = rid, version

        self.update_catalog(alloc)
        os.makedirs(self.run_dir(out["rid"]), exist_ok=True)
        self._write_run_tables(
            out["rid"], {t: _empty(t) for t in FACT_TABLES}, items={}
        )
        return out["rid"], out["version"]

    def resolve_run(
        self, model: str, scenario: str, version: int | None = None
    ) -> tuple[int, dict[str, Any]]:
        """Default-version resolution (W1, reference base.py:557–584):
        explicit version, else the default flag, else max version."""
        cat = self.catalog()
        cands = {
            int(k): v
            for k, v in cat["runs"].items()
            if v["model"] == model and v["scenario"] == scenario
        }
        if not cands:
            raise ValueError(f"no runs for model={model!r} scenario={scenario!r}")
        if version is not None:
            for rid, r in cands.items():
                if r["version"] == version:
                    return rid, r
            raise ValueError(f"version {version} not found for {model}/{scenario}")
        defaults = [(rid, r) for rid, r in cands.items() if r["is_default"]]
        if defaults:
            return defaults[0]
        rid = max(cands, key=lambda i: cands[i]["version"])
        return rid, cands[rid]

    # -- per-run tables ---------------------------------------------------
    def read_items(self, run_id: int) -> dict[str, Any]:
        p = os.path.join(self.run_dir(run_id), "items.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def read_table(self, run_id: int, table: str) -> pd.DataFrame:
        p = os.path.join(self.run_dir(run_id), f"{table}.parquet")
        if not os.path.exists(p):
            return _empty(table)
        if os.path.isdir(p) and not any(
            f.endswith(".parquet") for f in os.listdir(p)
        ):
            # a Spark directory write of an EMPTY frame leaves no part
            # files (just _SUCCESS / the bucket marker)
            return _empty(table)
        return pq.read_table(p).to_pandas()

    def table_path(self, run_id: int, table: str) -> str:
        return os.path.join(self.run_dir(run_id), f"{table}.parquet")

    def table_num_rows(self, run_id: int, table: str) -> int:
        """Row count of a committed table from parquet FOOTERS only — no
        data pages read, no Spark job. This is clone()'s dispatch signal:
        model-sized tables stage through pandas, anything bigger goes
        through the distributed path without ever touching the driver."""
        p = self.table_path(run_id, table)
        if not os.path.exists(p):
            return 0
        if os.path.isdir(p):  # Spark directory write
            return sum(
                pq.read_metadata(os.path.join(p, f)).num_rows
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
        return pq.read_metadata(p).num_rows

    def _write_run_tables(
        self,
        run_id: int,
        tables: dict[str, Any],
        items: dict[str, Any] | None = None,
    ) -> None:
        """Stage the new snapshot, swap atomically, bump commit counter
        last — the parquet analogue of one Delta transaction.

        A table value may be a pandas DataFrame (model-sized data, written
        by pyarrow as a single file) or a Spark DataFrame (bulk data,
        written distributed as a parquet *directory* — both pyarrow and
        Spark read either form transparently). On a cluster both paths are
        one Delta ``write``/``MERGE`` inside the commit transaction.
        """
        rdir = self.run_dir(run_id)
        # Unique staging dir per writer: two committers on the same run
        # never clobber each other's staging mid-write (the table swap
        # itself is serialized by the per-run lock in commit_run).
        staging = os.path.join(
            rdir, f".staging-{os.getpid()}-{next(self._staging_seq)}"
        )
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging)
        for t, df in tables.items():
            target = os.path.join(staging, f"{t}.parquet")
            if isinstance(df, pd.DataFrame):
                pq.write_table(
                    pa.Table.from_pandas(
                        df.reset_index(drop=True),
                        schema=SCHEMAS[t],
                        preserve_index=False,
                    ),
                    target,
                    compression="zstd",
                )
            elif isinstance(df, pa.Table):
                # Arrow-native staging (r14 bulk-ingest fast path): the
                # table is already schema-cast — write it without a
                # pandas round-trip
                pq.write_table(
                    df.cast(SCHEMAS[t]), target, compression="zstd"
                )
            else:  # Spark DataFrame → distributed directory write
                cols = [f.name for f in SCHEMAS[t]]
                keys = BUCKET_KEYS.get(t)
                hint = getattr(df, "_ixmp_bucket_spec", None)
                sdf = df.select(*cols)
                if keys and self.n_buckets > 0:
                    self._write_bucketed(
                        sdf,
                        target,
                        keys,
                        self.n_buckets,
                        pre_partitioned=hint == (tuple(keys), self.n_buckets),
                    )
                else:
                    sdf.write.mode("overwrite").parquet(target)
        if items is not None:
            with open(os.path.join(staging, "items.json"), "w") as f:
                json.dump(items, f, indent=1)
        for fname in os.listdir(staging):
            dst = os.path.join(rdir, fname)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            elif os.path.exists(dst) and os.path.isdir(
                os.path.join(staging, fname)
            ):
                os.remove(dst)
            os.replace(os.path.join(staging, fname), dst)
        shutil.rmtree(staging, ignore_errors=True)

    def _write_bucketed(
        self,
        sdf,
        target: str,
        keys: tuple[str, ...],
        n_buckets: int,
        pre_partitioned: bool = False,
    ) -> None:
        """Distributed snapshot write in the bucketed layout: the data
        lands hash-clustered (+ sorted) by its join key, so later joins
        and aggregations on that key scan co-partitioned and skip the
        exchange — the ``bucket_table`` strategy (operators/scale.py:57)
        wired into Platform storage. Mechanics: Spark only records
        bucket metadata through ``saveAsTable``, so the write goes
        through a throwaway EXTERNAL table pointed at the staging path
        (dropping it keeps the files); the bucket spec is persisted in a
        ``_ixmp_buckets.json`` marker inside the directory, and readers
        re-register an external bucketed table over the committed
        location (``spark_fact``). The explicit repartition on the
        bucket key uses the same murmur3 hash as the bucket spec, so
        every task holds exactly one bucket → exactly ``n_buckets``
        files instead of tasks x buckets. ``pre_partitioned`` skips that
        repartition when the input is a narrow transform of a matching
        bucketed scan (clone's INSERT-SELECT): the rows already sit one
        bucket per task, so re-shuffling them is pure waste — and even
        if the hint were wrong, the writer hashes every row to its
        correct bucket FILE, so the only possible cost is extra files,
        never misplaced rows."""
        spark = sdf.sparkSession
        tmp = f"ixwh_stage_{os.getpid()}_{next(self._staging_seq)}"
        if not pre_partitioned:
            sdf = sdf.repartition(n_buckets, *keys)
        sort = fact_sort()
        try:
            writer = sdf.write.bucketBy(n_buckets, keys[0], *keys[1:])
            if sort:
                writer = writer.sortBy(keys[0], *keys[1:])
            (
                writer.option("path", target)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tmp)
            )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS `{tmp}`")
        with open(os.path.join(target, BUCKET_MARKER), "w") as f:
            json.dump(
                {"keys": list(keys), "buckets": n_buckets, "sorted": sort},
                f,
            )

    def bucket_spec(self, run_id: int, table: str) -> dict[str, Any] | None:
        """The committed snapshot's bucket layout, or None when it was
        written by the single-file pandas path / with bucketing off."""
        marker = os.path.join(self.table_path(run_id, table), BUCKET_MARKER)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return json.load(f)

    def spark_fact(self, spark, run_id: int, table: str):
        """Spark view of a committed fact table. Bucketed snapshots come
        back as a bucketed-TABLE scan (their HashPartitioning on the
        bucket key reaches Catalyst, so joins/aggregations keyed by it
        elide the exchange); plain snapshots fall back to a path read.
        Registration is per (warehouse, run, table, commit): the commit
        counter in the name makes a fresh registration — with a fresh
        file listing — after every commit swap, and the stale name is
        dropped (external tables: metadata only, files untouched)."""
        path = self.table_path(run_id, table)
        spec = self.bucket_spec(run_id, table)
        if spec is None:
            return spark.read.parquet(path)
        import hashlib

        commit = self.catalog()["runs"][str(run_id)]["commit"]
        digest = hashlib.md5(
            f"{self.root}|{run_id}|{table}".encode()
        ).hexdigest()[:10]
        name = f"ixwh_{digest}_c{commit}"
        if not spark.catalog.tableExists(name):
            cols = ", ".join(f"`{k}`" for k in spec["keys"])
            sorted_by = (
                f" SORTED BY ({cols})" if spec.get("sorted", True) else ""
            )
            spark.sql(
                f"CREATE TABLE `{name}` ({SPARK_DDL[table]}) USING parquet"
                f" CLUSTERED BY ({cols}){sorted_by}"
                f" INTO {spec['buckets']} BUCKETS LOCATION '{path}'"
            )
            stale = self._registered.pop((run_id, table), None)
            if stale and stale != name:
                spark.sql(f"DROP TABLE IF EXISTS `{stale}`")
            self._registered[(run_id, table)] = name
        out = spark.table(name)
        # write-path hint (see _write_bucketed): this scan already holds
        # each bucket's rows in one task, so a narrow-transformed rewrite
        # (clone) can skip the pre-write repartition. Purely a file-count
        # optimization — a wrong/stale hint cannot misplace rows, the
        # bucketBy writer hashes every row to its correct bucket file.
        out._ixmp_bucket_spec = (tuple(spec["keys"]), spec["buckets"])
        return out

    def spark_fact_at(self, spark, run_id: int, table: str, commit: int):
        """Spark view of a fact table AS OF a past commit, bucketed when
        the snapshot was (history hardlinks carry the bucket marker), so
        version-diff joins against history elide the exchange exactly
        like live-vs-live diffs. History snapshots are immutable while
        retained, but ``vacuum`` can delete them — registrations are
        tracked per (run, commit) so vacuum drops the Spark-catalog
        entries alongside the files (a reused name over a deleted
        location would scan empty instead of raising)."""
        path = self.table_path_at(run_id, table, commit)
        marker = os.path.join(path, BUCKET_MARKER)
        if not os.path.exists(marker):
            return spark.read.parquet(path)
        with open(marker) as f:
            spec = json.load(f)
        import hashlib

        digest = hashlib.md5(
            f"{self.root}|{run_id}|{table}|h{commit}".encode()
        ).hexdigest()[:10]
        name = f"ixwh_{digest}_h{commit}"
        if not spark.catalog.tableExists(name):
            cols = ", ".join(f"`{k}`" for k in spec["keys"])
            sorted_by = (
                f" SORTED BY ({cols})" if spec.get("sorted", True) else ""
            )
            spark.sql(
                f"CREATE TABLE `{name}` ({SPARK_DDL[table]}) USING parquet"
                f" CLUSTERED BY ({cols}){sorted_by}"
                f" INTO {spec['buckets']} BUCKETS LOCATION '{path}'"
            )
        self._hist_registered.setdefault((run_id, commit), {})[name] = spark
        return spark.table(name)

    @contextmanager
    def _run_lock(self, run_id: int):
        """Advisory per-run exclusive lock: serializes the table swap +
        catalog bump of concurrent committers on the same run (the CLI +
        notebook case). On a cluster the Delta log's optimistic commit
        provides this; locally fcntl does."""
        import fcntl

        lock_path = os.path.join(self.run_dir(run_id), ".commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def commit_run(
        self,
        run_id: int,
        tables: dict[str, pd.DataFrame],
        items: dict[str, Any],
        comment: str | None = None,
        user: str = "ixmp_spark",
    ) -> None:
        def bump(cat):
            r = cat["runs"][str(run_id)]
            r["commit"] += 1
            r["upd_user"] = user
            r["upd_date"] = time.strftime("%Y-%m-%d %H:%M:%S")
            if comment:
                r["annotation"] = comment

        with self._run_lock(run_id):
            commit_n = self.catalog()["runs"][str(run_id)]["commit"] + 1
            self._write_run_tables(run_id, tables, items)
            self._snapshot_history(run_id, commit_n)
            self.update_catalog(bump)

    # -- per-commit history (SURVEY.md §1.6: one ixmp commit = one Delta
    #    transaction; locally each commit hardlinks its table files into
    #    history/<n>/, the stand-in for Delta's VERSION AS OF) ------------
    def _snapshot_history(self, run_id: int, commit_n: int) -> None:
        rdir = self.run_dir(run_id)
        hdir = os.path.join(rdir, "history", str(commit_n))
        shutil.rmtree(hdir, ignore_errors=True)
        os.makedirs(hdir)
        for t in FACT_TABLES:
            src = os.path.join(rdir, f"{t}.parquet")
            if not os.path.exists(src):
                continue
            dst = os.path.join(hdir, f"{t}.parquet")
            if os.path.isdir(src):  # Spark directory write
                shutil.copytree(src, dst, copy_function=os.link)
            else:
                os.link(src, dst)  # zero-copy: new name, same immutable file
        items = os.path.join(rdir, "items.json")
        if os.path.exists(items):
            os.link(items, os.path.join(hdir, "items.json"))

    def commit_history(self, run_id: int) -> list[int]:
        """Addressable committed states of a run, oldest first."""
        hroot = os.path.join(self.run_dir(run_id), "history")
        if not os.path.isdir(hroot):
            return []
        return sorted(int(d) for d in os.listdir(hroot) if d.isdigit())

    def table_path_at(self, run_id: int, table: str, commit: int) -> str:
        """Spark-readable path of a table AS OF a past commit."""
        p = os.path.join(
            self.run_dir(run_id), "history", str(commit), f"{table}.parquet"
        )
        if not os.path.exists(p):
            raise ValueError(f"run {run_id} has no commit {commit}")
        return p

    def read_table_at(self, run_id: int, table: str, commit: int) -> pd.DataFrame:
        return pq.read_table(self.table_path_at(run_id, table, commit)).to_pandas()

    def vacuum(self, run_id: int, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` history snapshots (Delta
        VACUUM analogue — reclaims the retained-commit storage; hardlinked
        files shared with the live tables cost nothing until vacuumed).
        Returns the commit numbers removed."""
        if keep_last < 0:
            raise ValueError("keep_last must be >= 0")
        hist = self.commit_history(run_id)
        drop = hist[: max(0, len(hist) - keep_last)]
        with self._run_lock(run_id):
            for n in drop:
                shutil.rmtree(
                    os.path.join(self.run_dir(run_id), "history", str(n)),
                    ignore_errors=True,
                )
                # drop the Spark-catalog registrations spark_fact_at
                # created over the now-deleted snapshot — a surviving
                # external-table name would make a later spark_fact_at
                # scan an empty/deleted location instead of raising
                for name, sess in self._hist_registered.pop(
                    (run_id, n), {}
                ).items():
                    # each name drops in ITS registering session; a dead
                    # session must not abort the rest of vacuum (the
                    # files are already gone — the catalog entry is the
                    # only thing left to clean)
                    try:
                        sess.sql(f"DROP TABLE IF EXISTS `{name}`")
                    except Exception:
                        pass
        return drop

    def delete_run(self, run_id: int) -> None:
        shutil.rmtree(self.run_dir(run_id), ignore_errors=True)
        self.update_catalog(lambda cat: cat["runs"].pop(str(run_id), None))

    def set_default(self, run_id: int) -> None:
        def flip(cat):
            me = cat["runs"][str(run_id)]
            for rid, r in cat["runs"].items():
                if r["model"] == me["model"] and r["scenario"] == me["scenario"]:
                    r["is_default"] = rid == str(run_id)

        self.update_catalog(flip)
