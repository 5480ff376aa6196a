"""TimeSeries: versioned IAMC time-series container.

Reference: ixmp/core/timeseries.py:44 — identified by (model, scenario,
version) with a 1:1 run_id; check_out → mutate → commit lifecycle;
long/wide layouts; geodata; the ``meta`` flag marks rows that survive
remove_solution (SURVEY.md §1.3, §1.5).

Query path is Spark (parquet scan of the run snapshot with pushdown);
mutation path stages pandas in the transaction and commits atomically
through the warehouse (model-sized data — the reference stages in
pandas/Java heaps the same way).
"""

from __future__ import annotations

from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ixmp_spark.core.platform import Platform
from ixmp_spark.operators.filtering import in_list_filter
from ixmp_spark.sources.warehouse import FACT_TABLES

#: IAMC index columns (reference backend/common.py:52)
IAMC_IDX = ["model", "scenario", "region", "variable", "unit"]
_TS_KEY = ["region", "variable", "unit", "subannual", "year"]


def _as_list(v):
    if v is None:
        return None
    if isinstance(v, (str, int, float)):
        return [v]
    return list(v)


class TimeSeries:
    def __init__(
        self,
        platform: Platform,
        model: str,
        scenario: str,
        version: int | str | None = None,
        scheme: str | None = None,
        annotation: str | None = None,
    ):
        self.platform = platform
        self.model = model
        self.scenario = scenario
        wh = platform.wh
        if version == "new":
            self.run_id, self.version = wh.new_run(
                model, scenario, scheme=scheme, annotation=annotation
            )
            self._checked_out = True  # new runs start checked out
        else:
            self.run_id, info = wh.resolve_run(model, scenario, version)
            self.version = info["version"]
            self._checked_out = False
        self._staged: dict[str, pd.DataFrame] | None = None
        if self._checked_out:
            self._load_staging()

    #: committed tables at or above this row count (parquet-footer probe,
    #: the clone() dispatch rule) stage as LAZY Spark frames on check_out
    #: instead of eager driver pandas — checking out a 1e8-row run costs
    #: nothing until a table is actually touched, and bulk updates merge
    #: against the bucketed snapshot scan instead of a LocalTableScan of
    #: driver rows (the r10 smoke's update path)
    STAGE_SPARK_ROWS = 200_000

    # -- lifecycle (reference timeseries.py:208–296) ----------------------
    def _load_staging(self) -> None:
        wh = self.platform.wh
        self._staged = {}
        # identity map of the as-loaded Spark frames: a staged Spark frame
        # still ``is`` its clean twin at commit time was never reassigned,
        # so its table skips the rewrite entirely (the committed snapshot
        # stays in place) — without this, ANY commit on a checked-out
        # 100 TB run would rewrite every untouched fact table
        self._staged_clean = {}
        for t in FACT_TABLES:
            if wh.table_num_rows(self.run_id, t) >= self.STAGE_SPARK_ROWS:
                sdf = wh.spark_fact(self.platform.spark, self.run_id, t)
                self._staged[t] = sdf
                self._staged_clean[t] = sdf
            else:
                self._staged[t] = wh.read_table(self.run_id, t)
        self._staged_items = wh.read_items(self.run_id)

    def check_out(self, timeseries_only: bool = False) -> None:
        if self._checked_out:
            raise RuntimeError("already checked out")
        if self._has_solution_stored() and not timeseries_only:
            raise RuntimeError(
                "This Scenario has a solution; call remove_solution() or "
                "check_out(timeseries_only=True)"
            )
        self._checked_out = True
        self._ts_only = timeseries_only
        self._load_staging()

    def commit(self, comment: str = "") -> None:
        if not self._checked_out:
            raise RuntimeError("not checked out")
        clean = getattr(self, "_staged_clean", None) or {}
        tables = {
            t: df for t, df in self._staged.items() if df is not clean.get(t)
        }
        self.platform.wh.commit_run(
            self.run_id, tables, self._staged_items, comment=comment
        )
        self._checked_out = False
        self._staged = None
        self._staged_clean = {}
        self._post_commit()

    def discard_changes(self) -> None:
        self._checked_out = False
        self._staged = None
        self._staged_clean = {}
        self._discard_staged_extras()

    def _post_commit(self) -> None:
        """Hook: flush commit-coupled side state (subclass extension)."""

    def _discard_staged_extras(self) -> None:
        """Hook: drop commit-coupled side state on discard."""

    @contextmanager
    def transact(
        self,
        message: str = "",
        condition: bool = True,
        discard_on_error: bool = False,
    ):
        """check_out → yield → commit (reference timeseries.py:242–296).

        ``condition=False`` skips checkout/commit entirely (the caller
        handles the lifecycle). On error the default leaves the object
        checked out so the caller can inspect or repair staged state;
        ``discard_on_error=True`` discards staged changes instead."""
        if condition:
            self.check_out()
        try:
            yield self
        except Exception:
            if condition and discard_on_error:
                self.discard_changes()
            raise
        else:
            if condition:
                self.commit(message)

    def set_as_default(self) -> None:
        self.platform.wh.set_default(self.run_id)

    def is_default(self) -> bool:
        return self.platform.wh.catalog()["runs"][str(self.run_id)]["is_default"]

    # -- staging access ---------------------------------------------------
    # A staged table is a pandas DataFrame (model-sized edits), a pyarrow
    # Table (the Arrow-native bulk ingest fast path — r14: skips the
    # object-array pandas conversion of the key column, measured 0.95 s
    # → 0.16 s for a 1e6-row collect), or a Spark DataFrame (distributed
    # bulk paths) — the warehouse writes any of the three on commit.
    def _table(self, table: str) -> pd.DataFrame:
        if self._checked_out and self._staged is not None:
            staged = self._staged[table]
            if isinstance(staged, pd.DataFrame):
                return staged
            import pyarrow as pa

            if isinstance(staged, pa.Table):
                return staged.to_pandas()
            return staged.toPandas()
        return self.platform.wh.read_table(self.run_id, table)

    def _set_table(self, table: str, df) -> None:
        if not self._checked_out:
            raise RuntimeError("not checked out — call check_out() first")
        if isinstance(df, pd.DataFrame):
            df = df.reset_index(drop=True)
        self._staged[table] = df

    def _spark_table(self, table: str) -> DataFrame:
        """Spark view of the run's committed snapshot (+ staged rows when
        checked out — via createDataFrame, used by tests and reporting)."""
        if self._checked_out and self._staged is not None:
            staged = self._staged[table]
            from ixmp_spark.sources.warehouse import SCHEMAS, SPARK_DDL
            import pyarrow as pa

            if isinstance(staged, pd.DataFrame):
                staged = pa.Table.from_pandas(
                    staged.reset_index(drop=True), schema=SCHEMAS[table],
                    preserve_index=False,
                )
            if isinstance(staged, pa.Table):
                return self.platform.spark.createDataFrame(
                    staged.to_pandas(), schema=SPARK_DDL[table]
                )
            return staged
        # bucketed snapshots come back as a bucketed-table scan, so joins
        # and aggregations on the bucket key (diff_par, update_par merge,
        # key validation) skip the fact-side exchange
        return self.platform.wh.spark_fact(
            self.platform.spark, self.run_id, table
        )

    def _has_solution_stored(self) -> bool:
        # parquet-footer count: no data read, no driver materialization
        return self.platform.wh.table_num_rows(self.run_id, "sol_data") > 0

    # -- per-commit history (Delta VERSION AS OF analogue) ----------------
    def commit_history(self) -> list[int]:
        """Commit numbers of this run's addressable past states."""
        return self.platform.wh.commit_history(self.run_id)

    def spark_table_at(self, table: str, commit: int) -> DataFrame:
        """Spark view of a fact table AS OF a past commit (each ixmp
        commit = one retained snapshot; on a cluster this is Delta time
        travel on the same transaction boundary)."""
        return self.platform.spark.read.parquet(
            self.platform.wh.table_path_at(self.run_id, table, commit)
        )

    # -- time-series data (SURVEY.md §1.3, F5, A5) ------------------------
    def add_timeseries(
        self, df: pd.DataFrame, year_lim=(None, None), meta: bool = False
    ) -> None:
        """Accepts long (year/value columns) or wide (IAMC year-column)
        layout; normalizes via to_iamc_layout semantics (C2): lowercase
        columns, node→region, subannual defaults 'Year'; region synonyms
        resolved (J6); NaN values dropped (C10); unit/region must exist."""
        data = df.copy()
        data.columns = [str(c).lower() if isinstance(c, str) else c for c in data.columns]
        if "node" in data.columns:
            data = data.rename(columns={"node": "region"})
        if "subannual" not in data.columns:
            data["subannual"] = "Year"
        id_cols = [c for c in data.columns if c in ("region", "variable", "unit", "subannual")]
        for required in ("region", "variable", "unit"):
            if required not in id_cols:
                raise ValueError(f"missing column {required!r}")
        if "year" not in data.columns:  # wide → long
            year_cols = [c for c in data.columns if _is_int(c)]
            data = data.melt(
                id_vars=[c for c in data.columns if c not in year_cols],
                value_vars=year_cols,
                var_name="year",
                value_name="value",
            )
        data["year"] = data["year"].astype(int)
        lo, hi = year_lim
        if lo is not None:
            data = data[data["year"] >= lo]
        if hi is not None:
            data = data[data["year"] <= hi]
        data = data.dropna(subset=["value"])
        data["region"] = data["region"].map(self.platform.resolve_region)
        known_units = set(self.platform.units())
        bad_units = set(data["unit"]) - known_units
        if bad_units:
            raise ValueError(f"unknown units {sorted(bad_units)}; add_unit first")
        known_regions = set(self.platform.wh.catalog()["regions"])
        bad_regions = set(data["region"]) - known_regions
        if bad_regions:
            raise ValueError(f"unknown regions {sorted(bad_regions)}; add_region first")

        new = data[["region", "variable", "unit", "subannual", "year", "value"]].copy()
        new.insert(0, "run_id", self.run_id)
        new["meta"] = bool(meta)
        cur = self._table("ts_data")
        # upsert on the 5-part series key (reference set_data overwrite)
        merged = pd.concat([cur, new], ignore_index=True).drop_duplicates(
            subset=_TS_KEY, keep="last"
        )
        self._set_table("ts_data", merged)

    def timeseries(
        self,
        region=None,
        variable=None,
        unit=None,
        year=None,
        iamc: bool = False,
        subannual: bool | str = "auto",
    ) -> pd.DataFrame:
        """Filtered retrieval (F5): IN-lists on 4 columns, long or IAMC
        layout; subannual='auto' drops the column iff all values 'Year'."""
        sdf = self._spark_table("ts_data")
        filters = {
            "region": _as_list(region),
            "variable": _as_list(variable),
            "unit": _as_list(unit),
            "year": _as_list(year),
        }
        sdf = in_list_filter(sdf, {k: v for k, v in filters.items() if v})
        out = (
            sdf.select("region", "variable", "unit", "subannual", "year", "value")
            .orderBy("region", "variable", "subannual", "year")
            .toPandas()
        )
        out.insert(0, "model", self.model)
        out.insert(1, "scenario", self.scenario)
        drop_sub = subannual == "auto" and (out["subannual"] == "Year").all()
        if subannual is False:
            if not (out["subannual"] == "Year").all():
                raise ValueError("subannual data present; cannot drop column")
            drop_sub = True
        if drop_sub:
            out = out.drop(columns=["subannual"])
        if iamc:
            idx = [c for c in out.columns if c not in ("year", "value")]
            out = (
                out.pivot_table(values="value", index=idx, columns="year", aggfunc="first")
                .reset_index()
            )
            out.columns.name = None
            out.columns = [c if isinstance(c, str) else int(c) for c in out.columns]
        return out

    def add_timeseries_bulk(self, sdf: DataFrame, meta: bool = False) -> None:
        """Spark-native bulk ingest — the 100 TB write path.

        Unlike the row-staged ``add_timeseries`` (model-sized data), this
        never materializes on the driver: the input DataFrame is validated
        with broadcast anti-joins (J3: unit/region membership against the
        codelists), normalized, and appended to the run's ts_data parquet
        through the staging-swap commit. The reference's per-row
        ``backend.set_data`` loop (timeseries.py:338–417) becomes one
        distributed write.

        Must be called while checked out; the commit happens with the
        transaction like any other edit. Columns required: region,
        variable, unit, year, value; subannual defaults to 'Year'.
        """
        if not self._checked_out:
            raise RuntimeError("not checked out — call check_out() first")
        cols = dict(sdf.dtypes)
        if "subannual" not in cols:
            sdf = sdf.withColumn("subannual", F.lit("Year"))
        # region synonym resolution (J6) via broadcast map
        syn = self.platform.wh.catalog()["region_synonyms"]
        if syn:
            syn_df = F.broadcast(
                self.platform.spark.createDataFrame(
                    list(syn.items()), "region string, __canonical string"
                )
            )
            sdf = (
                sdf.join(syn_df, "region", "left")
                .withColumn("region", F.coalesce("__canonical", "region"))
                .drop("__canonical")
            )
        # strict membership validation (J3) — broadcast anti-joins
        units = self.platform.units()
        bad_units = (
            sdf.select("unit").distinct()
            .join(
                F.broadcast(
                    self.platform.spark.createDataFrame(
                        [(u,) for u in units], "unit string"
                    )
                ),
                "unit",
                "left_anti",
            )
            .limit(5)
            .collect()
        )
        if bad_units:
            raise ValueError(
                f"unknown units {[r['unit'] for r in bad_units]}; add_unit first"
            )
        regions = list(self.platform.wh.catalog()["regions"])
        bad_regions = (
            sdf.select("region").distinct()
            .join(
                F.broadcast(
                    self.platform.spark.createDataFrame(
                        [(r,) for r in regions], "region string"
                    )
                ),
                "region",
                "left_anti",
            )
            .limit(5)
            .collect()
        )
        if bad_regions:
            raise ValueError(
                f"unknown regions {[r['region'] for r in bad_regions]}"
            )
        out = sdf.select(
            F.lit(self.run_id).cast("long").alias("run_id"),
            F.col("region").cast("string"),
            F.col("variable").cast("string"),
            F.col("unit").cast("string"),
            F.col("subannual").cast("string"),
            F.col("year").cast("int"),
            F.col("value").cast("double"),
            F.lit(bool(meta)).alias("meta"),
        ).where(~F.isnan("value"))
        # key upsert entirely Spark-side: new rows win, current rows
        # survive only where their series key is absent — the commit then
        # writes the merged frame distributed (no driver materialization;
        # on a cluster this is one Delta MERGE in the commit transaction)
        out = out.dropDuplicates(_TS_KEY)
        cur = self._spark_table("ts_data")
        merged = out.unionByName(
            cur.join(out.select(*_TS_KEY), on=_TS_KEY, how="left_anti")
        )
        self._set_table("ts_data", merged)

    def timeseries_spark(self, **filters) -> DataFrame:
        """Spark-native filtered TS read (no driver materialization)."""
        sdf = self._spark_table("ts_data")
        fmap = {
            k: _as_list(v)
            for k, v in filters.items()
            if k in ("region", "variable", "unit", "year") and v is not None
        }
        return in_list_filter(sdf, fmap)

    def preload_timeseries(self) -> None:
        """P7 (reference timeseries.py:334–336): warm the cache — here a
        Spark persist of the run's ts_data."""
        self._spark_table("ts_data").persist().count()

    def remove_timeseries(self, df: pd.DataFrame) -> None:
        """Delete by (region, variable, unit, subannual, year) (U2-style;
        reference tests pin deletion by full key)."""
        data = df.copy()
        data.columns = [str(c).lower() for c in data.columns]
        if "subannual" not in data.columns:
            data["subannual"] = "Year"
        if "year" not in data.columns:
            raise ValueError("need a year column")
        cur = self._table("ts_data")
        keys = set(
            map(tuple, data[_TS_KEY].astype({"year": int}).itertuples(index=False))
        )
        mask = cur[_TS_KEY].apply(tuple, axis=1).isin(keys)
        self._set_table("ts_data", cur[~mask])

    # -- geodata (reference timeseries.py:522–585) ------------------------
    def add_geodata(self, df: pd.DataFrame) -> None:
        data = df.copy()
        data.columns = [str(c).lower() for c in data.columns]
        if "subannual" not in data.columns:
            data["subannual"] = "Year"
        new = data[["region", "variable", "unit", "subannual", "year", "value"]].copy()
        new["value"] = new["value"].astype(str)
        new["year"] = new["year"].astype(int)
        new.insert(0, "run_id", self.run_id)
        new["meta"] = data["meta"].astype(bool) if "meta" in data else False
        cur = self._table("geo_data")
        merged = pd.concat([cur, new], ignore_index=True).drop_duplicates(
            subset=_TS_KEY, keep="last"
        )
        self._set_table("geo_data", merged)

    def get_geodata(self) -> pd.DataFrame:
        out = self._table("geo_data").drop(columns=["run_id"])
        out.insert(0, "model", self.model)
        out.insert(1, "scenario", self.scenario)
        return out.reset_index(drop=True)

    def remove_geodata(self, df: pd.DataFrame) -> None:
        data = df.copy()
        data.columns = [str(c).lower() for c in data.columns]
        if "subannual" not in data.columns:
            data["subannual"] = "Year"
        cur = self._table("geo_data")
        keys = set(
            map(tuple, data[_TS_KEY].astype({"year": int}).itertuples(index=False))
        )
        mask = cur[_TS_KEY].apply(tuple, axis=1).isin(keys)
        self._set_table("geo_data", cur[~mask])


def _is_int(v) -> bool:
    try:
        int(v)
        return True
    except (TypeError, ValueError):
        return False
