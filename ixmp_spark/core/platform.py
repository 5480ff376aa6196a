"""Platform: one warehouse connection + platform-wide codelists.

Reference: ixmp/core/platform.py:25 (units, regions + synonyms,
timeslices, model/scenario registries, meta, docs — SURVEY.md §1.4).
Codelists are catalog-resident (they are tiny and broadcast into every
query); fact data lives in per-run parquet read by Spark.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ixmp_spark.sources.warehouse import LocalWarehouse

class Platform:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.wh = LocalWarehouse(root)

    # -- units (doc/data-model.rst:77–84) ---------------------------------
    def add_unit(self, unit: str, comment: str | None = None) -> None:
        self.wh.update_catalog(
            lambda c: c["units"].append(unit) if unit not in c["units"] else None
        )

    def units(self) -> list[str]:
        return list(self.wh.catalog()["units"])

    # -- regions: forest + synonym map (doc/data-model.rst:104–113) -------
    def add_region(
        self, region: str, hierarchy: str = "common", parent: str | None = None
    ) -> None:
        def add(c):
            c["regions"][region] = {"hierarchy": hierarchy, "parent": parent}

        self.wh.update_catalog(add)

    def add_region_synonym(self, synonym: str, mapped_to: str) -> None:
        if mapped_to not in self.wh.catalog()["regions"]:
            raise ValueError(f"unknown region {mapped_to!r}")
        self.wh.update_catalog(
            lambda c: c["region_synonyms"].__setitem__(synonym, mapped_to)
        )

    def regions(self) -> pd.DataFrame:
        cat = self.wh.catalog()
        rows = [
            {"region": r, "mapped_to": None, **attrs}
            for r, attrs in cat["regions"].items()
        ] + [
            {
                "region": syn,
                "mapped_to": tgt,
                "hierarchy": cat["regions"][tgt]["hierarchy"],
                "parent": cat["regions"][tgt]["parent"],
            }
            for syn, tgt in cat["region_synonyms"].items()
        ]
        return pd.DataFrame(
            rows, columns=["region", "mapped_to", "hierarchy", "parent"]
        )

    def resolve_region(self, region: str) -> str:
        """Synonym resolution on write (J6, reference platform.py:335–349)."""
        return self.wh.catalog()["region_synonyms"].get(region, region)

    # -- timeslices (doc/data-model.rst:115–131) --------------------------
    def add_timeslice(self, name: str, category: str, duration: float) -> None:
        def add(c):
            existing = c["timeslices"].get(name)
            if existing and existing["duration"] != duration:
                raise ValueError(
                    f"timeslice {name!r} exists with duration {existing['duration']}"
                )
            c["timeslices"][name] = {"category": category, "duration": duration}

        self.wh.update_catalog(add)

    def timeslices(self) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {"name": n, **v}
                for n, v in self.wh.catalog()["timeslices"].items()
            ],
            columns=["name", "category", "duration"],
        )

    # -- model/scenario name registries (reference backend/base.py:301–338:
    #    names exist independently of runs and are auto-extended when a
    #    run is created — new_run already appends to both lists) ----------
    def add_model_name(self, name: str) -> None:
        """Register a model name with no run attached (reference
        Platform.add_model_name → Backend.add_model_name)."""
        self.wh.update_catalog(
            lambda c: c["models"].append(name)
            if name not in c["models"] else None
        )

    def add_scenario_name(self, name: str) -> None:
        """Register a scenario name with no run attached (reference
        Platform.add_scenario_name → Backend.add_scenario_name)."""
        self.wh.update_catalog(
            lambda c: c["scenarios"].append(name)
            if name not in c["scenarios"] else None
        )

    def get_model_names(self) -> list[str]:
        """All model names — registered explicitly or via run creation —
        sorted (reference Backend.get_model_names). Unioned with the run
        table defensively so pre-registry warehouses stay complete."""
        cat = self.wh.catalog()
        return sorted(
            set(cat["models"]) | {r["model"] for r in cat["runs"].values()}
        )

    def get_scenario_names(self) -> list[str]:
        """All scenario names, sorted (reference
        Backend.get_scenario_names)."""
        cat = self.wh.catalog()
        return sorted(
            set(cat["scenarios"])
            | {r["scenario"] for r in cat["runs"].values()}
        )

    # -- run registry (F6/A4; reference base.py:341–379) ------------------
    def scenario_list(
        self,
        model: str | None = None,
        scenario: str | None = None,
        default: bool = True,
    ) -> pd.DataFrame:
        rows = []
        for rid, r in self.wh.catalog()["runs"].items():
            if model and r["model"] != model:
                continue
            if scenario and r["scenario"] != scenario:
                continue
            if default and not r["is_default"]:
                continue
            rows.append({"run_id": int(rid), **r})
        cols = [
            "run_id", "model", "scenario", "version", "scheme", "is_default",
            "commit", "annotation", "cre_user", "cre_date", "upd_user",
            "upd_date", "locked",
        ]
        return pd.DataFrame(rows, columns=cols).sort_values(
            ["model", "scenario", "version"], ignore_index=True
        )

    def runs_df(self) -> DataFrame:
        """The runs dimension table as a Spark parquet scan (W5 fix:
        run metadata is a real table, not a driver JSON loop — filters on
        model/scenario/is_default push down to the scan)."""
        return self.spark.read.parquet(self.wh.runs_path)

    def meta_df(self) -> DataFrame:
        """Meta entries as a Spark parquet scan (values JSON-encoded in
        ``value_json``; use get_meta for typed driver-side access)."""
        return self.spark.read.parquet(self.wh.meta_path)

    # -- meta: 4 target levels + non-strict cascade (base.py:1116–1220) ---
    def set_meta(
        self,
        name: str,
        value: Any,
        model: str | None = None,
        scenario: str | None = None,
        version: int | None = None,
    ) -> None:
        if version is not None and (model is None or scenario is None):
            raise ValueError("version-level meta needs model and scenario")

        def upsert(c):
            c["meta"] = [
                m
                for m in c["meta"]
                if not (
                    m["name"] == name
                    and m["model"] == model
                    and m["scenario"] == scenario
                    and m["version"] == version
                )
            ]
            c["meta"].append(
                {
                    "name": name,
                    "value": value,
                    "model": model,
                    "scenario": scenario,
                    "version": version,
                }
            )

        self.wh.update_catalog(upsert)

    def get_meta(
        self,
        model: str | None = None,
        scenario: str | None = None,
        version: int | None = None,
        strict: bool = False,
    ) -> dict[str, Any]:
        """strict: only the exact target; non-strict: cascade from less
        specific targets, more specific wins (J8)."""
        out: dict[str, Any] = {}
        entries = self.wh.catalog()["meta"]
        if strict:
            for m in entries:
                if (m["model"], m["scenario"], m["version"]) == (
                    model, scenario, version,
                ):
                    out[m["name"]] = m["value"]
            return out
        # specificity order: (model) < (scenario) < (model, scenario)
        # < (model, scenario, version)
        levels = [
            (model, None, None),
            (None, scenario, None),
            (model, scenario, None),
            (model, scenario, version),
        ]
        for tgt in levels:
            for m in entries:
                if (m["model"], m["scenario"], m["version"]) == tgt:
                    out[m["name"]] = m["value"]
        return out

    def search_meta(
        self, name_pattern: str | None = None, value_pattern: str | None = None
    ) -> pd.DataFrame:
        """Regexp search across all meta entries (F10-style match on the
        key/value space — extension over the reference's exact-target
        reads). Runs as a Spark scan over the meta parquet mirror with
        JVM-side ``rlike`` — at scale the regexps evaluate in the scan,
        nothing driver-side but the (matched) result."""
        import json as _json

        from pyspark.sql import functions as F

        sdf = self.meta_df()
        if name_pattern:
            sdf = sdf.where(F.col("name").rlike(name_pattern))
        if value_pattern:
            # match against the unquoted value rendering (str(value)),
            # same contract as the driver-side loop this replaces
            rendered = F.when(
                F.col("value_json").startswith('"'),
                F.regexp_replace(
                    F.regexp_extract("value_json", r'^"(.*)"$', 1), r'\\"', '"'
                ),
            ).otherwise(F.col("value_json"))
            sdf = sdf.where(rendered.rlike(value_pattern))
        pdf = sdf.toPandas()
        pdf["value"] = pdf["value_json"].map(_json.loads)
        out = pdf[["name", "value", "model", "scenario", "version"]].copy()
        # null targets render as None (driver contract), not NaN
        for c in ("model", "scenario", "version"):
            out[c] = out[c].astype(object).where(out[c].notna(), None)
        return out

    def remove_meta(
        self,
        names: list[str],
        model: str | None = None,
        scenario: str | None = None,
        version: int | None = None,
    ) -> None:
        def rm(c):
            c["meta"] = [
                m
                for m in c["meta"]
                if not (
                    m["name"] in names
                    and m["model"] == model
                    and m["scenario"] == scenario
                    and m["version"] == version
                )
            ]

        self.wh.update_catalog(rm)

    # -- connection-lifecycle compat (reference Platform delegates
    #    open_db/close_db to the JDBC backend; the parquet warehouse has
    #    no connection to manage, so these are documented no-ops kept so
    #    reference-written scripts run unchanged) -----------------------
    def open_db(self) -> None:
        """No-op (JDBC-backend compat): the warehouse is connectionless."""

    def close_db(self) -> None:
        """No-op (JDBC-backend compat): nothing to release."""

    # -- logging / export / access façades (reference platform.py:118–425)
    def set_log_level(self, level) -> None:
        """Reference platform.py:118–147: set the package log level (and
        mirror it onto the Spark context where the names map)."""
        import logging

        logging.getLogger("ixmp_spark").setLevel(level)
        name = (
            level if isinstance(level, str)
            else logging.getLevelName(level)
        )
        if name in ("DEBUG", "INFO", "WARN", "WARNING", "ERROR"):
            self.spark.sparkContext.setLogLevel(
                "WARN" if name == "WARNING" else name
            )

    def get_log_level(self) -> str:
        import logging

        return logging.getLevelName(
            logging.getLogger("ixmp_spark").getEffectiveLevel()
        )

    def export_timeseries_data(self, path, **kwargs) -> None:
        """S6 façade (reference platform.py:197–260): filtered bulk TS
        CSV export across runs — see sources/ts_io.py."""
        from ixmp_spark.sources.ts_io import export_timeseries_data

        export_timeseries_data(self, str(path), **kwargs)

    def check_access(self, user: str, models, access: str = "view"):
        """Reference platform.py:399–425: per-model access check. The
        local warehouse is single-tenant, so access derives from an
        optional ``acl`` docs domain ({model: comma-joined users per
        access level via doc key '<model>:<access>'}); with no ACL entry
        the platform is open (True). Returns bool for a str `models`,
        dict[model, bool] for a list."""
        from ixmp_spark.core.utils import as_str_list

        models_list = as_str_list(models)
        if not models_list:
            raise ValueError("must supply at least 1 model name")
        acl = self.wh.catalog()["docs"].get("acl", {})

        def allowed(model: str) -> bool:
            entry = acl.get(f"{model}:{access}")
            if entry is None:
                return True  # open platform: no ACL configured
            return user in [u.strip() for u in entry.split(",")]

        result = {m: allowed(m) for m in models_list}
        return result[models] if isinstance(models, str) else result

    def grant_access(self, user: str, model: str, access: str = "view") -> None:
        """Register `user` in the ACL for (`model`, `access`) — once any
        entry exists for that pair, access is restricted to listed users."""
        cur = self.wh.catalog()["docs"].get("acl", {}).get(f"{model}:{access}")
        users = [u.strip() for u in cur.split(",")] if cur else []
        if user not in users:
            users.append(user)
        self.set_doc("acl", f"{model}:{access}", ",".join(users))

    # -- docs (doc/data-model.rst:172–190) --------------------------------
    def set_doc(self, domain: str, name: str, doc: str) -> None:
        self.wh.update_catalog(
            lambda c: c["docs"].setdefault(domain, {}).__setitem__(name, doc)
        )

    def get_doc(self, domain: str, name: str | None = None):
        docs = self.wh.catalog()["docs"].get(domain, {})
        return docs if name is None else docs.get(name)
