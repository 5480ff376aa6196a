"""Scenario: TimeSeries + GAMS-style model data (sets/pars/vars/equs).

Reference: ixmp/core/scenario.py:44. Items have dynamic, per-scenario
schemas declared at init_item (SURVEY.md §1.2): 0+ dimensions, each
indexed by a simple set, optional distinct dim names. Storage is the
long-format fact tables of SURVEY.md §1.6 (``key array<string>``); the
named-column views pivot ``element_at(key, i)`` back into idx_name
columns per item.

Contract highlights mirrored from the reference:
- item names unique across all four types (doc/data-model.rst:248);
- all keys are strings; filters coerce + silently ignore non-members
  (base.py:1001–1005) — read-side permissive;
- writes are strict: every key must be a member of its index set
  (base.py:1070–1074) — write-side validation (J3);
- scalars (0-d par/var/equ) return dicts (base.py:1007–1018).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ixmp_spark.core.timeseries import TimeSeries
from ixmp_spark.operators.filtering import in_list_filter

_IX_TYPES = ("set", "par", "var", "equ")


def _sql_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _sql_not_in(col: str, values, cast: bool = False) -> str:
    """``col NOT IN ('v1', …)`` as SQL text — parsed JVM-side in one
    py4j round-trip instead of building one Literal object per member
    (the Column.isin path), which dominates driver time for
    codelist-sized sets. Empty ``values`` ⇒ TRUE (no member is valid),
    matching ``~isin([])``."""
    vals = ", ".join(f"'{_sql_escape(str(v))}'" for v in values)
    if not vals:
        return "TRUE"
    ident = "`" + col.replace("`", "``") + "`"
    if cast:
        ident = f"CAST({ident} AS STRING)"
    return f"{ident} NOT IN ({vals})"


def _as_str_list(v) -> list[str]:
    """C1 (reference util/__init__.py:86–110): scalar/list → list[str]."""
    if v is None:
        return []
    if isinstance(v, (str, int, float)):
        return [str(v)]
    return [str(x) for x in v]


class Scenario(TimeSeries):
    def __init__(self, platform, model, scenario, version=None, scheme=None,
                 annotation=None):
        super().__init__(
            platform, model, scenario, version=version, scheme=scheme,
            annotation=annotation,
        )
        self.scheme = scheme

    # -- item registry ----------------------------------------------------
    def _items(self) -> dict:
        if self._checked_out:
            return self._staged_items
        return self.platform.wh.read_items(self.run_id)

    def init_item(
        self,
        ix_type: str,
        name: str,
        idx_sets: Sequence[str] | None = None,
        idx_names: Sequence[str] | None = None,
    ) -> None:
        """Declare an item (reference scenario.py:562–608,
        base.py:908–936). idx_names defaults to idx_sets; arity must
        match; referenced index sets must exist."""
        if ix_type not in _IX_TYPES:
            raise ValueError(f"ix_type must be one of {_IX_TYPES}")
        items = self._items()
        if name in items:
            raise ValueError(f"item {name!r} already exists")
        idx_sets = list(idx_sets or [])
        idx_names = list(idx_names or idx_sets)
        if len(idx_names) != len(idx_sets):
            raise ValueError("idx_names must match idx_sets in length")
        for s in idx_sets:
            if s not in items or items[s]["ix_type"] != "set":
                raise ValueError(f"unknown index set {s!r}")
            if items[s]["idx_sets"]:
                raise ValueError(f"{s!r} is not a simple (index) set")
        items[name] = {"ix_type": ix_type, "idx_sets": idx_sets, "idx_names": idx_names}

    def init_set(self, name, idx_sets=None, idx_names=None):
        self.init_item("set", name, idx_sets, idx_names)

    def init_par(self, name, idx_sets=None, idx_names=None):
        self.init_item("par", name, idx_sets, idx_names)

    def init_var(self, name, idx_sets=None, idx_names=None):
        self.init_item("var", name, idx_sets, idx_names)

    def init_equ(self, name, idx_sets=None, idx_names=None):
        self.init_item("equ", name, idx_sets, idx_names)

    def init_scalar(self, name, val: float, unit: str, comment=None):
        self.init_par(name)
        self.change_scalar(name, val, unit, comment)

    def items(
        self, ix_type=None, indexed_by: str | None = None
    ) -> list[str]:
        """Sorted item names (O1), optionally of one type / indexed by a
        given set (F8, reference scenario.py:391–435). ``ix_type`` takes
        the lowercase string or an :class:`ItemType` flag combination
        (reference backend/common.py:59)."""
        from ixmp_spark.core.itemtype import ItemType

        if isinstance(ix_type, ItemType):
            allowed = set(ix_type.ix_types())
        elif ix_type:
            allowed = {ix_type}
        else:
            allowed = None
        out = []
        for name, it in self._items().items():
            if allowed is not None and it["ix_type"] not in allowed:
                continue
            if indexed_by and indexed_by not in it["idx_sets"]:
                continue
            out.append(name)
        return sorted(out)

    def has_item(self, name: str, ix_type: str | None = None) -> bool:
        it = self._items().get(name)
        return it is not None and (ix_type is None or it["ix_type"] == ix_type)

    has_set = lambda self, name: self.has_item(name, "set")  # noqa: E731
    has_par = lambda self, name: self.has_item(name, "par")  # noqa: E731
    has_var = lambda self, name: self.has_item(name, "var")  # noqa: E731
    has_equ = lambda self, name: self.has_item(name, "equ")  # noqa: E731

    def idx_sets(self, name: str) -> list[str]:
        return list(self._require_item(name)["idx_sets"])

    def idx_names(self, name: str) -> list[str]:
        return list(self._require_item(name)["idx_names"])

    def _require_item(self, name: str, ix_type: str | None = None) -> dict:
        it = self._items().get(name)
        if it is None:
            raise KeyError(f"no item {name!r}")
        if ix_type and it["ix_type"] != ix_type:
            raise ValueError(f"{name!r} is a {it['ix_type']}, not {ix_type}")
        return it

    # -- writes -----------------------------------------------------------
    def _set_members(self, set_name: str) -> set[str]:
        t = self._table("set_data")
        rows = t[(t["run_id"] == self.run_id) & (t["name"] == set_name)]
        return {k[0] for k in rows["key"]}

    def _validate_keys(self, item: dict, keys: list[list[str]], name: str) -> None:
        """J3 write-side strict membership (base.py:1070–1074)."""
        for dim, set_name in enumerate(item["idx_sets"]):
            members = self._set_members(set_name)
            for key in keys:
                if key[dim] not in members:
                    raise ValueError(
                        f"invalid key {key[dim]!r} for dimension "
                        f"{item['idx_names'][dim]!r} of {name!r}: not in set "
                        f"{set_name!r}"
                    )

    def _coerce_keys(
        self, item: dict, key_or_keys, name: str, arity: int | None = None
    ) -> list[list[str]]:
        # simple sets have no idx_sets but their elements are 1-tuples
        if arity is None:
            arity = len(item["idx_sets"]) or (
                1 if item["ix_type"] == "set" else 0
            )
        if key_or_keys is None:
            if arity:
                raise ValueError(f"{name!r} has {arity} dimensions; key required")
            return [[]]
        if isinstance(key_or_keys, pd.DataFrame):
            cols = [c for c in item["idx_names"] if c in key_or_keys.columns]
            if len(cols) != arity:
                raise ValueError(f"need columns {item['idx_names']}")
            return key_or_keys[cols].astype(str).values.tolist()
        if isinstance(key_or_keys, str):
            if arity != 1:
                raise ValueError(f"{name!r} has {arity} dimensions")
            return [[key_or_keys]]
        seq = list(key_or_keys)
        if not seq:
            return []
        if all(isinstance(k, (list, tuple)) for k in seq):
            out = [_as_str_list(k) for k in seq]
        elif arity == 1:
            out = [[str(k)] for k in seq]
        else:
            out = [_as_str_list(seq)]
        for k in out:
            if len(k) != arity:
                raise ValueError(
                    f"key {k} has arity {len(k)}; {name!r} needs {arity}"
                )
        return out

    def add_set(self, name: str, key, comment: str | None = None) -> None:
        """U1: append elements; idempotent on duplicates; arity-validated;
        indexed-set keys must be members of their index sets."""
        item = self._require_item(name, "set")
        keys = self._coerce_keys(item, key, name)
        if item["idx_sets"]:
            self._validate_keys(item, keys, name)
        cur = self._table("set_data")
        new = pd.DataFrame(
            {
                "run_id": self.run_id,
                "name": name,
                "key": [list(k) for k in keys],
                "comment": comment,
            }
        )
        merged = pd.concat([cur, new], ignore_index=True)
        merged["__k"] = merged["key"].map(tuple)
        merged = merged.drop_duplicates(subset=["run_id", "name", "__k"]).drop(
            columns="__k"
        )
        self._set_table("set_data", merged)

    def add_par(self, name: str, key_or_data=None, value=None, unit=None,
                comment=None) -> None:
        """Add/overwrite parameter elements; accepts a DataFrame with
        idx_name columns + value + unit, or key(s) + scalar value."""
        item = self._require_item(name, "par")
        if isinstance(key_or_data, pd.DataFrame):
            df = key_or_data
            keys = self._coerce_keys(item, df, name)
            values = df["value"].astype(float).tolist()
            units = (
                df["unit"].astype(str).tolist()
                if "unit" in df
                else [unit or ""] * len(keys)
            )
        else:
            keys = self._coerce_keys(item, key_or_data, name)
            if len(keys) == 1:
                values = [float(value)]
                units = [str(unit or "")]
            else:
                values = [float(v) for v in (value if isinstance(value, (list, tuple)) else [value] * len(keys))]
                units = (
                    [str(u) for u in unit]
                    if isinstance(unit, (list, tuple))
                    else [str(unit or "")] * len(keys)
                )
        self._validate_keys(item, keys, name)
        known_units = set(self.platform.units())
        bad = set(units) - known_units
        if bad:
            raise ValueError(f"unknown units {sorted(bad)}; add_unit first")
        cur = self._table("par_data")
        new = pd.DataFrame(
            {
                "run_id": self.run_id,
                "name": name,
                "key": [list(k) for k in keys],
                "value": values,
                "unit": units,
            }
        )
        merged = pd.concat([cur, new], ignore_index=True)
        merged["__k"] = merged["key"].map(tuple)
        merged = merged.drop_duplicates(
            subset=["run_id", "name", "__k"], keep="last"
        ).drop(columns="__k")
        self._set_table("par_data", merged)

    #: rows above which bulk ingest stays distributed end-to-end
    BULK_DISTRIBUTED_THRESHOLD = 2_000_000

    def add_par_bulk(
        self,
        name: str,
        sdf: DataFrame,
        unit: str | None = None,
        assume_unique: bool = False,
        distributed: bool | None = None,
    ) -> None:
        """Spark-native bulk parameter ingest — the scale path for the
        reference's ``add_par`` benchmark shape (test_perf.py:27–35,
        1e2–1e6-row random 2-D parameters).

        Validation stays distributed AND single-pass: index sets and the
        unit codelist are codelist-sized by design (SURVEY.md §1.4), so
        membership compiles to one ``isin``-literal filter over the input
        — one job collects up to 5 violations across all dimensions at
        once (J3), instead of one broadcast anti-join job per dimension.
        The key array is assembled JVM-side (C7).

        ``assume_unique=True`` skips the key-dedup shuffle when the caller
        guarantees distinct key tuples (e.g. a cross-product generator or
        an upstream dropDuplicates).
        """
        item = self._require_item(name, "par")
        dims = item["idx_names"]
        cols = set(sdf.columns)
        missing = [d for d in dims if d not in cols]
        if missing:
            raise ValueError(f"missing dimension columns {missing}")
        if "unit" not in cols:
            if unit is None:
                raise ValueError("need a unit column or unit= argument")
            sdf = sdf.withColumn("unit", F.lit(str(unit)))
        # membership validation: literal IN-set for codelist-sized sets
        # (single pass, no join); broadcast anti-join for large sets
        # (a 100k-member IN literal would blow up the expression tree).
        # The predicate is built as ONE SQL string parsed JVM-side:
        # Column.isin(members) constructs thousands of Literal objects
        # through py4j — measured ~1.6 s of pure driver time per call at
        # 1000 members/dim, vs ~2 ms for the parser. Catalyst converts
        # either form to the same InSet plan.
        LITERAL_MAX = 10_000
        parts = [_sql_not_in("unit", self.platform.units())]
        large_dims: list[tuple[str, str, set]] = []
        for dim, set_name in zip(dims, item["idx_sets"]):
            members = self._set_members(set_name)
            if len(members) <= LITERAL_MAX:
                parts.append(_sql_not_in(dim, sorted(members), cast=True))
            else:
                large_dims.append((dim, set_name, members))
        bad_pred = F.expr(" OR ".join(parts))
        # ONE pass computes the row count (the merge-strategy input) AND
        # the violation count; the 5-example probe job runs only on the
        # error path. (Separately counting then validating would be two
        # full scans of the input.)
        stats_row = sdf.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.when(bad_pred, 1).otherwise(0)).alias("__bad"),
        ).collect()[0]
        n_rows = stats_row["__n"]
        if stats_row["__bad"]:
            violations = sdf.where(bad_pred).limit(5).collect()
            raise ValueError(
                f"invalid rows for {name!r} (key not in set / unknown units): "
                f"{[r.asDict() for r in violations]}"
            )
        for dim, set_name, members in large_dims:
            mdf = self.platform.spark.createDataFrame(
                [(m,) for m in members], f"`{dim}` string"
            )
            bad = (
                sdf.select(F.col(dim).cast("string").alias(dim))
                .join(F.broadcast(mdf), dim, "left_anti")
                .limit(5)
                .collect()
            )
            if bad:
                raise ValueError(
                    f"invalid keys {[r[dim] for r in bad]} for dimension "
                    f"{dim!r} of {name!r}: not in set {set_name!r}"
                )
        out = sdf.select(
            F.lit(self.run_id).cast("long").alias("run_id"),
            F.lit(name).alias("name"),
            F.array(*[F.col(d).cast("string") for d in dims]).alias("key"),
            F.col("value").cast("double").alias("value"),
            F.col("unit").cast("string").alias("unit"),
        )
        if not assume_unique:
            out = out.dropDuplicates(["key"])  # key dedup stays distributed
        # Merge strategy is size-aware: up to BULK_DISTRIBUTED_THRESHOLD
        # rows the frame collects through Arrow and commits via the
        # single-file pyarrow writer (measurably faster than a Spark
        # parquet job on driver-manageable data); above it — or with
        # distributed=True — everything stays Spark-side: per-key
        # overwrite as a left-anti join + union, distributed directory
        # write in the commit (Delta MERGE on a cluster). n_rows comes
        # free from the validation pass (pre-dedup: an upper bound, which
        # is the conservative direction for choosing the distributed path).
        if distributed is None:
            distributed = n_rows > self.BULK_DISTRIBUTED_THRESHOLD
        if distributed:
            cur = self._spark_table("par_data")
            item_has_rows = (
                cur.where(F.col("name") == name).limit(1).count() > 0
            )
            if item_has_rows:
                merged = out.unionByName(
                    cur.join(
                        out.select("name", "key"),
                        on=["name", "key"],
                        how="left_anti",
                    )
                )
            else:
                merged = out.unionByName(cur)
            self._set_table("par_data", merged)
            return
        import pyarrow as pa

        from ixmp_spark.sources.warehouse import SCHEMAS

        # Arrow-native collect (r14, guide §5/§6): toArrow() skips the
        # object-array pandas conversion of the key column (measured
        # 0.95 s → 0.16 s at 1e6 rows). The overwrite-merge path (item
        # already has rows) still needs pandas tuple-dedup and converts
        # once; the common append path stays Arrow end to end — the
        # staged table writes via pq.write_table without a round-trip.
        new_tbl = out.toArrow().cast(SCHEMAS["par_data"])
        cur_pd = self._table("par_data")
        has_existing = bool(
            ((cur_pd["run_id"] == self.run_id) & (cur_pd["name"] == name)).any()
        )
        if has_existing:
            merged_pd = pd.concat(
                [cur_pd, new_tbl.to_pandas()], ignore_index=True
            )
            merged_pd["__k"] = merged_pd["key"].map(tuple)
            merged_pd = merged_pd.drop_duplicates(
                subset=["run_id", "name", "__k"], keep="last"
            ).drop(columns="__k")
            self._set_table("par_data", merged_pd)
            return
        cur_tbl = pa.Table.from_pandas(
            cur_pd.reset_index(drop=True),
            schema=SCHEMAS["par_data"],
            preserve_index=False,
        )
        self._set_table(
            "par_data", pa.concat_tables([cur_tbl, new_tbl])
        )

    def add_scalar(self, name: str, val: float, unit: str, comment=None) -> None:
        self.add_par(name, None, val, unit, comment)
        self._note_scalar_change(name, val, unit, comment)

    def change_scalar(self, name: str, val: float, unit: str, comment=None) -> None:
        """Reference scenario.py change_scalar: overwrite a 0-d parameter;
        the change is recorded in a per-scenario audit trail (platform
        meta) so provenance survives commits."""
        self.add_par(name, None, val, unit, comment)
        self._note_scalar_change(name, val, unit, comment)

    def _note_scalar_change(self, name, val, unit, comment) -> None:
        # Audit trail lives in the docs store (domain 'scalar_audit'),
        # keyed by run identity. Entries STAGE with the checkout and
        # flush only in _post_commit, so provenance records exactly the
        # committed state (a rolled-back transaction leaves no trace).
        entry = {"value": float(val), "unit": str(unit)}
        if comment:
            entry["comment"] = str(comment)
        if not hasattr(self, "_staged_scalar_audit"):
            self._staged_scalar_audit = []
        self._staged_scalar_audit.append((name, entry))

    def _post_commit(self) -> None:
        import json as _json

        for name, entry in getattr(self, "_staged_scalar_audit", []):
            key = f"{self.model}/{self.scenario}/{self.version}/{name}"
            raw = self.platform.get_doc("scalar_audit", key)
            trail = _json.loads(raw) if raw else []
            trail.append(entry)
            self.platform.set_doc("scalar_audit", key, _json.dumps(trail))
        self._staged_scalar_audit = []

    def _discard_staged_extras(self) -> None:
        self._staged_scalar_audit = []

    # -- category mapping sets (U5; reference base.py:1232–1288, ---------
    #    jdbc.py:1425–1439; exposed on Scenario as in message_ix)
    def add_cat(self, name: str, cat: str, keys, is_unique: bool = False) -> None:
        """``cat_set_elements``: map elements of simple set `name` into
        category `cat`. Keys must be members of `name`; with
        ``is_unique=True`` exactly one key is allowed and any existing
        members of `cat` are replaced (the reference's singleton contract,
        e.g. the ``firstmodelyear`` category)."""
        self._require_item(name, "set")
        key_list = _as_str_list(keys)
        if is_unique and len(key_list) != 1:
            raise ValueError(
                f"is_unique=True requires exactly one key; got {key_list}"
            )
        members = self._set_members(name)
        bad = sorted(set(key_list) - members)
        if bad:
            raise ValueError(
                f"invalid keys {bad} for category {cat!r}: not in set {name!r}"
            )
        cur = self._table("cat_data")
        if is_unique:
            cur = cur[
                ~(
                    (cur["run_id"] == self.run_id)
                    & (cur["name"] == name)
                    & (cur["cat"] == cat)
                )
            ]
        new = pd.DataFrame(
            {"run_id": self.run_id, "name": name, "cat": cat, "key": key_list}
        )
        merged = pd.concat([cur, new], ignore_index=True).drop_duplicates(
            subset=["run_id", "name", "cat", "key"]
        )
        self._set_table("cat_data", merged)

    def cat(self, name: str, cat: str) -> list[str]:
        """``cat_get_elements``: members of category `cat` in mapping
        `name` (insertion order, as the reference returns them)."""
        self._require_item(name, "set")
        t = self._table("cat_data")
        rows = t[
            (t["run_id"] == self.run_id) & (t["name"] == name) & (t["cat"] == cat)
        ]
        return rows["key"].tolist()

    def cat_list(self, name: str) -> list[str]:
        """``cat_list``: all categories defined over set `name`."""
        self._require_item(name, "set")
        t = self._table("cat_data")
        rows = t[(t["run_id"] == self.run_id) & (t["name"] == name)]
        return sorted(rows["cat"].unique().tolist())

    def cat_spark(self, name: str) -> DataFrame:
        """The category mapping as a Spark frame (cat, key) — the
        broadcast side of J5-style (dis)aggregation joins."""
        self._require_item(name, "set")
        return (
            self._spark_table("cat_data")
            .where((F.col("run_id") == self.run_id) & (F.col("name") == name))
            .select("cat", "key")
        )

    def remove_set(self, name: str, key=None) -> None:
        """U2: drop the whole set, or listed elements. Whole-set removal
        also drops any category mappings defined over it."""
        whole = key is None
        self._remove_elements("set_data", "set", name, key)
        if whole:
            c = self._table("cat_data")
            self._set_table(
                "cat_data",
                c[~((c["run_id"] == self.run_id) & (c["name"] == name))],
            )

    def remove_par(self, name: str, key=None) -> None:
        self._remove_elements("par_data", "par", name, key)

    def _remove_elements(self, table: str, ix_type: str, name: str, key) -> None:
        item = self._require_item(name, ix_type)
        cur = self._table(table)
        if key is None:
            out = cur[~((cur["run_id"] == self.run_id) & (cur["name"] == name))]
            del self._items()[name]  # whole-item removal drops the registry entry
        else:
            keys = {tuple(k) for k in self._coerce_keys(item, key, name)}
            mask = (
                (cur["run_id"] == self.run_id)
                & (cur["name"] == name)
                & cur["key"].map(lambda k: tuple(k) in keys)
            )
            out = cur[~mask]
        self._set_table(table, out)

    # -- reads (F1–F4) ----------------------------------------------------
    def _named_view(self, table: str, item: dict, name: str) -> DataFrame:
        """Pivot ``key array<string>`` into idx_name columns — the dynamic
        per-item view of SURVEY.md §1.6."""
        sdf = self._spark_table(table).where(
            (F.col("run_id") == self.run_id) & (F.col("name") == name)
        )
        cols = [
            F.col("key")[i].alias(n) for i, n in enumerate(item["idx_names"])
        ]
        value_cols = {
            "set_data": [],
            "par_data": [F.col("value"), F.col("unit")],
            "sol_data": [F.col("lvl"), F.col("mrg")],
        }[table]
        return sdf.select(*cols, *value_cols)

    def _get_elements(self, ix_type: str, name: str, filters=None):
        item = self._require_item(name, ix_type)
        table = {"set": "set_data", "par": "par_data"}.get(ix_type, "sol_data")
        arity = len(item["idx_sets"])
        if ix_type == "set" and arity == 0:
            # simple set → pd.Series of str (reference base.py:1007–1009)
            return self._simple_set_series(name)
        # 0-d: scalar dict returns (reference base.py:1010–1018)
        if arity == 0:
            pdf = self._table(table)
            row = pdf[(pdf["run_id"] == self.run_id) & (pdf["name"] == name)]
            if len(row) == 0:
                raise KeyError(f"scalar {name!r} has no value")
            r = row.iloc[-1]
            if ix_type == "par":
                return {"value": float(r["value"]), "unit": r["unit"]}
            return {"lvl": float(r["lvl"]), "mrg": float(r["mrg"])}
        view = self._named_view(table, item, name)
        if filters:
            # prune filter keys to actual dims (F9), coerce values to str
            filters = {
                d: _as_str_list(v)
                for d, v in filters.items()
                if d in item["idx_names"]
            }
            view = in_list_filter(view, filters)
        return view.toPandas()

    def _simple_set_series(self, name: str) -> pd.Series:
        t = self._table("set_data")
        rows = t[(t["run_id"] == self.run_id) & (t["name"] == name)]
        return pd.Series([k[0] for k in rows["key"]], dtype=object, name=name)

    def set(self, name: str, filters: Mapping | None = None):
        """Simple sets → pd.Series of str; indexed sets → DataFrame."""
        return self._get_elements("set", name, filters)

    def par(self, name: str, filters: Mapping | None = None):
        return self._get_elements("par", name, filters)

    def var(self, name: str, filters: Mapping | None = None):
        return self._get_elements("var", name, filters)

    def equ(self, name: str, filters: Mapping | None = None):
        return self._get_elements("equ", name, filters)

    def scalar(self, name: str) -> dict:
        return self._get_elements("par", name)

    def par_spark(self, name: str, filters: Mapping | None = None) -> DataFrame:
        """Spark-native read path (no driver materialization): the named
        view with pushdown filters — used by the reporting engine."""
        item = self._require_item(name, "par")
        view = self._named_view("par_data", item, name)
        if filters:
            filters = {
                d: _as_str_list(v) for d, v in filters.items()
                if d in item["idx_names"]
            }
            view = in_list_filter(view, filters)
        return view

    def diff_par(
        self,
        other: "Scenario",
        name: str,
        indicator: str = "_merge",
        sort: bool = True,
    ) -> DataFrame:
        """``ixmp.util.diff`` for ONE parameter across two scenarios
        (J1 at warehouse scale; reference util/__init__.py:136–204):
        full-outer key alignment with ``value``/``unit`` ``_a``/``_b``
        columns and the pandas-style merge indicator.

        The join runs on the RAW ``key`` column — the fact layout's
        bucket key — so when both runs' snapshots were written by the
        bucketed Spark path (bulk ingest, distributed clone) the join
        is co-partitioned at scan time and shuffles NEITHER side
        (pinned by tests/test_warehouse_bucketed.py, which asserts 0
        exchanges). Joining on the exploded dim columns instead would
        hide the bucket distribution from Catalyst and pay the full
        two-sided shuffle the r9 100x smoke measured at 90 s/1e8 rows.
        Dim columns are exploded AFTER the join for presentation.

        ``sort=True`` orders by the dim columns (O2, the reference's
        sorted diff output); pass False when feeding an aggregation —
        the global sort is a range exchange the aggregate would undo.
        """
        from ixmp_spark.operators.joins import diff as _diff

        item = self._require_item(name, "par")
        other._require_item(name, "par")
        dims = item["idx_names"]

        def side(s: "Scenario") -> DataFrame:
            return (
                s._spark_table("par_data")
                .where(
                    (F.col("run_id") == s.run_id) & (F.col("name") == name)
                )
                .select("key", "value", "unit")
            )

        return self._diff_key_join(
            dims, side(self), side(other), indicator, sort
        )

    def diff_par_at(
        self,
        name: str,
        commit_a: int,
        commit_b: int | None = None,
        indicator: str = "_merge",
        sort: bool = True,
    ) -> DataFrame:
        """:meth:`diff_par` through TIME instead of across scenarios:
        align one parameter between this run's state AS OF
        ``commit_a`` and AS OF ``commit_b`` (default: the live
        committed snapshot) — "what did commit N change", the audit
        query Delta time travel answers on a cluster and the
        warehouse's per-commit hardlink snapshots answer here.
        History snapshots carry the bucket layout (the marker
        hardlinks with the files), so this join is exchange-free on
        bucketed runs exactly like the live diff (pinned by
        tests/test_warehouse_bucketed.py)."""
        item = self._require_item(name, "par")
        dims = item["idx_names"]
        wh = self.platform.wh
        spark = self.platform.spark

        def at(commit: int | None) -> DataFrame:
            fact = (
                wh.spark_fact(spark, self.run_id, "par_data")
                if commit is None
                else wh.spark_fact_at(spark, self.run_id, "par_data", commit)
            )
            return fact.where(
                (F.col("run_id") == self.run_id) & (F.col("name") == name)
            ).select("key", "value", "unit")

        return self._diff_key_join(
            dims, at(commit_a), at(commit_b), indicator, sort
        )

    def _diff_key_join(
        self, dims, fa: DataFrame, fb: DataFrame, indicator: str, sort: bool
    ) -> DataFrame:
        from ixmp_spark.operators.joins import diff as _diff

        d = _diff(
            fa, fb, on=["key"], value_cols=["value", "unit"],
            indicator=indicator,
        )
        out = d.select(
            *[F.col("key")[i].alias(n) for i, n in enumerate(dims)],
            "value_a",
            "value_b",
            "unit_a",
            "unit_b",
            indicator,
        )
        return out.orderBy(*dims) if sort else out

    def iter_par_data(self, filters: Mapping | None = None, indexed_by=None):
        """Yield (name, filtered DataFrame) per parameter (reference
        scenario.py:459–473): filters pruned per item to relevant dims."""
        for name in self.items("par", indexed_by=indexed_by):
            item = self._require_item(name)
            if not item["idx_sets"]:
                continue
            rel = (
                {d: v for d, v in (filters or {}).items() if d in item["idx_names"]}
                or None
            )
            if filters and not rel:
                continue
            df = self.par(name, rel)
            if len(df):
                yield name, df

    # -- solution ---------------------------------------------------------
    def add_solution(self, name: str, data: pd.DataFrame | dict, ix_type: str) -> None:
        """Store var/equ levels+marginals (S8 ingest path)."""
        item = self._require_item(name, ix_type)
        cur = self._table("sol_data")
        if isinstance(data, dict):
            new = pd.DataFrame(
                {
                    "run_id": [self.run_id],
                    "name": [name],
                    "ix_type": [ix_type],
                    "key": [[]],
                    "lvl": [float(data["lvl"])],
                    "mrg": [float(data["mrg"])],
                }
            )
        else:
            keys = data[item["idx_names"]].astype(str).values.tolist()
            new = pd.DataFrame(
                {
                    "run_id": self.run_id,
                    "name": name,
                    "ix_type": ix_type,
                    "key": [list(k) for k in keys],
                    "lvl": data["lvl"].astype(float).tolist(),
                    "mrg": data["mrg"].astype(float).tolist(),
                }
            )
        self._set_table("sol_data", pd.concat([cur, new], ignore_index=True))

    def has_solution(self) -> bool:
        if self._checked_out and self._staged is not None:
            sol = self._staged["sol_data"]
            if isinstance(sol, pd.DataFrame):
                return len(sol) > 0
            return sol.limit(1).count() > 0  # Spark-staged (large run)
        return self._has_solution_stored()

    def remove_solution(self, first_model_year: int | None = None) -> None:
        """Drop var/equ data; non-``meta`` timeseries rows from
        first_model_year on are dropped too (reference
        scenario.py:1003–1050, doc/data-model.rst:214–218)."""
        if self._checked_out:
            raise RuntimeError("cannot remove solution while checked out")
        if not self.has_solution():
            raise ValueError("this Scenario does not have a solution")
        self.check_out(timeseries_only=True)
        from ixmp_spark.sources.warehouse import _empty

        self._staged["sol_data"] = _empty("sol_data")
        ts = self._staged["ts_data"]
        if isinstance(ts, pd.DataFrame):
            if first_model_year is not None:
                drop = (~ts["meta"]) & (ts["year"] >= first_model_year)
            else:
                drop = ~ts["meta"]
            self._staged["ts_data"] = ts[~drop]
        else:  # Spark-staged (large run): keep the predicate distributed
            keep = (
                F.col("meta") | (F.col("year") < first_model_year)
                if first_model_year is not None
                else F.col("meta")
            )
            self._staged["ts_data"] = ts.where(keep)
        self.commit(f"remove_solution(first_model_year={first_model_year})")

    # -- workbook I/O (reference scenario.py read_excel/to_excel) ---------
    def to_excel(self, path, items=None, filters=None, max_row=None) -> None:
        """S3 (reference Scenario.to_excel): dump item data to a workbook
        (real .xlsx via the stdlib SpreadsheetML writer; a directory path
        selects the CSV-dir backend). ``filters`` restrict written rows
        per dim (reference cli.py:229–258 export)."""
        from ixmp_spark.sources.scenario_io import EXCEL_MAX_ROWS, write_scenario_data

        write_scenario_data(self, str(path), items=items, filters=filters,
                            max_row=max_row or EXCEL_MAX_ROWS)

    def read_excel(self, path, add_units=False, init_items=False,
                   commit_steps=False) -> None:
        """S4 (reference Scenario.read_excel): two-pass topological load."""
        from ixmp_spark.sources.scenario_io import read_scenario_data

        read_scenario_data(
            self, str(path), add_units=add_units, init_items=init_items,
            commit_steps=commit_steps,
        )

    def load_scenario_data(self) -> None:
        """P7 (reference scenario.py:145–160): bulk-load all item data into
        cache — here persist the run's fact tables."""
        for t in ("set_data", "par_data", "sol_data"):
            self._spark_table(t).persist().count()

    def solve(self, model="function", callback=None, **model_options):
        """Reference Scenario.solve façade over core.model.solve."""
        from ixmp_spark.core.model import solve as _solve

        return _solve(self, model=model, callback=callback, **model_options)

    # -- clone (SURVEY.md §1.5; reference scenario.py:870–945) ------------
    #: committed tables at or above this many rows clone through Spark
    #: (read → stamp run_id → distributed write) instead of staging a
    #: pandas copy on the driver — a TS-heavy run can be arbitrarily
    #: large even though set/par/sol data is model-sized, and clone was
    #: the one remaining path that materialized it (r6 verdict #3)
    CLONE_SPARK_ROWS = 200_000

    def clone(
        self,
        model: str | None = None,
        scenario: str | None = None,
        annotation: str | None = None,
        keep_solution: bool = True,
        shift_first_model_year: int | None = None,
        platform=None,
        spark_threshold: int | None = None,
    ) -> "Scenario":
        """Copy this scenario to a new run (new version under the same or a
        new (model, scenario)). INSERT-SELECT at warehouse level: every
        fact table (ALL of FACT_TABLES — including cat_data, which the
        previous implementation silently dropped) is copied with the new
        run_id; keep_solution=False drops sol_data + non-meta ts rows;
        shift_first_model_year clamps (reference scenario.py:870–945).

        Size-aware like add_par_bulk: per table, a cheap parquet-footer
        row count (no data read) picks the path — model-sized tables
        stage through pandas as before, while any table at or above
        ``spark_threshold`` rows (default :attr:`CLONE_SPARK_ROWS`)
        clones as a Spark plan: read the committed snapshot → replace
        run_id → apply the keep_solution / shift predicates as Spark
        filters → distributed parquet write at commit. The driver never
        holds a row of it, so cloning a 100 TB-scale TS run costs one
        distributed copy, not a driver OOM. Cross-platform clones work
        on both paths (the Spark plan reads from the source warehouse
        and commits into the target's).

        ``shift_first_model_year`` overrides ``keep_solution``: the shift
        only makes sense on a solution-free clone, so passing it with the
        default ``keep_solution=True`` warns and forces it to False
        (reference scenario.py:918–922)."""
        import logging

        from pyspark.sql import DataFrame as SparkDF
        from pyspark.sql import functions as F

        from ixmp_spark.sources.warehouse import FACT_TABLES, _empty

        if shift_first_model_year is not None and keep_solution:
            logging.getLogger(__name__).warning(
                "Override keep_solution=True for shift_first_model_year"
            )
            keep_solution = False

        threshold = (
            self.CLONE_SPARK_ROWS if spark_threshold is None else spark_threshold
        )
        target_mp = platform or self.platform
        new = Scenario(
            target_mp,
            model or self.model,
            scenario or self.scenario,
            version="new",
            scheme=self.scheme,
            annotation=annotation,
        )
        wh = self.platform.wh
        if self._checked_out and self._staged is not None:
            # staged state wins over the committed snapshot; staged Spark
            # bulk frames STAY Spark (they never visit the driver)
            src = {
                t: (v.copy() if isinstance(v, pd.DataFrame) else v)
                for t, v in self._staged.items()
            }
        else:
            src = {
                t: (
                    wh.spark_fact(self.platform.spark, self.run_id, t)
                    if wh.table_num_rows(self.run_id, t) >= threshold
                    else wh.read_table(self.run_id, t)
                )
                for t in FACT_TABLES
            }
        for t, df in src.items():
            if isinstance(df, pd.DataFrame):
                df = df.copy()
                df["run_id"] = new.run_id
            else:
                # withColumn is a narrow transform: carry the bucketed-scan
                # hint across so the clone's rewrite skips the repartition
                # (warehouse._write_bucketed pre_partitioned)
                hint = getattr(df, "_ixmp_bucket_spec", None)
                df = df.withColumn(
                    "run_id", F.lit(int(new.run_id)).cast("long")
                )
                if hint is not None:
                    df._ixmp_bucket_spec = hint
            src[t] = df
        if not keep_solution:
            src["sol_data"] = _empty("sol_data")
            ts = src["ts_data"]
            if isinstance(ts, SparkDF):
                keep = (
                    F.col("meta") | (F.col("year") < shift_first_model_year)
                    if shift_first_model_year is not None
                    else F.col("meta")
                )
                hint = getattr(ts, "_ixmp_bucket_spec", None)
                src["ts_data"] = ts.where(keep)
                if hint is not None:
                    src["ts_data"]._ixmp_bucket_spec = hint
            elif shift_first_model_year is not None:
                src["ts_data"] = ts[
                    ts["meta"] | (ts["year"] < shift_first_model_year)
                ]
            else:
                src["ts_data"] = ts[ts["meta"]]
        new._staged = src
        new._staged_items = dict(
            self._staged_items if self._checked_out else
            self.platform.wh.read_items(self.run_id)
        )
        new.commit(annotation or f"clone of {self.model}/{self.scenario}#{self.version}")
        return new
