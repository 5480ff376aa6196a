"""Reporter: the reference's genno/dask computation graph re-expressed as
a registry of lazy Spark DataFrames.

Reference behavior (SURVEY.md §3.2; ixmp/report/reporter.py:16–100):
- ``from_scenario`` registers every par/var/equ as a quantity
  ``name:dim1-dim2`` plus *all partial sums* over dimension subsets
  (reporter.py:64–69) and every set as labels;
- ``get(key)`` resolves only the requested subgraph (lazy);
- quantities combine by dim alignment: mul/div join on shared dims and
  broadcast over the rest (J7); ``aggregate`` maps labels into named
  groups (A2).

Spark mapping: a quantity is a long DataFrame (dim columns + ``value``)
plus unit metadata carried at the driver (C5/A7: mixed units within one
quantity are rejected at materialization, like operator.py:114–127).
The graph is name → thunk returning a DataFrame; Spark's lazy DAG gives
common-subexpression sharing within one action, and ``persist_key``
pins hot intermediates across actions (SURVEY.md §4 P6).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Key:
    """``name:dim1-dim2`` — a named quantity with an ordered dim set."""

    name: str
    dims: tuple[str, ...] = ()

    @classmethod
    def parse(cls, s: "str | Key") -> "Key":
        if isinstance(s, Key):
            return s
        name, _, dims = s.partition(":")
        return cls(name, tuple(d for d in dims.split("-") if d))

    def __str__(self) -> str:
        return f"{self.name}:{'-'.join(self.dims)}"

    def drop(self, *dims: str) -> "Key":
        return Key(self.name, tuple(d for d in self.dims if d not in dims))


@dataclass
class Quantity:
    """A dimensioned quantity: long DataFrame + unit metadata."""

    df: DataFrame
    dims: tuple[str, ...]
    unit: str | None = None


class Reporter:
    def __init__(self, auto_cse: bool = True):
        self.graph: dict[str, Callable[[], Quantity]] = {}
        self._cache: dict[str, Quantity] = {}
        #: automatic CSE (VERDICT r10 #6, widened r12 per VERDICT r11
        #: #5): the reference's dask graph computes shared keys ONCE
        #: without user action (genno key memoization, reporter.py:16).
        #: EVERY graph-key resolution counts a hit — partial sums reach
        #: their full-dim source through get_quantity, so the r11
        #: partial-sum-only rule is now a special case — and the SECOND
        #: hit pins the key's frame transparently (a mul/add graph
        #: requesting one quantity through two binary ops no longer
        #: recomputes it). ``persist_key`` stays for explicit up-front
        #: pinning. First-request cost is unchanged (nothing persists
        #: until a REUSE proves the key is shared).
        self.auto_cse = auto_cse
        #: graph key str → number of uncached get_quantity resolutions
        self._hits: dict[str, int] = {}
        #: simple-set label lists (reference inserts sets as literal data)
        self.labels: dict[str, list[str]] = {}
        #: name → full-dimensionality Key: partial sums over any dim
        #: subset resolve on demand against this (reference
        #: reporter.py:64–69 enumerates all 2^d subset keys eagerly; we
        #: register one entry and synthesize the sum at get time — a
        #: 10-dim parameter costs one dict entry, not 1,024)
        self.full_keys: dict[str, Key] = {}
        #: default report key (report-config ``default:`` section)
        self.default_key: str | None = None
        #: key → direct dependency keys (for describe())
        self.deps: dict[str, list[str]] = {}
        #: per-Reporter unit replacements (config ``units: replace:``) —
        #: consulted before the module-level UNIT_ALIASES so one
        #: Reporter's config never leaks into another Reporter in the
        #: same process
        self.unit_aliases: dict[str, str] = {}

    # -- registry ---------------------------------------------------------
    def add(
        self,
        key: "str | Key",
        thunk: Callable[[], Quantity],
        deps: "list | None" = None,
    ) -> Key:
        k = Key.parse(key)
        ks = str(k)
        # Redefinition must win over a previously pinned result: evict
        # the auto-CSE cache entry and reset its reuse counter, else a
        # key resolved twice before being redefined (e.g. a ``units:
        # apply`` override in configure()) would keep serving the stale
        # pinned Quantity until release(). The reference dask graph
        # always recomputes from the current graph. Eviction CASCADES
        # through the declared dependency edges (r13 review finding: a
        # pinned DOWNSTREAM key computed from the old definition is
        # just as stale as the key itself); on-demand partial-sum pins
        # (``persist_key('d:i')`` derived from full key ``d:i-j`` via
        # full_keys, never graph-registered) resolve to their
        # full-dimensionality source and are evicted whenever that
        # source is (r13 ADVICE). The precise cascade is only sound
        # when every cached graph key declares its edges — a key
        # registered via bare add() with no ``deps`` may read ANY
        # other key inside its thunk, so if one is cached we fall back
        # to a conservative full-cache flush (graph and deps survive;
        # only pins recompute). The leaf registrars (add_quantity,
        # from_scenario loaders) declare ``deps=[]`` so ordinary
        # reports stay on the precise path.
        if any(
            kc in self.graph and kc not in self.deps and kc != ks
            for kc in self._cache
        ):
            for q in self._cache.values():
                q.df.unpersist()
            self._cache.clear()
            self._hits.clear()
        else:
            stale_set = self._dependents(ks) | {ks}
            pinned_partials = {
                kc
                for kc in self._cache
                if kc not in self.graph and self._root(kc) in stale_set
            }
            for stale_key in stale_set | pinned_partials:
                stale = self._cache.pop(stale_key, None)
                if stale is not None:
                    stale.df.unpersist()
                self._hits.pop(stale_key, None)
        self.graph[ks] = thunk
        if deps is not None:
            self.deps[ks] = [str(Key.parse(d)) for d in deps]
        else:
            # a bare redefinition must not inherit the PREVIOUS
            # definition's edges — future cascades and describe()
            # would adjudicate on a graph that no longer exists
            self.deps.pop(ks, None)
        return k

    def _root(self, ks: str) -> str:
        """A key's data-source root: graph-registered keys are their
        own root; an on-demand partial sum (``d:i`` with no graph
        entry but a full_keys match ``d:i-j``) roots at its
        full-dimensionality source, which is where its data actually
        comes from (get_quantity._sum reads the full key)."""
        if ks in self.graph:
            return ks
        kk = Key.parse(ks)
        fk = self.full_keys.get(kk.name)
        if fk is not None and set(kk.dims) < set(fk.dims):
            return str(fk)
        return ks

    def _dependents(self, ks: str) -> set[str]:
        """Transitive closure of keys whose declared ``deps`` reach
        ``ks`` (reverse edges over self.deps). A deps entry naming a
        partial-sum key (``d:i``) matches when its full-dim root
        (``d:i-j``) is in the frontier — the partial sum is computed
        from the full key, so staleness flows through it."""
        out: set[str] = set()
        frontier = {ks}
        while frontier:
            nxt = {
                key
                for key, dd in self.deps.items()
                if key not in out
                and any(d in frontier or self._root(d) in frontier for d in dd)
            }
            out |= nxt
            frontier = nxt
        return out

    def add_quantity(
        self, key: "str | Key", df: DataFrame, unit: str | None = None
    ) -> Key:
        k = Key.parse(key)
        q = Quantity(df, k.dims, unit)
        self.add(k, lambda: q, deps=[])
        self._register_sums(k)
        return k

    def _register_sums(self, k: Key) -> None:
        """A1 (reference reporter.py:64–69): make sums over every proper
        dim subset resolvable. One registry entry — ``get_quantity``
        synthesizes the groupBy-sum on demand for any subset key."""
        self.full_keys.setdefault(k.name, k)

    def full_key(self, name: str) -> Key:
        """The full-dimensionality key for ``name`` (reference
        Reporter.full_key)."""
        if name not in self.full_keys:
            raise KeyError(f"no quantity named {name!r}")
        return self.full_keys[name]

    def describe(self, key: "str | Key") -> str:
        """genno-style subgraph description: the requested key and its
        dependency tree, one indented line per node (on-demand partial
        sums shown against their full-dimensionality source)."""
        lines: list[str] = []

        def walk(k, depth: int, seen: frozenset):
            kk = Key.parse(k)
            ks = str(kk)
            pad = "  " * depth
            if ks not in self.graph:
                fk = self.full_keys.get(kk.name)
                if fk is not None and set(kk.dims) < set(fk.dims):
                    lines.append(f"{pad}'{ks}' (partial sum)")
                    walk(fk, depth + 1, seen)
                    return
                lines.append(f"{pad}'{ks}' (MISSING)")
                return
            lines.append(f"{pad}'{ks}'")
            if ks in seen:
                return
            for d in self.deps.get(ks, []):
                walk(d, depth + 1, seen | {ks})

        walk(key, 0, frozenset())
        return "\n".join(lines)

    def _sum(self, src: Key, kept: tuple[str, ...]) -> Quantity:
        q = self.get_quantity(src)
        if kept:
            df = q.df.groupBy(*kept).agg(F.sum("value").alias("value"))
        else:
            df = q.df.agg(F.sum("value").alias("value"))
        return Quantity(df, kept, q.unit)

    # -- resolution -------------------------------------------------------
    def get_quantity(self, key: "str | Key") -> Quantity:
        kk = Key.parse(key)
        k = str(kk)
        if k in self._cache:
            return self._cache[k]
        if k not in self.graph:
            # on-demand partial sum against the full-dim key (A1) —
            # the source resolves through get_quantity below, so its
            # reuse is counted like any other graph key's
            fk = self.full_keys.get(kk.name)
            if fk is not None and set(kk.dims) < set(fk.dims):
                return self._sum(fk, kk.dims)
            raise KeyError(f"no key {k!r}")
        q = self.graph[k]()
        if self.auto_cse:
            hits = self._hits[k] = self._hits.get(k, 0) + 1
            if hits == 2:
                # second uncached resolution: the key is provably
                # shared — pin this result and serve it from the cache
                # from now on (the dask-graph memoization behavior)
                q.df = q.df.persist()
                self._cache[k] = q
        return q

    def get(self, key: "str | Key") -> DataFrame:
        return self.get_quantity(key).df

    def write(self, key: "str | Key", path: str) -> None:
        """Compute ``key`` and write the result to ``path`` (genno
        ``Computer.write`` surface; reference cli.py:120–142 report
        output). ``.csv`` writes dims+value(+unit) rows; ``.xlsx`` writes
        one sheet named after the key via the stdlib SpreadsheetML
        writer. Driver-side by design: reported quantities are
        aggregates, not fact tables."""
        q = self.get_quantity(key)
        pdf = q.df.toPandas()
        if q.unit:
            pdf = pdf.assign(unit=q.unit)
        if path.endswith(".xlsx"):
            from ixmp_spark.sources.xlsx_lite import write_xlsx

            sheet = str(Key.parse(key)).replace(":", " ")[:31]
            write_xlsx(path, {sheet: pdf})
        elif path.endswith(".csv"):
            pdf.to_csv(path, index=False)
        else:
            raise ValueError(f"unsupported output format: {path!r}")

    def persist_key(self, key: "str | Key") -> None:
        """P6: pin a hot intermediate across actions (the explicit CSE the
        dask graph got implicitly; ``auto_cse`` now applies this
        transparently on the second overlapping partial-sum request)."""
        q = self.get_quantity(key)
        q.df = q.df.persist()
        self._cache[str(Key.parse(key))] = q

    def release(self) -> None:
        """Unpersist every pinned intermediate (explicit or auto-CSE)
        and clear the reuse counters — the teardown twin of
        ``persist_key`` so long-lived sessions don't accumulate
        block-manager entries across reports."""
        for q in self._cache.values():
            q.df.unpersist()
        self._cache.clear()
        self._hits.clear()

    def keys(self) -> list[str]:
        return sorted(self.graph)

    # -- scenario ingestion (X2: data_for_quantity) -----------------------
    @classmethod
    def from_scenario(cls, scen, filters: dict | None = None) -> "Reporter":
        """Register all scenario items (reference reporter.py:28–100):
        pars → ``name:dims`` with value/unit; vars/equs → lvl as value and
        ``name-margin`` for mrg (report/util.py:60–68); sets → label lists.
        ``filters`` are pruned per item to its dims (F9)."""
        rep = cls()
        for name in scen.items("set"):
            item = scen._require_item(name)
            if item["idx_sets"]:
                continue
            # sets are inserted as literal label data (reporter.py:84–98)
            rep.labels[name] = list(scen.set(name))
        for name in scen.items("par"):
            item = scen._require_item(name)
            dims = tuple(item["idx_names"])
            k = Key(name, dims)

            def load_par(scen=scen, name=name, dims=dims):
                item = scen._require_item(name)
                if not dims:
                    s = scen.scalar(name)
                    sdf = scen.platform.spark.createDataFrame(
                        [(float(s["value"]),)], "value double"
                    )
                    return Quantity(sdf, (), s["unit"])
                rel = {
                    d: v for d, v in (filters or {}).items() if d in dims
                } or None
                sdf = scen.par_spark(name, rel)
                units = [
                    r["unit"] for r in sdf.select("unit").distinct().collect()
                ]
                if len(units) > 1:
                    raise ValueError(f"mixed units {units} for {name!r}")
                unit = units[0] if units else None
                return Quantity(sdf.drop("unit"), dims, unit)

            rep.add(k, load_par, deps=[])
            rep._register_sums(k)
        rep.spark = scen.platform.spark
        for ix_type in ("var", "equ"):
            for name in scen.items(ix_type):
                item = scen._require_item(name)
                dims = tuple(item["idx_names"])
                for col, suffix in (("lvl", ""), ("mrg", "-margin")):
                    k = Key(name + suffix, dims)

                    def load_sol(
                        scen=scen, name=name, ix_type=ix_type, col=col, dims=dims
                    ):
                        d = scen._get_elements(ix_type, name)
                        if isinstance(d, dict):
                            sdf = scen.platform.spark.createDataFrame(
                                [(float(d[col]),)], "value double"
                            )
                            return Quantity(sdf, (), None)
                        sdf = scen.platform.spark.createDataFrame(d)
                        out = sdf.select(
                            *dims, F.col(col).alias("value")
                        )
                        return Quantity(out, dims, None)

                    rep.add(k, load_sol, deps=[])
                    rep._register_sums(k)
        return rep

    # -- combinators (J7, A2/A3) ------------------------------------------
    def add_product(self, key: str, a: "str | Key", b: "str | Key") -> Key:
        """J7: multiply with dim alignment — inner join on shared dims,
        broadcast over disjoint ones (cross join when none shared)."""
        return self._binary(key, a, b, lambda x, y: x * y, "mul")

    def add_ratio(self, key: str, a, b) -> Key:
        return self._binary(key, a, b, lambda x, y: x / y, "div")

    def add_sum(self, key: str, a, b) -> Key:
        return self._binary(key, a, b, lambda x, y: x + y, "add", outer=True)

    def _binary(self, key, a, b, op, opname, outer=False) -> Key:
        k = Key.parse(key)

        def compute():
            qa, qb = self.get_quantity(a), self.get_quantity(b)
            shared = [d for d in qa.dims if d in qb.dims]
            da = qa.df.withColumnRenamed("value", "__va")
            db = qb.df.withColumnRenamed("value", "__vb")
            if shared:
                how = "full_outer" if outer else "inner"
                j = da.join(db, on=shared, how=how)
            else:
                j = da.crossJoin(db)
            va = F.coalesce(F.col("__va"), F.lit(0.0)) if outer else F.col("__va")
            vb = F.coalesce(F.col("__vb"), F.lit(0.0)) if outer else F.col("__vb")
            out_dims = tuple(dict.fromkeys([*qa.dims, *qb.dims]))
            unit = _combine_units(qa.unit, qb.unit, opname, self.unit_aliases)
            return Quantity(
                j.select(*out_dims, op(va, vb).alias("value")), out_dims, unit
            )

        self.add(k, compute, deps=[a, b])
        self._register_sums(k)
        return k

    def add_aggregate(
        self, key: str, src: "str | Key", dim: str, groups: dict[str, Iterable[str]],
        keep: bool = False,
    ) -> Key:
        """A2 (genno aggregate): map labels of ``dim`` into named groups,
        sum within group; keep=True also unions the original labels."""
        k = Key.parse(key)

        def compute():
            q = self.get_quantity(src)
            spark = q.df.sparkSession
            mapping = spark.createDataFrame(
                [(g, m) for g, members in groups.items() for m in members],
                f"__group string, {dim} string",
            )
            others = [d for d in q.dims if d != dim]
            agg = (
                q.df.join(F.broadcast(mapping), dim)
                .groupBy(*others, "__group")
                .agg(F.sum("value").alias("value"))
                .withColumnRenamed("__group", dim)
                .select(*q.dims, "value")
            )
            out = q.df.select(*q.dims, "value").unionByName(agg) if keep else agg
            return Quantity(out, q.dims, q.unit)

        self.add(k, compute, deps=[src])
        return k

    def add_group_sum(self, key: str, src, group: str) -> Key:
        """A3: sum over all dims except ``group``."""
        k = Key.parse(key)
        self.add(
            k, lambda: self._sum(Key.parse(src), (group,)), deps=[src]
        )
        return k

    def add_select(
        self, key: str, src: "str | Key", selectors: dict[str, list[str]]
    ) -> Key:
        """genno ``select``: keep only listed labels per dim (IN-list —
        the same F1 contract, so non-member labels are silently ignored)."""
        from ixmp_spark.operators.filtering import in_list_filter

        k = Key.parse(key)

        def compute():
            q = self.get_quantity(src)
            return Quantity(in_list_filter(q.df, selectors), q.dims, q.unit)

        self.add(k, compute, deps=[src])
        self._register_sums(k)
        return k

    def add_rename(self, key: str, src: "str | Key", renames: dict[str, str]) -> Key:
        """C6 dim rename applied inside the graph."""
        k = Key.parse(key)

        def compute():
            q = self.get_quantity(src)
            df = q.df
            for old, new in renames.items():
                df = df.withColumnRenamed(old, new)
            dims = tuple(renames.get(d, d) for d in q.dims)
            return Quantity(df, dims, q.unit)

        self.add(k, compute, deps=[src])
        return k

    def add_concat(self, key: str, *srcs: "str | Key") -> Key:
        """genno ``concat``: union of same-dim quantities (units must
        agree — A7 guard)."""
        k = Key.parse(key)

        def compute():
            qs = [self.get_quantity(s) for s in srcs]
            dims = qs[0].dims
            unit = qs[0].unit
            for q in qs[1:]:
                if set(q.dims) != set(dims):
                    raise ValueError(f"dim mismatch {q.dims} vs {dims}")
                if q.unit != unit:
                    raise ValueError(f"cannot concat units {q.unit!r}/{unit!r}")
            out = qs[0].df.select(*dims, "value")
            for q in qs[1:]:
                out = out.unionByName(q.df.select(*dims, "value"))
            return Quantity(out, dims, unit)

        self.add(k, compute, deps=list(srcs))
        self._register_sums(k)
        return k

    def add_file(
        self,
        key: str,
        spark,
        path: str,
        dims: tuple[str, ...],
        unit: str | None = None,
        renames: dict[str, str] | None = None,
    ) -> Key:
        """S9 reporting file input (reference report-config ``files:``):
        CSV → quantity with dim renaming/selection."""
        k = Key.parse(key)

        def compute():
            df = spark.read.csv(path, header=True, inferSchema=True)
            for old, new in (renames or {}).items():
                df = df.withColumnRenamed(old, new)
            got_unit = unit
            if "unit" in df.columns:
                units = [r["unit"] for r in df.select("unit").distinct().collect()]
                if len(units) == 1 and got_unit is None:
                    got_unit = units[0]
                df = df.drop("unit")
            out = df.select(
                *dims, F.col("value").cast("double").alias("value")
            )
            return Quantity(out, tuple(dims), got_unit)

        self.add(k, compute, deps=[])
        self._register_sums(k)
        return k

    # -- config file (reference report-config-0.yaml; cli.py:121–138) -----
    def configure(self, path: str) -> "Reporter":
        """Load a reference-style reporting config file (YAML).

        Sections (reference tests/data/report-config-0.yaml +
        doc/reporting.rst):

        - ``default:`` — key computed when the CLI gets no explicit key;
        - ``files:`` — exogenous CSV inputs (``path`` relative to the
          config file; ``key``; ``dims`` as a list (project columns) or
          dict (rename column → dim); omitted = every non-value/unit
          column);
        - ``alias:`` — name → existing quantity;
        - ``units: {apply: {key: unit}}`` — override a quantity's unit.

        Unrecognized sections log a warning (reference behavior)."""
        import logging
        import os

        import yaml

        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
        base = os.path.dirname(os.path.abspath(path))
        recognized = {"default", "files", "alias", "units"}
        for section in cfg:
            if section not in recognized:
                logging.getLogger(__name__).warning(
                    "unrecognized report config section %r", section
                )
        if "default" in cfg:
            self.default_key = str(cfg["default"])
        for spec in cfg.get("files") or []:
            p = spec["path"]
            if not os.path.isabs(p):
                p = os.path.join(base, p)
            dims = spec.get("dims")
            renames = None
            if isinstance(dims, dict):
                renames = {str(s): str(d) for s, d in dims.items()}
                dim_tuple = tuple(renames.values())
            elif dims is not None:
                dim_tuple = tuple(str(d) for d in dims)
            else:  # infer from the CSV header
                with open(p) as fh:
                    header = fh.readline().strip().split(",")
                dim_tuple = tuple(
                    c for c in header if c not in ("value", "unit")
                )
            self.add_file(
                str(spec["key"]), self.spark, p, dims=dim_tuple,
                renames=renames,
            )
        for alias, target in (cfg.get("alias") or {}).items():
            tk = self.full_keys.get(str(target))
            if tk is None:
                raise KeyError(f"alias target {target!r} is not a quantity")
            ak = Key(str(alias), tk.dims)
            self.add(ak, lambda tk=tk: self.get_quantity(tk), deps=[tk])
            self.full_keys.setdefault(ak.name, ak)
        # units: replace: {alias: symbol} — config-driven parser
        # replacements (reference RunConfig units handling / pint
        # definition overrides); stored per-Reporter so one Reporter's
        # config never mutates process-global state
        register_unit_aliases(
            (cfg.get("units") or {}).get("replace", {}),
            into=self.unit_aliases,
        )
        for key, unit in (cfg.get("units") or {}).get("apply", {}).items():
            src = self.full_keys.get(str(key), Key.parse(str(key)))
            orig = self.graph[str(src)]  # wrap, don't recurse

            def reunit(orig=orig, unit=unit):
                q = orig()
                return Quantity(q.df, q.dims, str(unit))

            # the wrap preserves the original thunk, so the NEW
            # definition's edges are exactly the old definition's
            self.add(src, reunit, deps=self.deps.get(str(src)))
        return self


#: pint-style alias normalization applied per parsed factor (reference
#: report/util.py parse_units + pint's symbol resolution): long names and
#: common spellings collapse to one symbol so 'kilometers' and 'km' are
#: the SAME unit to the algebra. Extended at runtime by
#: register_unit_aliases (the config-driven replacement map, mirroring
#: reference report/operator.py:129–139 / RunConfig units handling).
UNIT_ALIASES: dict[str, str] = {
    "meter": "m", "meters": "m", "metre": "m", "metres": "m",
    "kilometer": "km", "kilometers": "km", "kilometre": "km",
    "kilometres": "km",
    "gram": "g", "grams": "g", "kilogram": "kg", "kilograms": "kg",
    "tonne": "t", "tonnes": "t", "ton": "t", "tons": "t",
    "second": "s", "seconds": "s", "sec": "s",
    "minute": "min", "minutes": "min",
    "hour": "h", "hours": "h", "hr": "h",
    "year": "a", "years": "a", "yr": "a",
    "joule": "J", "joules": "J", "watt": "W", "watts": "W",
    "hertz": "Hz",
    "newton": "N", "newtons": "N", "pascal": "Pa", "pascals": "Pa",
    "percent": "%", "pct": "%",
    "dollar": "USD", "dollars": "USD",
    "kilowatt": "kW", "kilowatts": "kW",
    "megawatt": "MW", "megawatts": "MW",
    "gigawatt": "GW", "gigawatts": "GW",
}

#: derived-unit expansions to SI-base exponent form, used ONLY for the
#: add-compatibility check so 'J/s' + 'W' is accepted (pint
#: dimensionality equivalence) — mul/div keep the surface symbols the
#: user wrote. Prefixed symbols (kW, GWa, …) stay opaque on purpose: the
#: algebra tracks symbols, not magnitudes, and treating kW ≡ W would
#: silently mis-add scaled series.
UNIT_EXPANSIONS: dict[str, dict[str, int]] = {
    "J": {"kg": 1, "m": 2, "s": -2},
    "W": {"kg": 1, "m": 2, "s": -3},
    "N": {"kg": 1, "m": 1, "s": -2},
    "Pa": {"kg": 1, "m": -1, "s": -2},
    "Hz": {"s": -1},
}


def register_unit_aliases(
    mapping: dict[str, str], into: dict[str, str] | None = None
) -> None:
    """Config-driven unit replacements (reference RunConfig
    ``units:``/pint definition overrides): every parse thereafter maps
    each alias factor to its target symbol. With ``into`` (a Reporter's
    ``unit_aliases`` dict), the replacements are scoped to that
    Reporter; without it they go into the process-global UNIT_ALIASES —
    an explicit, documented choice for callers that really want
    process-wide registration (Reporter.configure never does this)."""
    (UNIT_ALIASES if into is None else into).update(
        {str(k): str(v) for k, v in mapping.items()}
    )


_UNIT_OK_CHARS = re.compile(r"[^\w%*/ .]")


def _unit_exponents(
    u: str, aliases: dict[str, str] | None = None
) -> dict[str, int]:
    """Parse 'a*b/c*d' → {a:1, b:1, c:-1, d:-1} (left-to-right, '/' flips
    sign for the following factor — the pint-compatible reading of the
    simple forms the reference stores, e.g. 'USD/km'). Factors are
    normalized through ``aliases`` (a Reporter's scoped map) first, then
    UNIT_ALIASES; invalid characters raise with the reference's message
    shape (report/util.py parse_units: test_reporter.py:86–105)."""
    bad = sorted(set(_UNIT_OK_CHARS.findall(u)))
    if bad:
        raise ValueError(
            f"unit {u!r} cannot be parsed; contains invalid character(s) "
            f"{''.join(bad)!r}"
        )
    exps: dict[str, int] = {}
    sign = 1  # applies to the NEXT factor only: a/b*c = (a/b)*c
    # '**N' exponent suffixes (our own canonical output) bind to the name
    for tok in re.findall(r"[a-zA-Z_%][\w%]*(?:\*\*\d+)?|[*/]", u.replace(" ", "")):
        if tok == "*":
            sign = 1
            continue
        if tok == "/":
            sign = -1
            continue
        name, _, exp = tok.partition("**")
        if aliases:
            name = aliases.get(name, name)
        name = UNIT_ALIASES.get(name, name)
        if name not in ("", "1"):
            exps[name] = exps.get(name, 0) + sign * (int(exp) if exp else 1)
        sign = 1
    return {k: v for k, v in exps.items() if v}


def _expand_exponents(exps: dict[str, int]) -> dict[str, int]:
    """Derived symbols → SI-base exponent form (one level; the table is
    already in base units). Dimensional-equivalence canonicalizer for
    the add check only."""
    out: dict[str, int] = {}
    for name, n in exps.items():
        for base, bn in UNIT_EXPANSIONS.get(name, {name: 1}).items():
            out[base] = out.get(base, 0) + bn * n
    return {k: v for k, v in out.items() if v}


def _exps_to_unit(exps: dict[str, int]) -> str:
    num = [k if v == 1 else f"{k}**{v}" for k, v in sorted(exps.items()) if v > 0]
    den = [k if v == -1 else f"{k}**{-v}" for k, v in sorted(exps.items()) if v < 0]
    if not num and not den:
        return ""
    out = "*".join(num) or "1"
    if den:
        out += "/" + "/".join(den)
    return out


def _combine_units(
    a: str | None,
    b: str | None,
    op: str,
    aliases: dict[str, str] | None = None,
) -> str | None:
    """C5 unit algebra without pint: exponent-counting mul/div with
    cancellation ('km' * 'USD/km' → 'USD'); add requires DIMENSIONALLY
    equal units — surface symbols are alias-normalized and derived units
    expand to base form for the comparison, so 'J/s' + 'W' and
    'kilometers' + 'km' are accepted (reference operator.py:114–127 +
    pint dimensionality; mixed units still rejected — stricter than the
    reference's warn-and-discard, deliberately). ``aliases`` threads a
    Reporter's scoped ``units: replace:`` map into the factor parse."""
    if a is None or b is None:
        return a or b
    if op in ("mul", "div"):
        ea, eb = _unit_exponents(a, aliases), _unit_exponents(b, aliases)
        sgn = 1 if op == "mul" else -1
        for k, v in eb.items():
            ea[k] = ea.get(k, 0) + sgn * v
        return _exps_to_unit({k: v for k, v in ea.items() if v})
    if _expand_exponents(_unit_exponents(a, aliases)) != _expand_exponents(
        _unit_exponents(b, aliases)
    ):
        raise ValueError(f"cannot add units {a!r} and {b!r}")
    return a
