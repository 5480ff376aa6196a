"""Engine-core semantics tests — mirrors the reference's test strategy
(SURVEY.md §5: Dantzig golden fixture, filter truth tables, lifecycle)."""

from __future__ import annotations

import pandas as pd
import pytest

from ixmp_spark.core import Platform, Scenario, TimeSeries
from ixmp_spark.core.utils import diff, format_scenario_list, parse_url, update_par
from ixmp_spark.testing import HIST_DF, make_dantzig, solve_dantzig


@pytest.fixture()
def mp(spark, tmp_path):
    return Platform(spark, str(tmp_path / "wh"))


@pytest.fixture()
def dantzig(mp) -> Scenario:
    return make_dantzig(mp)


# -- item registry & filters (reference test_scenario.py:444–540) ---------

def test_items_registry(dantzig):
    assert dantzig.items("par") == ["a", "b", "d", "f"]
    assert dantzig.items("par", indexed_by="i") == ["a", "d"]
    assert dantzig.items("equ", indexed_by="i") == ["supply"]
    assert dantzig.idx_sets("d") == ["i", "j"]
    assert dantzig.idx_names("d") == ["i", "j"]
    assert dantzig.has_par("d") and not dantzig.has_set("d")


def test_simple_set_series(dantzig):
    i = dantzig.set("i")
    assert isinstance(i, pd.Series)
    assert sorted(i) == ["san-diego", "seattle"]


def test_par_filter_golden(dantzig):
    """par('d', filters={'i': ['seattle']}) → 3 rows, unit km
    (reference test_scenario.py:471–491)."""
    d = dantzig.par("d", filters={"i": ["seattle"]})
    assert len(d) == 3
    assert set(d.columns) == {"i", "j", "value", "unit"}
    assert (d["unit"] == "km").all()
    assert sorted(d["j"]) == ["chicago", "new-york", "topeka"]
    assert d.set_index("j")["value"]["chicago"] == 1.7


def test_filter_contract(dantzig):
    # silent ignore of non-member values (base.py:1001–1005)
    d = dantzig.par("d", filters={"i": ["seattle", "atlantis"]})
    assert len(d) == 3
    # non-str coercion: int filters match their str form
    dantzig.check_out()
    dantzig.init_set("year")
    dantzig.add_set("year", ["2020", "2030"])
    dantzig.init_par("p_y", idx_sets=["year"])
    dantzig.add_par("p_y", "2020", 1.0, "cases")
    dantzig.commit("year par")
    assert len(dantzig.par("p_y", filters={"year": [2020]})) == 1
    # irrelevant filter keys are pruned (F9)
    assert len(dantzig.par("d", filters={"nope": ["x"]})) == 6


def test_scalar_roundtrip(dantzig):
    f = dantzig.scalar("f")
    assert f == {"value": 90.0, "unit": "USD/km"}


def test_write_validation_strict(dantzig):
    dantzig.check_out()
    with pytest.raises(ValueError, match="not in set"):
        dantzig.add_par("d", ["atlantis", "topeka"], 1.0, "km")
    with pytest.raises(ValueError, match="unknown units"):
        dantzig.add_par("d", ["seattle", "topeka"], 1.0, "parsec")
    with pytest.raises(ValueError, match="arity|dimensions"):
        dantzig.add_set("i", [["a", "b"]])
    dantzig.discard_changes()


def test_iter_par_data(dantzig):
    got = [(n, len(df)) for n, df in dantzig.iter_par_data({"i": ["seattle"]})]
    assert got == [("a", 1), ("d", 3)]


def test_add_set_idempotent(dantzig):
    dantzig.check_out()
    dantzig.add_set("i", "seattle")  # duplicate → no-op
    dantzig.commit("dup add")
    assert len(dantzig.set("i")) == 2


def test_indexed_set(dantzig):
    dantzig.check_out()
    dantzig.init_set("route", idx_sets=["i", "j"])
    dantzig.add_set("route", [["seattle", "chicago"], ["san-diego", "topeka"]])
    dantzig.commit("routes")
    r = dantzig.set("route")
    assert isinstance(r, pd.DataFrame)
    assert len(r) == 2
    # same set twice with distinct dim names (doc/file-io.rst:62–75)
    dantzig.check_out()
    dantzig.init_set("pairs", idx_sets=["i", "i"], idx_names=["i", "i2"])
    dantzig.add_set("pairs", [["seattle", "san-diego"]])
    dantzig.commit("pairs")
    p = dantzig.set("pairs")
    assert list(p.columns) == ["i", "i2"]


def test_remove_par_elements(dantzig):
    dantzig.check_out()
    dantzig.remove_par("d", [["seattle", "topeka"]])
    dantzig.commit("rm")
    assert len(dantzig.par("d")) == 5


# -- solution lifecycle (reference test_scenario.py:553–599) --------------

def test_solution_golden(dantzig):
    solve_dantzig(dantzig)
    x = dantzig.var("x", filters={"i": ["seattle"]})
    x = x.set_index("j").loc[["new-york", "chicago", "topeka"]]
    assert x["lvl"].tolist() == [50.0, 300.0, 0.0]
    assert x["mrg"].tolist() == [0.0, 0.0, 0.036]
    z = dantzig.var("z")
    assert z == {"lvl": 153.675, "mrg": 0.0}
    assert dantzig.has_solution()


def test_checkout_refused_with_solution(dantzig):
    solve_dantzig(dantzig)
    with pytest.raises(RuntimeError, match="solution"):
        dantzig.check_out()
    dantzig.check_out(timeseries_only=True)  # allowed
    dantzig.discard_changes()


def test_remove_solution(dantzig):
    solve_dantzig(dantzig)
    dantzig.remove_solution()
    assert not dantzig.has_solution()
    with pytest.raises(ValueError):
        dantzig.remove_solution()


# -- versions & clone (reference test_scenario.py:215–338) ----------------

def test_versions_and_default(mp):
    s1 = make_dantzig(mp)
    s2 = s1.clone(annotation="v2")
    assert (s1.version, s2.version) == (1, 2)
    # default resolution: s1 was set default → plain load returns v1
    again = Scenario(mp, "canning problem", "standard")
    assert again.version == 1
    s2.set_as_default()
    assert Scenario(mp, "canning problem", "standard").version == 2
    # explicit version load
    assert Scenario(mp, "canning problem", "standard", version=1).version == 1
    # w/o default flag: max version wins
    mp.wh.update_catalog(
        lambda c: [r.__setitem__("is_default", False) for r in c["runs"].values()]
    )
    assert Scenario(mp, "canning problem", "standard").version == 2


def test_clone_drops_solution(mp):
    s1 = make_dantzig(mp, solve=True)
    keep = s1.clone()
    drop = s1.clone(keep_solution=False)
    assert keep.has_solution()
    assert not drop.has_solution()
    # model data survives either way
    assert len(drop.par("d")) == 6


def test_clone_shift_first_model_year(mp):
    s1 = make_dantzig(mp, solve=True)
    s1.check_out(timeseries_only=True)
    s1.add_timeseries(HIST_DF, meta=True)
    s1.add_timeseries(
        pd.DataFrame(
            {
                "region": "DantzigLand",
                "variable": "Demand",
                "unit": "cases",
                "year": [2000, 2005, 2010],
                "value": [850.0, 900.0, 950.0],
            }
        )
    )
    s1.commit("ts")
    shifted = s1.clone(keep_solution=False, shift_first_model_year=2005)
    ts = shifted.timeseries()
    # meta rows survive; non-meta rows ≥ 2005 dropped
    dem = ts[ts["variable"] == "Demand"]
    assert sorted(dem["year"]) == [2000]
    gdp = ts[ts["variable"] == "GDP"]
    assert sorted(gdp["year"]) == [2000, 2005, 2010]


def test_clone_shift_overrides_keep_solution(mp, caplog):
    """shift_first_model_year with the DEFAULT keep_solution=True must warn
    and force keep_solution=False (reference scenario.py:918–922) — the
    shift only makes sense on a solution-free clone."""
    import logging

    s1 = make_dantzig(mp, solve=True)
    s1.check_out(timeseries_only=True)
    s1.add_timeseries(HIST_DF, meta=True)
    s1.add_timeseries(
        pd.DataFrame(
            {
                "region": "DantzigLand",
                "variable": "Demand",
                "unit": "cases",
                "year": [2000, 2005, 2010],
                "value": [850.0, 900.0, 950.0],
            }
        )
    )
    s1.commit("ts")
    with caplog.at_level(logging.WARNING, logger="ixmp_spark.core.scenario"):
        shifted = s1.clone(shift_first_model_year=2005)  # NO keep_solution arg
    assert any("keep_solution" in r.message for r in caplog.records)
    # (a) the solution is gone despite the keep_solution=True default
    assert not shifted.has_solution()
    # (b) non-meta TS clamped below the shift year
    ts = shifted.timeseries()
    assert sorted(ts[ts["variable"] == "Demand"]["year"]) == [2000]
    # (c) meta TS intact for all years
    assert sorted(ts[ts["variable"] == "GDP"]["year"]) == [2000, 2005, 2010]


def test_transact_discard_on_error(dantzig):
    # discard_on_error=True: staged changes are dropped on error
    with pytest.raises(RuntimeError, match="boom"):
        with dantzig.transact("will fail", discard_on_error=True):
            dantzig.add_set("i", "nowhere")
            raise RuntimeError("boom")
    assert sorted(dantzig.set("i")) == ["san-diego", "seattle"]
    # default (reference timeseries.py:242): the object stays checked
    # out with staged state intact so the caller can inspect/repair
    with pytest.raises(RuntimeError, match="boom2"):
        with dantzig.transact("will fail too"):
            dantzig.add_set("i", "nowhere")
            raise RuntimeError("boom2")
    assert dantzig._checked_out
    assert "nowhere" in set(dantzig.set("i"))
    dantzig.discard_changes()
    assert sorted(dantzig.set("i")) == ["san-diego", "seattle"]
    # condition=False: no checkout/commit at all
    with dantzig.transact("noop", condition=False):
        pass
    assert not dantzig._checked_out


# -- timeseries (reference test_timeseries.py:204–345) --------------------

def test_ts_wide_long_roundtrip(mp):
    ts = TimeSeries(mp, "Douglas Adams", "Hitchhiker", version="new")
    mp.add_unit("???")
    mp.add_region("World", hierarchy="common")
    long = pd.DataFrame(
        {
            "region": "World",
            "variable": "Testing",
            "unit": "???",
            "year": [2010, 2020],
            "value": [23.7, 23.8],
        }
    )
    ts.add_timeseries(long)
    ts.commit("initial data")
    got = ts.timeseries()
    assert got["year"].tolist() == [2010, 2020]
    assert got["value"].tolist() == [23.7, 23.8]
    assert "subannual" not in got.columns  # auto-dropped, all 'Year'
    wide = ts.timeseries(iamc=True)
    assert wide[2010].tolist() == [23.7]
    assert list(wide.columns[:5]) == ["model", "scenario", "region", "variable", "unit"]


def test_ts_region_synonym(mp):
    mp.add_unit("???")
    mp.add_region("World", hierarchy="common")
    mp.add_region_synonym("Earth", "World")
    ts = TimeSeries(mp, "m", "s", version="new")
    ts.add_timeseries(
        pd.DataFrame(
            {
                "region": "Earth",
                "variable": "Testing",
                "unit": "???",
                "year": [2010],
                "value": [1.0],
            }
        )
    )
    ts.commit("syn")
    assert ts.timeseries()["region"].tolist() == ["World"]


def test_ts_filters_and_year_lim(mp):
    mp.add_unit("GWa")
    mp.add_region("World", hierarchy="common")
    ts = TimeSeries(mp, "m", "s", version="new")
    ts.add_timeseries(
        pd.DataFrame(
            {
                "region": "World",
                "variable": ["v1", "v1", "v2"],
                "unit": "GWa",
                "year": [2000, 2010, 2010],
                "value": [1.0, 2.0, 3.0],
            }
        ),
        year_lim=(2001, None),
    )
    ts.commit("clamped")
    got = ts.timeseries()
    assert got["year"].tolist() == [2010, 2010]
    v1 = ts.timeseries(variable="v1")
    assert v1["value"].tolist() == [2.0]
    byyear = ts.timeseries(year=2010)
    assert len(byyear) == 2


def test_ts_remove(mp):
    mp.add_unit("???")
    mp.add_region("World", hierarchy="common")
    ts = TimeSeries(mp, "m", "s", version="new")
    df = pd.DataFrame(
        {
            "region": "World",
            "variable": "Testing",
            "unit": "???",
            "year": [2010, 2020],
            "value": [1.0, 2.0],
        }
    )
    ts.add_timeseries(df)
    ts.commit("add")
    ts.check_out()
    ts.remove_timeseries(df[df["year"] == 2010])
    ts.commit("rm")
    assert ts.timeseries()["year"].tolist() == [2020]


def test_geodata_roundtrip(mp):
    mp.add_unit("score")
    mp.add_region("World", hierarchy="common")
    ts = TimeSeries(mp, "m", "s", version="new")
    geo = pd.DataFrame(
        {
            "region": "World",
            "variable": "var1",
            "subannual": "Year",
            "year": [2000, 2010, 2020],
            "value": ["test", "more-test", "2020-test"],
            "unit": "score",
            "meta": 0,
        }
    )
    ts.add_geodata(geo)
    ts.commit("geo")
    got = ts.get_geodata()
    assert sorted(got["value"]) == ["2020-test", "more-test", "test"]
    assert got["value"].dtype == object  # str values, not float


# -- platform codelists & meta (reference test_meta.py) -------------------

def test_units_regions_timeslices(mp):
    mp.add_unit("USD")
    assert "USD" in mp.units()
    mp.add_region("World", hierarchy="common")
    mp.add_region("CountryA", hierarchy="country", parent="World")
    regs = mp.regions()
    assert set(regs["region"]) == {"World", "CountryA"}
    mp.add_timeslice("Summer", "Season", 0.25)
    with pytest.raises(ValueError, match="duration"):
        mp.add_timeslice("Summer", "Season", 0.5)
    tsl = mp.timeslices().set_index("name")
    assert tsl.loc["Year", "duration"] == 1.0
    assert tsl.loc["Summer", "duration"] == 0.25


def test_meta_cascade(mp, dantzig):
    mp.set_meta("k_model", "m-level", model="canning problem")
    mp.set_meta("k_both", 42, model="canning problem", scenario="standard")
    mp.set_meta(
        "k_ver", True, model="canning problem", scenario="standard", version=1
    )
    mp.set_meta("k_model", "overridden", model="canning problem",
                scenario="standard")
    got = mp.get_meta(model="canning problem", scenario="standard", version=1)
    assert got == {"k_model": "overridden", "k_both": 42, "k_ver": True}
    strict = mp.get_meta(model="canning problem", strict=True)
    assert strict == {"k_model": "m-level"}
    with pytest.raises(ValueError):
        mp.set_meta("bad", 1, version=3)


def test_scenario_list_and_format(mp):
    s1 = make_dantzig(mp)
    s1.clone()
    lst = mp.scenario_list(default=False)
    assert len(lst) == 2
    assert mp.scenario_list()["version"].tolist() == [1]  # only default
    fmt = format_scenario_list(mp)
    assert fmt.loc[0, "N"] == 2
    assert fmt.loc[0, "default_version"] == 1
    assert len(format_scenario_list(mp, match="nothing")) == 0
    assert len(format_scenario_list(mp, match="canning")) == 1


# -- utils ---------------------------------------------------------------

def test_diff(mp):
    a = make_dantzig(mp)
    b = a.clone()
    b.check_out()
    b.add_par("d", ["seattle", "topeka"], 9.9, "km")
    b.remove_par("b", ["topeka"])
    b.commit("changes")
    out = dict(diff(a, b))
    d = out["d"].set_index(["i", "j"])
    assert d.loc[("seattle", "topeka"), "value_a"] == 1.8
    assert d.loc[("seattle", "topeka"), "value_b"] == 9.9
    bb = out["b"]
    assert (bb["_merge"] == "left_only").sum() == 1


def test_update_par(mp):
    scen = make_dantzig(mp)
    scen.check_out()
    update_par(
        scen,
        "d",
        pd.DataFrame(
            [
                ("seattle", "topeka", 99.0, "km"),  # exists → ignored
                ("san-diego", "chicago", 77.0, "km"),  # exists → ignored
            ],
            columns=["i", "j", "value", "unit"],
        ),
    )
    scen.commit("no-op update")
    assert scen.par("d").set_index(["i", "j"]).loc[("seattle", "topeka"), "value"] == 1.8


def test_add_par_bulk_quoted_members(mp, spark):
    """The SQL-parsed membership predicate must survive quotes and
    backslashes in set members and reject non-members."""
    mp.add_unit("u")
    scen = Scenario(mp, "m", "quoted", version="new")
    scen.init_set("k")
    weird = ["it's", 'has "dq"', "back\\slash", "plain"]
    scen.add_set("k", weird)
    scen.init_par("p", idx_sets=["k"])
    src = spark.createDataFrame([(w, 1.0) for w in weird], "k string, value double")
    scen.add_par_bulk("p", src, unit="u")
    scen.commit("weird keys")
    assert sorted(scen.par("p")["k"]) == sorted(weird)
    scen.check_out()
    bad = spark.createDataFrame([("nope", 1.0)], "k string, value double")
    with pytest.raises(ValueError, match="invalid rows"):
        scen.add_par_bulk("p", bad, unit="u")
    scen.discard_changes()


def test_update_par_nonstring_keys(mp):
    """ADVICE r2: non-str dim values must match stored str keys — the
    without-overwriting contract holds for a caller passing ints."""
    scen = make_dantzig(mp)
    scen.check_out()
    scen.init_set("yr")
    scen.add_set("yr", ["2020", "2030"])
    scen.init_par("cap", idx_sets=["yr"])
    scen.add_par(
        "cap",
        pd.DataFrame({"yr": ["2020"], "value": [1.0], "unit": ["cases"]}),
    )
    update_par(
        scen,
        "cap",
        pd.DataFrame(
            # int 2020 == stored "2020" → ignored; 2030 is new → added
            {"yr": [2020, 2030], "value": [99.0, 5.0], "unit": ["cases"] * 2}
        ),
    )
    scen.commit("int-keyed update")
    cap = scen.par("cap").set_index("yr")
    assert cap.loc["2020", "value"] == 1.0  # NOT overwritten
    assert cap.loc["2030", "value"] == 5.0


def test_parse_url():
    plat, info = parse_url("ixmp://my-platform/modelA/scen1#3")
    assert plat == "my-platform"
    assert info == {"model": "modelA", "scenario": "scen1", "version": 3}
    plat, info = parse_url("local/m/s")
    assert plat == "local" and info == {"model": "m", "scenario": "s"}
    with pytest.raises(ValueError):
        parse_url("http://bad/url")


def test_add_par_bulk(mp, spark):
    scen = make_dantzig(mp)
    scen.check_out()
    import pyspark.sql.functions as F

    src = spark.createDataFrame(
        [("seattle", "new-york", 7.5), ("san-diego", "chicago", 8.5)],
        "i string, j string, value double",
    )
    scen.add_par_bulk("d", src, unit="km")
    scen.commit("bulk")
    d = scen.par("d").set_index(["i", "j"])
    assert d.loc[("seattle", "new-york"), "value"] == 7.5  # overwritten
    assert len(d) == 6
    # distributed validation catches bad keys
    scen.check_out()
    bad = spark.createDataFrame([("atlantis", "chicago", 1.0)],
                                "i string, j string, value double")
    with pytest.raises(ValueError, match="not in set"):
        scen.add_par_bulk("d", bad, unit="km")
    with pytest.raises(ValueError, match="unknown units"):
        scen.add_par_bulk(
            "d",
            spark.createDataFrame([("seattle", "chicago", 1.0)],
                                  "i string, j string, value double"),
            unit="parsec",
        )
    scen.discard_changes()


def test_reference_api_facades(mp, tmp_path):
    """Reference-named façades: to_excel/read_excel/load_scenario_data/
    solve + top-level re-exports."""
    import ixmp_spark

    assert ixmp_spark.Platform is type(mp)
    scen = make_dantzig(mp)
    path = str(tmp_path / "facade_wb")
    scen.to_excel(path)
    dst = Scenario(mp, "canning problem", "facade", version="new")
    dst.read_excel(path, init_items=True, add_units=True)
    dst.commit("facade roundtrip")
    assert dst.items("par") == ["a", "b", "d", "f"]
    scen.load_scenario_data()
    scen.solve(model="function", solve_fn=solve_dantzig)
    assert scen.has_solution()


def test_clone_across_platforms(mp, spark, tmp_path):
    """Cross-platform clone (reference scenario.py:1155–1230 generic
    clone): full model data + TS lands in the other warehouse."""
    from ixmp_spark.core import Platform

    src = make_dantzig(mp, solve=True)
    src.check_out(timeseries_only=True)
    src.add_timeseries(HIST_DF, meta=True)
    src.commit("ts")
    other = Platform(spark, str(tmp_path / "wh2"))
    other.add_unit("USD")
    other.add_region("DantzigLand", hierarchy="country")
    cloned = src.clone(platform=other)
    assert cloned.platform is other
    assert cloned.version == 1  # fresh (model, scenario) on the target
    assert len(cloned.par("d")) == 6
    assert cloned.has_solution()
    assert cloned.timeseries()["value"].tolist() == [850.0, 900.0, 950.0]
    # source untouched
    assert len(mp.scenario_list(default=False)) == 1


def test_small_utils(mp):
    from ixmp_spark.core.utils import (
        discard_on_error,
        isscalar,
        maybe_check_out,
        maybe_commit,
        maybe_convert_scalar,
        show_versions,
    )

    scen = make_dantzig(mp)
    with pytest.raises(RuntimeError, match="kaboom"):
        with discard_on_error(scen):
            scen.check_out()
            scen.add_set("i", "mars")
            raise RuntimeError("kaboom")
    assert not scen._checked_out
    assert sorted(scen.set("i")) == ["san-diego", "seattle"]

    assert maybe_check_out(scen) is True
    assert maybe_check_out(scen) is False  # already out
    # explicit state: returned unchanged, NO checkout attempted
    # (reference util/__init__.py:266–267)
    assert maybe_check_out(scen, True) is True
    assert maybe_check_out(scen, False) is False
    assert maybe_commit(scen, False, "no") is False
    assert maybe_commit(scen, True, "yes") is True
    assert not scen._checked_out
    assert maybe_check_out(scen, False) is False  # checked in + explicit
    assert not scen._checked_out  # ... still no checkout happened

    assert isscalar(3.5) and isscalar(7) and not isscalar("s") and not isscalar([1])
    df = maybe_convert_scalar({"value": 90.0, "unit": "USD/km"})
    assert df.loc[0, "value"] == 90.0
    assert "pyspark" in show_versions()


def test_meta_search_and_scalar_audit(mp):
    scen = make_dantzig(mp)  # init_scalar('f', 90, 'USD/km') leaves 1 entry
    scen.check_out()
    scen.change_scalar("f", 95.0, "USD/km", comment="fuel price bump")
    scen.commit("scalar change")
    assert scen.scalar("f")["value"] == 95.0
    import json

    key = f"{scen.model}/{scen.scenario}/{scen.version}/f"
    trail = json.loads(mp.get_doc("scalar_audit", key))
    assert [e["value"] for e in trail] == [90.0, 95.0]
    assert trail[-1]["comment"] == "fuel price bump"
    # regexp meta search
    mp.set_meta("carbon_price_2030", 120, model=scen.model)
    mp.set_meta("discount_rate", 0.05, model=scen.model)
    assert mp.search_meta(name_pattern=r"^carbon_").iloc[0]["value"] == 120
    assert mp.search_meta(value_pattern=r"^0\.05$").iloc[0]["name"] == "discount_rate"
    assert len(mp.search_meta(name_pattern="nope")) == 0


def test_scalar_audit_stages_with_transaction(mp):
    """A rolled-back transaction leaves NO audit trace (provenance
    matches committed state only)."""
    import json

    scen = make_dantzig(mp)
    key = f"{scen.model}/{scen.scenario}/{scen.version}/f"
    before = json.loads(mp.get_doc("scalar_audit", key))
    scen.check_out()
    scen.change_scalar("f", 999.0, "USD/km", comment="never committed")
    scen.discard_changes()
    after_raw = mp.get_doc("scalar_audit", key)
    assert json.loads(after_raw) == before
    assert scen.scalar("f")["value"] == 90.0


def test_cat_mapping_api(mp):
    """Category mapping set truth table (U5, reference base.py:1232–1288
    cat_list / cat_get_elements / cat_set_elements incl. is_unique)."""
    scen = make_dantzig(mp)
    scen.check_out()
    # empty before any categories
    assert scen.cat_list("i") == []
    assert scen.cat("i", "coastal") == []
    scen.add_cat("i", "coastal", ["seattle", "san-diego"])
    scen.add_cat("i", "west", "seattle")
    assert scen.cat_list("i") == ["coastal", "west"]
    assert sorted(scen.cat("i", "coastal")) == ["san-diego", "seattle"]
    assert scen.cat("i", "west") == ["seattle"]
    # idempotent re-add
    scen.add_cat("i", "coastal", "seattle")
    assert sorted(scen.cat("i", "coastal")) == ["san-diego", "seattle"]
    # membership validation: keys must be elements of the set
    with pytest.raises(ValueError, match="not in set"):
        scen.add_cat("i", "coastal", "atlantis")
    # is_unique: exactly one key, replaces existing members
    with pytest.raises(ValueError, match="exactly one key"):
        scen.add_cat("i", "primary", ["seattle", "san-diego"], is_unique=True)
    scen.add_cat("i", "primary", "seattle", is_unique=True)
    scen.add_cat("i", "primary", "san-diego", is_unique=True)
    assert scen.cat("i", "primary") == ["san-diego"]
    # only sets can be categorized
    with pytest.raises(ValueError, match="is a par"):
        scen.add_cat("d", "x", "seattle")
    scen.commit("categories")
    # persists across commit + reload
    reloaded = Scenario(mp, scen.model, scen.scenario, version=scen.version)
    assert reloaded.cat_list("i") == ["coastal", "primary", "west"]
    assert reloaded.cat("i", "primary") == ["san-diego"]
    # Spark view feeds J5-style aggregation joins
    sdf = reloaded.cat_spark("i")
    assert sdf.columns == ["cat", "key"]
    assert sdf.count() == 4
    # whole-set removal drops its categories
    scen2 = make_dantzig(mp)
    scen2.check_out()
    scen2.init_set("tmp")
    scen2.add_set("tmp", ["a", "b"])
    scen2.add_cat("tmp", "g", "a")
    scen2.remove_set("tmp")
    assert len(scen2._table("cat_data")) == 0


def test_per_commit_history(mp):
    """Every commit leaves an addressable snapshot (the local analogue of
    one Delta transaction per ixmp commit — SURVEY.md §1.6)."""
    scen = make_dantzig(mp)
    n0 = len(scen.commit_history())
    assert n0 >= 1  # make_dantzig commits at least once
    with scen.transact("raise seattle->chicago"):
        scen.add_par("d", ["seattle", "chicago"], 9.9, "km")
    assert len(scen.commit_history()) == n0 + 1
    hist = scen.commit_history()
    # past state still readable: old value in commit n0's snapshot
    old = mp.wh.read_table_at(scen.run_id, "par_data", hist[-2])
    old_d = old[(old["name"] == "d")]
    old_val = {tuple(k): v for k, v in zip(old_d["key"], old_d["value"])}
    assert old_val[("seattle", "chicago")] == 1.7
    # current state has the new value
    assert (
        scen.par("d", filters={"i": "seattle", "j": "chicago"})["value"].iloc[0]
        == 9.9
    )
    # Spark can scan the historical snapshot directly
    sdf = scen.spark_table_at("par_data", hist[-2])
    assert sdf.where("name = 'd'").count() == 6
    with pytest.raises(ValueError, match="no commit"):
        mp.wh.read_table_at(scen.run_id, "par_data", 999)


def test_history_vacuum(mp):
    scen = make_dantzig(mp)
    for v in (91.0, 92.0, 93.0):
        with scen.transact(f"f={v}"):
            scen.change_scalar("f", v, "USD/km")
    hist = scen.commit_history()
    assert len(hist) >= 4
    dropped = mp.wh.vacuum(scen.run_id, keep_last=2)
    assert dropped == hist[:-2]
    assert scen.commit_history() == hist[-2:]
    # the kept snapshots still read back
    kept = mp.wh.read_table_at(scen.run_id, "par_data", hist[-1])
    assert len(kept) > 0
    with pytest.raises(ValueError, match="keep_last"):
        mp.wh.vacuum(scen.run_id, keep_last=-1)
    # connection-lifecycle compat no-ops
    mp.open_db()
    mp.close_db()


def test_runs_meta_parquet_mirrors(mp):
    """Registry queries run as Spark parquet scans (runs/meta mirrors are
    rewritten atomically with every catalog update)."""
    scen = make_dantzig(mp)
    scen.set_as_default()
    runs = mp.runs_df()
    assert runs.where("is_default").count() == 1
    row = runs.where("is_default").first()
    assert (row.model, row.scenario, row.version) == (
        "canning problem", "standard", 1,
    )
    mp.set_meta("mirror_check", {"k": 1}, model=scen.model)
    meta = mp.meta_df()
    got = meta.where("name = 'mirror_check'").first()
    assert got.model == scen.model and got.scenario is None
    import json

    assert json.loads(got.value_json) == {"k": 1}


def test_util_parity_functions():
    """as_str_list / is_dict_int_float / check_year / to_iamc_layout /
    year_list / filtered (reference util/__init__.py contracts)."""
    from ixmp_spark.core.utils import (
        as_str_list,
        check_year,
        filtered,
        is_dict_int_float,
        to_iamc_layout,
        year_list,
    )

    assert as_str_list(None) == []
    assert as_str_list("x") == ["x"]
    assert as_str_list("{a}-{b}", a=1, b=2) == ["1-2"]
    assert as_str_list({"k": 1, "j": 2}) == ["k=1", "j=2"]
    assert as_str_list([1, "b"]) == ["1", "b"]
    assert as_str_list(3) == ["3"]

    assert is_dict_int_float({2010: 1.0, 2020: 2.0})
    assert not is_dict_int_float({"2010": 1.0})

    assert check_year(2020, "y") is True
    assert check_year(None, "y") is None
    with pytest.raises(ValueError, match="`y` must be an integer"):
        check_year("2020", "y")

    df = pd.DataFrame(
        {"node": ["World"], "Variable": ["GDP"], "Unit": ["USD"], "2020": [1.0]}
    ).set_index("node")
    out = to_iamc_layout(df)
    # index reset, lower-cased names, node -> region, subannual default
    assert {"region", "variable", "unit", "subannual"} <= set(out.columns)
    assert out["region"].iloc[0] == "World"
    assert out["subannual"].iloc[0] == "Year"
    with pytest.raises(ValueError, match="missing required"):
        to_iamc_layout(pd.DataFrame({"variable": ["x"]}))

    assert year_list(["2010", "foo", 2020, "bar"]) == ["2010", 2020]

    data = pd.DataFrame({"i": ["a", "b", "c"], "v": [1, 2, 3]})
    assert filtered(data, {"i": ["a", "c"]})["v"].tolist() == [1, 3]
    assert filtered(data, None) is data
    assert filtered(data, {"i": "b"})["v"].tolist() == [2]


def test_platform_access_and_logging(mp, tmp_path):
    # open platform: everything allowed
    assert mp.check_access("alice", "canning problem") is True
    assert mp.check_access("alice", ["m1", "m2"]) == {"m1": True, "m2": True}
    with pytest.raises(ValueError, match="at least 1"):
        mp.check_access("alice", [])
    # once an ACL entry exists, that (model, access) pair is restricted
    mp.grant_access("alice", "m1", "edit")
    assert mp.check_access("alice", "m1", "edit") is True
    assert mp.check_access("bob", "m1", "edit") is False
    assert mp.check_access("bob", "m1", "view") is True  # view unrestricted
    mp.grant_access("bob", "m1", "edit")
    assert mp.check_access("bob", "m1", "edit") is True
    # log level round-trip
    mp.set_log_level("DEBUG")
    assert mp.get_log_level() == "DEBUG"
    mp.set_log_level("WARNING")
    assert mp.get_log_level() == "WARNING"
    # export façade
    make_dantzig(mp)
    scen = Scenario(mp, "canning problem", "standard")
    scen.check_out(timeseries_only=True)
    scen.add_timeseries(HIST_DF)
    scen.commit("ts")
    scen.set_as_default()
    out = tmp_path / "exported.csv"
    mp.export_timeseries_data(out)
    assert "GDP" in out.read_text()


def test_top_level_api_parity():
    """Reference __init__.py __all__: every public name importable from
    the package root with the same spelling (reference __init__.py:15–26);
    ModelError subclasses RuntimeError so legacy catches keep working."""
    import ixmp_spark

    for name in [
        "IAMC_IDX", "ItemType", "ModelError", "Platform", "Reporter",
        "Scenario", "TimeSeries", "config", "log", "show_versions",
    ]:
        assert getattr(ixmp_spark, name) is not None
        assert name in ixmp_spark.__all__
    assert issubclass(ixmp_spark.ModelError, RuntimeError)
    assert ixmp_spark.IAMC_IDX == ["model", "scenario", "region", "variable", "unit"]


def test_clone_preserves_categories(mp):
    """clone() copies EVERY fact table, including cat_data — the previous
    implementation enumerated five tables by hand and silently dropped
    category mappings from the cloned run (found while making clone
    size-aware)."""
    s1 = make_dantzig(mp)
    s1.check_out()
    s1.add_cat("i", "coastal", ["san-diego", "seattle"])
    s1.commit("categorize")
    cloned = s1.clone(annotation="with cats")
    assert cloned.cat("i", "coastal") == ["san-diego", "seattle"]
    assert cloned.cat_list("i") == ["coastal"]


def test_model_scenario_name_registries(mp):
    """Name registries exist BEFORE any run (reference
    backend/base.py:301–338, test_platform.py:302–309): an explicitly
    registered name appears in get_*_names with no run attached, and
    creating a run auto-extends both registries. Registration is
    idempotent and survives a fresh Platform on the same warehouse."""
    mp.add_model_name("registered_model")
    mp.add_scenario_name("registered_scen")
    mp.add_model_name("registered_model")  # idempotent
    assert "registered_model" in mp.get_model_names()
    assert "registered_scen" in mp.get_scenario_names()
    assert len(mp.scenario_list(model="registered_model")) == 0  # no run

    make_dantzig(mp)  # run creation auto-registers its names
    assert "canning problem" in mp.get_model_names()
    assert "standard" in mp.get_scenario_names()
    # persisted in catalog.json, not Platform state
    again = Platform(mp.spark, mp.wh.root)
    assert "registered_model" in again.get_model_names()
    assert again.get_model_names() == sorted(again.get_model_names())
