"""I/O round-trips (S3/S4/S5/S6) and reporting engine (X1–X3, A1–A3, J7)
— mirrors reference test patterns (SURVEY.md §5.4–5.5)."""

from __future__ import annotations

import pandas as pd
import pytest

from ixmp_spark.core import Platform, Scenario, TimeSeries
from ixmp_spark.plans import Key, Reporter
from ixmp_spark.sources.scenario_io import (
    read_scenario_data,
    write_scenario_data,
)
from ixmp_spark.sources.ts_io import export_timeseries_data, import_timeseries
from ixmp_spark.testing import make_dantzig, solve_dantzig


@pytest.fixture()
def mp(spark, tmp_path):
    return Platform(spark, str(tmp_path / "wh"))


# -- scenario workbook round-trip (reference test_scenario.py:601) --------

def test_workbook_roundtrip(mp, tmp_path):
    scen = make_dantzig(mp)
    path = str(tmp_path / "dantzig_wb")
    write_scenario_data(scen, path)

    dst = Scenario(mp, "canning problem", "copy", version="new")
    read_scenario_data(dst, path, init_items=True, add_units=True)
    dst.commit("from workbook")

    assert sorted(dst.set("i")) == ["san-diego", "seattle"]
    assert dst.items("par") == ["a", "b", "d", "f"]
    assert dst.idx_sets("d") == ["i", "j"]
    pd.testing.assert_frame_equal(
        scen.par("d").sort_values(["i", "j"]).reset_index(drop=True),
        dst.par("d").sort_values(["i", "j"]).reset_index(drop=True),
    )
    assert dst.scalar("f") == {"value": 90.0, "unit": "USD/km"}
    # var/equ sheets were written but ignored on read (io.py:318–320)
    assert not dst.has_solution()


def test_workbook_sheet_splitting(mp, tmp_path):
    scen = make_dantzig(mp)
    path = str(tmp_path / "split_wb")
    write_scenario_data(scen, path, max_row=2)  # forces d (6 rows) → 3 sheets
    from ixmp_spark.sources.scenario_io import Workbook

    wb = Workbook.read(path)
    assert {"d", "d(2)", "d(3)"} <= set(wb.sheets)
    dst = Scenario(mp, "canning problem", "split-copy", version="new")
    read_scenario_data(dst, path, init_items=True)
    dst.commit("from split workbook")
    assert len(dst.par("d")) == 6


def test_workbook_two_pass_inference(mp, tmp_path):
    """Indexed set sheet appears before its index set in the workbook →
    the queue defers it (reference io.py:250–308)."""
    scen = make_dantzig(mp)
    scen.check_out()
    scen.init_set("route", idx_sets=["i", "j"])
    scen.add_set("route", [["seattle", "chicago"]])
    scen.commit("route")
    path = str(tmp_path / "wb2")
    write_scenario_data(scen, path)
    dst = Scenario(mp, "canning problem", "two-pass", version="new")
    read_scenario_data(dst, path, init_items=True)
    dst.commit("ok")
    assert len(dst.set("route")) == 1


# -- TS CSV import/export (S5/S6) -----------------------------------------

def test_ts_csv_import(mp, tmp_path):
    mp.add_unit("GWa")
    mp.add_region("World", hierarchy="common")
    csv = tmp_path / "ts.csv"
    csv.write_text(
        "Model,Scenario,Region,Variable,Unit,2010,2020\n"
        "m,s,World,Testing,GWa,27.3,28.3\n"
    )
    ts = TimeSeries(mp, "m", "s", version="new")
    import_timeseries(ts, str(csv), firstyear=2015)
    ts.commit("imported")
    got = ts.timeseries()
    assert got["year"].tolist() == [2020]  # firstyear clamp dropped 2010
    assert got["value"].tolist() == [28.3]


def test_ts_bulk_export(mp, tmp_path):
    mp.add_unit("GWa")
    mp.add_region("World", hierarchy="common")
    for i, (m, s) in enumerate([("m1", "s1"), ("m2", "s2")]):
        ts = TimeSeries(mp, m, s, version="new")
        ts.add_timeseries(
            pd.DataFrame(
                {
                    "region": "World",
                    "variable": ["v1", "v2"],
                    "unit": "GWa",
                    "year": [2020, 2020],
                    "value": [float(i), float(i) + 0.5],
                }
            )
        )
        ts.commit("x")
        ts.set_as_default()
    out = tmp_path / "export.csv"
    export_timeseries_data(mp, str(out), variable="v1")
    got = pd.read_csv(out)
    assert list(got.columns) == [
        "MODEL", "SCENARIO", "VERSION", "REGION", "VARIABLE", "UNIT",
        "SUBANNUAL", "YEAR", "VALUE",
    ]
    assert sorted(got["MODEL"]) == ["m1", "m2"]
    assert (got["VARIABLE"] == "v1").all()
    # model filter
    export_timeseries_data(mp, str(out), model="m1")
    assert pd.read_csv(out)["MODEL"].tolist() == ["m1", "m1"]


# -- reporting engine -----------------------------------------------------

@pytest.fixture()
def rep(mp):
    scen = make_dantzig(mp, solve=True)
    return Reporter.from_scenario(scen), scen


def test_key_parse():
    k = Key.parse("x:i-j")
    assert (k.name, k.dims) == ("x", ("i", "j"))
    assert str(k.drop("j")) == "x:i"


def test_reporter_quantities(rep):
    r, scen = rep
    d = r.get("d:i-j").toPandas()
    assert len(d) == 6
    assert set(d.columns) == {"i", "j", "value"}
    # unit metadata carried (C5/A7)
    assert r.get_quantity("d:i-j").unit == "km"
    assert r.labels["i"] == ["seattle", "san-diego"]


def test_partial_sums(rep):
    """A1: x:i-j → x:i, x:j, x: — computed on demand."""
    r, _ = rep
    by_i = r.get("d:i").toPandas().set_index("i")["value"]
    assert by_i["seattle"] == pytest.approx(2.5 + 1.7 + 1.8)
    total = r.get("d:").toPandas()["value"][0]
    assert total == pytest.approx(11.7)
    # solution quantities incl. -margin keys (report/util.py:60–68)
    x_total = r.get("x:").toPandas()["value"][0]
    assert x_total == pytest.approx(900.0)
    mrg = r.get("x-margin:i-j").toPandas()
    assert len(mrg) == 6


def test_dim_aligned_product(rep):
    """J7: d:i-j * f: broadcasts the scalar over both dims; transport
    cost = sum(d*x)*f/1000... here just d*f shape + unit algebra."""
    r, _ = rep
    r.add_product("df:i-j", "d:i-j", "f:")
    q = r.get_quantity("df:i-j")
    out = q.df.toPandas().set_index(["i", "j"])["value"]
    assert out[("seattle", "new-york")] == pytest.approx(2.5 * 90.0)
    assert q.unit == "USD"  # km * USD/km cancels (C5 unit algebra)
    # full objective: sum over i,j of d*x, times f
    r.add_product("dx:i-j", "d:i-j", "x:i-j")
    cost = r.get(str(Key("dx", ()))).toPandas()["value"][0] * 90.0 / 1000
    assert cost == pytest.approx(153.675)


def test_aggregate_named_groups(rep):
    """A2: map market labels into coasts; sum within group."""
    r, _ = rep
    r.add_aggregate(
        "b_region:j", "b:j", "j",
        {"east": ["new-york"], "central": ["chicago", "topeka"]},
    )
    out = r.get("b_region:j").toPandas().set_index("j")["value"]
    assert out["east"] == 325.0
    assert out["central"] == 575.0


def test_add_with_unit_check(rep):
    r, _ = rep
    r.add_sum("ab:i", "a:i", "a:i")
    out = r.get("ab:i").toPandas().set_index("i")["value"]
    assert out["seattle"] == 700.0
    # adding unlike units raises (C5)
    r.add_sum("bad:i-j", "a:i", "d:i-j")
    with pytest.raises(ValueError, match="units"):
        r.get("bad:i-j")


def test_configure_units_replace_scoped(rep, tmp_path):
    """`units: replace:` from a config file lands in THAT Reporter's
    unit_aliases — not the module-global UNIT_ALIASES — so two Reporters
    in one process can carry different replacement maps."""
    from ixmp_spark.plans.reporter import UNIT_ALIASES, Reporter

    r, scen = rep
    cfg = tmp_path / "units.yaml"
    cfg.write_text("units:\n  replace:\n    passenger_km: pkm\n")
    r.configure(str(cfg))
    assert r.unit_aliases == {"passenger_km": "pkm"}
    assert "passenger_km" not in UNIT_ALIASES
    # a second Reporter is unaffected by the first one's config
    r2 = Reporter.from_scenario(scen)
    assert r2.unit_aliases == {}


def test_select_rename_concat(rep):
    r, _ = rep
    r.add_select("d_sel:i-j", "d:i-j", {"i": ["seattle", "atlantis"]})
    sel = r.get("d_sel:i-j").toPandas()
    assert set(sel["i"]) == {"seattle"}  # non-member silently ignored (F1)
    r.add_rename("d_rn:plant-market", "d:i-j", {"i": "plant", "j": "market"})
    rn = r.get_quantity("d_rn:plant-market")
    assert rn.dims == ("plant", "market")
    assert set(rn.df.columns) == {"plant", "market", "value"}
    r.add_concat("ab:i", "a:i", "a:i")
    assert r.get("ab:i").count() == 4  # unionAll keeps duplicates
    # partial sums registered on derived keys too
    assert r.get("d_sel:").toPandas()["value"][0] == pytest.approx(6.0)


def test_file_input(rep, spark, tmp_path):
    """S9: reporting file input with dim rename (reference
    report-input1.csv shape: extra dim dropped via selection)."""
    r, _ = rep
    csv = tmp_path / "input.csv"
    csv.write_text(
        "i,j_dim,value,unit\n"
        "seattle,new-york,2.5,km\n"
        "seattle,chicago,1.7,km\n"
    )
    r.add_file(
        "d_check:i-j", spark, str(csv), dims=("i", "j"),
        renames={"j_dim": "j"},
    )
    q = r.get_quantity("d_check:i-j")
    assert q.unit == "km"
    got = q.df.toPandas().set_index(["i", "j"])["value"]
    assert got[("seattle", "chicago")] == 1.7


# -- TS <-> report bridge operators (reference report/operator.py:166–393)

def test_ts_operators_roundtrip(mp, spark):
    from ixmp_spark.plans.ts_operators import (
        from_url, get_ts, remove_ts, store_ts, update_scenario,
    )

    scen = make_dantzig(mp)
    mp.add_region("World", hierarchy="common")
    mp.add_unit("GWa")
    # store_ts: one commit, IAMC normalization applied
    df1 = pd.DataFrame(
        {"region": "World", "variable": "Primary Energy", "unit": "GWa",
         "year": [2010, 2020], "value": [1.0, 2.0]}
    )
    df2 = pd.DataFrame(
        {"region": "World", "variable": "GDP", "unit": "GWa",
         "year": [2010], "value": [5.0]}
    )
    store_ts(scen, df1, df2)
    got = get_ts(scen, filters={"variable": "Primary Energy"})
    assert got["value"].tolist() == [1.0, 2.0]
    # non-strict: a bad frame logs + skips, good frames still commit
    bad = pd.DataFrame(
        {"region": "Atlantis", "variable": "X", "unit": "GWa",
         "year": [2010], "value": [9.9]}
    )
    df3 = pd.DataFrame(
        {"region": "World", "variable": "Emissions", "unit": "GWa",
         "year": [2030], "value": [3.0]}
    )
    store_ts(scen, bad, df3)
    assert len(get_ts(scen, filters={"variable": "Emissions"})) == 1
    with pytest.raises(ValueError, match="unknown regions"):
        store_ts(scen, bad, strict=True)
    # remove_ts with after=: only later years go
    remove_ts(scen, after=2020)
    left = get_ts(scen)
    assert sorted(left["year"].unique()) == [2010]
    # update_scenario: computed quantity -> parameter rows via add_par
    upd = pd.DataFrame(
        {"i": ["seattle"], "j": ["topeka"], "value": [9.5], "unit": ["km"]}
    )
    update_scenario(scen, upd, params=["d"])
    assert (
        scen.par("d", filters={"i": "seattle", "j": "topeka"})["value"].iloc[0]
        == 9.5
    )
    # update_scenario from a reporting Quantity (name, qty) pair
    rep = Reporter.from_scenario(scen)
    q = rep.get_quantity("d:i-j")
    update_scenario(scen, ("d", q))
    # rollback on error leaves the scenario checked in
    with pytest.raises(KeyError):
        update_scenario(scen, ("nope", q))
    assert not scen._checked_out
    # from_url
    ts, mp2 = from_url(
        f"ixmp://wh/canning problem/standard#{scen.version}",
        spark,
        platforms={"wh": mp.wh.root},
    )
    assert ts.run_id == scen.run_id


# -- real .xlsx workbooks (S3/S4 file-format contract; sources/xlsx_lite)

def test_xlsx_roundtrip_dantzig(mp, tmp_path):
    """Scenario -> real .xlsx file -> new scenario (reference
    test_scenario.py:601 shape, actual SpreadsheetML this time)."""
    scen = make_dantzig(mp)
    path = str(tmp_path / "dantzig.xlsx")
    scen.to_excel(path)
    import zipfile

    with zipfile.ZipFile(path) as z:  # structurally a real xlsx
        assert "[Content_Types].xml" in z.namelist()
        assert "xl/workbook.xml" in z.namelist()

    dst = Scenario(mp, "canning problem", "xlsx copy", version="new")
    dst.read_excel(path, init_items=True, add_units=True)
    dst.commit("from xlsx")
    assert sorted(dst.set("i")) == ["san-diego", "seattle"]
    assert dst.items("par") == ["a", "b", "d", "f"]
    pd.testing.assert_frame_equal(
        scen.par("d").sort_values(["i", "j"]).reset_index(drop=True),
        dst.par("d").sort_values(["i", "j"]).reset_index(drop=True),
    )
    assert dst.scalar("f") == scen.scalar("f")


def test_xlsx_lite_types_and_escaping(tmp_path):
    from ixmp_spark.sources.xlsx_lite import read_xlsx, write_xlsx

    df = pd.DataFrame(
        {
            "s": ["a<b>&\"'", "multi word", ""],
            "i": [1, 2, 3],
            "f": [1.5, float("nan"), -2.25],
            "mixed": ["x", 1, 2.5],
        }
    )
    empty = pd.DataFrame({"only_header": []})
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, {"data": df, "empty": empty})
    got = read_xlsx(path)
    assert list(got) == ["data", "empty"]
    d = got["data"]
    # empty string round-trips as "" (an omitted/NaN cell reads as None)
    assert d["s"].tolist() == ["a<b>&\"'", "multi word", ""]
    assert d["i"].tolist() == [1, 2, 3] and str(d["i"].dtype) == "int64"
    assert d["f"][0] == 1.5 and d["f"][2] == -2.25 and pd.isna(d["f"][1])
    assert d["mixed"].tolist() == ["x", 1, 2.5]
    assert list(got["empty"].columns) == ["only_header"] and not len(got["empty"])


def test_xlsx_lite_sheet_name_with_quotes(tmp_path):
    """ADVICE r2: a sheet name containing a double quote must produce a
    parseable workbook (sheet names are XML attributes — quoteattr, not
    escape, which leaves '\"' alone)."""
    from ixmp_spark.sources.xlsx_lite import read_xlsx, write_xlsx

    df = pd.DataFrame({"v": [1, 2]})
    path = str(tmp_path / "q.xlsx")
    names = ['has "quotes"', "it's <odd> & fine"]
    write_xlsx(path, {n: df for n in names})
    got = read_xlsx(path)
    assert list(got) == names
    assert got[names[0]]["v"].tolist() == [1, 2]


def test_xlsx_lite_reads_shared_strings(tmp_path):
    """Files written by Excel/openpyxl use a shared-string table — the
    reader must resolve t=\"s\" cells through it."""
    import zipfile

    from ixmp_spark.sources.xlsx_lite import read_xlsx

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    path = str(tmp_path / "ss.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships"><sheets>'
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="t" '
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}"><si><t>col</t></si><si><t>hello</t></si></sst>',
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    got = read_xlsx(path)
    assert got["S"]["col"].tolist() == ["hello"]


def test_reporter_describe(rep):
    """describe(): the dependency tree of a computed key, genno-style."""
    rep, _ = rep
    rep.add_product("cost:i-j", "d:i-j", "f:")
    rep.add_group_sum("total_cost:", "cost:i-j", "i")
    out = rep.describe("total_cost:")
    lines = out.splitlines()
    assert lines[0] == "'total_cost:'"
    assert "'cost:i-j'" in out and "'d:i-j'" in out and "'f:'" in out
    # deeper nodes are indented under their dependents
    assert any(line.startswith("  ") for line in lines)
    # on-demand partial sums describe against their full key
    partial = rep.describe("d:i")
    assert "partial sum" in partial and "'d:i-j'" in partial
    assert "MISSING" in rep.describe("nope:")


def test_jsonl_read_quarantines_corrupt_lines(spark, tmp_path):
    """JSONL corpus ingest: explicit schema, malformed lines land in the
    quarantine frame with their raw text, clean rows parse fully."""
    from ixmp_spark.sources.docs_io import read_documents_jsonl, split_corrupt

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", '
        '"source": "s0", "n_chars": 11}\n'
        "this line is not json at all\n"
        '{"doc_id": 2, "text": "zwei", "lang": "de", '
        '"source": "s1", "n_chars": 4}\n'
        '{"doc_id": 3, "text": "unterminated\n'
    )
    clean, bad = split_corrupt(read_documents_jsonl(spark, str(p)))
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {1: "hello world", 2: "zwei"}
    assert "_corrupt_record" not in clean.columns
    bad_lines = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "not json at all" in bad_lines[0] or "not json at all" in bad_lines[1]


def test_jsonl_blank_lines_are_not_documents(spark, tmp_path):
    """Blank / whitespace-only lines (trailing newline, separator lines)
    must appear in NEITHER the clean nor the quarantine frame: they parse
    to all-null structs with a null _corrupt_record, which previously
    fabricated phantom clean documents and inflated curate's n_in."""
    from ixmp_spark.sources.docs_io import read_documents_jsonl, split_corrupt

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        "\n"  # leading blank
        '{"doc_id": 1, "text": "a", "lang": "en", "source": "s", '
        '"n_chars": 1}\n'
        "   \n"  # whitespace-only separator
        "not json\n"
        '{"doc_id": 2, "text": "b", "lang": "en", "source": "s", '
        '"n_chars": 1}\n'
        "\n\n"  # trailing blanks
    )
    clean, bad = split_corrupt(read_documents_jsonl(spark, str(p)))
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert bad.count() == 1  # only the genuinely malformed line


def test_jsonl_roundtrip_with_part_cap(spark, sf_dir, tmp_path):
    """write → read round-trip preserves the corpus; maxRecordsPerFile
    bounds part size (multiple parts emerge) and gzip parts decompress
    transparently on read."""
    from ixmp_spark.queries import load
    from ixmp_spark.sources.docs_io import (
        read_documents_jsonl,
        split_corrupt,
        write_documents_jsonl,
    )

    docs = load(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus_out")
    write_documents_jsonl(docs.coalesce(1), out, max_records_per_file=40)
    import glob

    parts = glob.glob(out + "/part-*.json.gz")
    assert len(parts) > 1  # the cap split one writer task into many parts
    back, bad = split_corrupt(read_documents_jsonl(spark, out))
    assert bad.count() == 0
    a = {(r["doc_id"], r["text"]) for r in back.collect()}
    b = {(r["doc_id"], r["text"]) for r in docs.collect()}
    assert a == b


def test_reporter_auto_cse(rep):
    """auto_cse (VERDICT r10 #6): the SECOND overlapping partial-sum
    request pins the shared full-dim intermediate transparently — no
    persist_key call — and results are identical to the auto-off path;
    release() empties the pin cache."""
    r, scen = rep
    full = r.full_key("d")
    k1, k2 = str(full.drop(full.dims[-1])), str(full.drop(full.dims[0]))

    # auto OFF: no pins ever
    r.auto_cse = False
    off1 = sorted(map(tuple, r.get(k1).collect()))
    off2 = sorted(map(tuple, r.get(k2).collect()))
    assert str(full) not in r._cache

    # auto ON (the default in a fresh Reporter): first request counts,
    # second pins
    r2 = Reporter.from_scenario(scen)
    assert r2.auto_cse
    on1 = sorted(map(tuple, r2.get(k1).collect()))
    assert str(full) not in r2._cache  # one request proves nothing
    on2 = sorted(map(tuple, r2.get(k2).collect()))
    assert str(full) in r2._cache  # second overlap pinned the source
    assert r2._cache[str(full)].df.storageLevel.useMemory
    assert (on1, on2) == (off1, off2)

    # third request reuses the pin (cache entry unchanged)
    pinned = r2._cache[str(full)]
    r2.get(str(full.drop(*full.dims)))
    assert r2._cache[str(full)] is pinned

    r2.release()
    assert not r2._cache and not r2._hits


def test_reporter_add_evicts_stale_pin(rep):
    """ADVICE r12 (medium): redefining a key via add()/add_quantity()
    after it was auto-CSE-pinned must evict the stale cache entry and
    reset the reuse counter — the new definition wins immediately, as
    in the reference dask graph which always recomputes from the
    current graph (a ``units: apply`` override after two resolutions
    must take effect)."""
    r, _ = rep
    assert r.auto_cse
    k = "d:i-j"
    # resolve twice → pinned
    r.get(k)
    r.get(k)
    assert k in r._cache
    old_vals = sorted(map(tuple, r._cache[k].df.collect()))

    # redefine: same quantity scaled by 10
    from pyspark.sql import functions as F

    from ixmp_spark.plans.reporter import Quantity

    src = r._cache[k]
    scaled = src.df.withColumn("value", F.col("value") * 10)
    r.add(k, lambda: Quantity(scaled, src.dims, src.unit))
    # stale pin evicted and counter reset
    assert k not in r._cache and r._hits.get(k, 0) == 0
    got1 = sorted(map(tuple, r.get(k).collect()))
    assert got1 != old_vals
    assert got1 == sorted((*t[:-1], t[-1] * 10) for t in old_vals)
    # and the NEW definition re-pins on its own second resolution
    r.get(k)
    assert k in r._cache
    assert sorted(map(tuple, r._cache[k].df.collect())) == got1

    # r13 review finding: eviction CASCADES through declared deps — a
    # pinned DOWNSTREAM product computed from the old definition is
    # evicted too, and recomputes from the new one
    r.add_product("dd:i-j", k, k)
    before = sorted(map(tuple, r.get("dd:i-j").collect()))
    r.get("dd:i-j")
    assert "dd:i-j" in r._cache  # pinned on its 2nd resolution
    src2 = r._cache[k]
    scaled2 = src2.df.withColumn("value", F.col("value") * 2)
    r.add(k, lambda: Quantity(scaled2, src2.dims, src2.unit))
    assert "dd:i-j" not in r._cache  # cascade evicted the product
    after = sorted(map(tuple, r.get("dd:i-j").collect()))
    assert after != before  # recomputed from the NEW definition
    r.release()


def test_reporter_add_evicts_pinned_partial_sum(rep):
    """ADVICE r13 (medium): ``persist_key('d:i')`` pins an on-demand
    partial sum that has NO graph entry and NO deps edge — redefining
    the full key ``d:i-j`` must still evict it (its data root is the
    full key), else the pin serves stale data until release()."""
    from pyspark.sql import functions as F

    from ixmp_spark.plans.reporter import Quantity

    r, _ = rep
    r.persist_key("d:i")
    assert "d:i" in r._cache and "d:i" not in r.graph
    old = sorted(map(tuple, r.get("d:i").collect()))

    full = r.get_quantity("d:i-j")
    scaled = full.df.withColumn("value", F.col("value") * 10)
    r.add("d:i-j", lambda: Quantity(scaled, full.dims, full.unit), deps=[])
    assert "d:i" not in r._cache  # partial-sum pin evicted with its root
    got = sorted(map(tuple, r.get("d:i").collect()))
    want = sorted((t[0], t[1] * 10) for t in old)
    assert [t[0] for t in got] == [t[0] for t in want]
    assert [t[1] for t in got] == pytest.approx([t[1] for t in want])
    r.release()


def test_reporter_bare_add_conservative_flush(rep):
    """VERDICT r13 #4: a key registered via bare add() (no deps
    metadata) may read ANY key inside its thunk, so when it is cached
    and something is redefined the precise cascade is unsound —
    add() falls back to a full cache flush and the bare-add product
    recomputes from the new input definition."""
    from pyspark.sql import functions as F

    from ixmp_spark.plans.reporter import Quantity

    r, _ = rep
    # bare add: thunk reads d:i-j but declares nothing
    r.add(
        "hidden:i-j",
        lambda: Quantity(
            r.get("d:i-j").withColumn("value", F.col("value") + 1),
            ("i", "j"),
            None,
        ),
    )
    assert "hidden:i-j" not in r.deps
    before = sorted(map(tuple, r.get("hidden:i-j").collect()))
    r.get("hidden:i-j")
    assert "hidden:i-j" in r._cache  # pinned on its 2nd resolution

    full = r.get_quantity("d:i-j")
    scaled = full.df.withColumn("value", F.col("value") * 3)
    r.add("d:i-j", lambda: Quantity(scaled, full.dims, full.unit), deps=[])
    # conservative: the whole cache flushed (no edge proves independence)
    assert not r._cache and not r._hits
    after = sorted(map(tuple, r.get("hidden:i-j").collect()))
    assert after != before  # recomputed from the NEW definition
    want = sorted((*t[:2], (t[2] - 1) * 3 + 1) for t in before)
    assert [t[:2] for t in after] == [t[:2] for t in want]
    assert [t[2] for t in after] == pytest.approx([t[2] for t in want])
    r.release()


def test_reporter_bare_redefinition_resets_deps(rep):
    """ADVICE r13 (low): redefining a key via bare add() must drop the
    previous definition's deps edges — describe() and future cascades
    adjudicate on the CURRENT graph, not the old one."""
    r, _ = rep
    r.add_product("p:i-j", "d:i-j", "d:i-j")
    assert r.deps["p:i-j"] == ["d:i-j", "d:i-j"]
    q = r.get_quantity("p:i-j")
    r.add("p:i-j", lambda: q)  # bare redefinition — e.g. a literal pin
    assert "p:i-j" not in r.deps
    r.release()


def test_reporter_deps_through_partial_sum(rep):
    """A declared dep naming a PARTIAL-SUM key ('d:i') must cascade
    when the full key ('d:i-j') is redefined — the partial sum's data
    root is the full key."""
    from pyspark.sql import functions as F

    from ixmp_spark.plans.reporter import Quantity

    r, _ = rep
    r.add_group_sum("g:i", "d:i-j", "i")  # deps=['d:i-j'] — control
    r.add(
        "viaps:i",
        lambda: Quantity(r.get("d:i"), ("i",), None),
        deps=["d:i"],  # edge on the PARTIAL sum, not the full key
    )
    before = sorted(map(tuple, r.get("viaps:i").collect()))
    r.get("viaps:i")
    assert "viaps:i" in r._cache

    full = r.get_quantity("d:i-j")
    scaled = full.df.withColumn("value", F.col("value") * 5)
    r.add("d:i-j", lambda: Quantity(scaled, full.dims, full.unit), deps=[])
    assert "viaps:i" not in r._cache  # cascaded through the root
    after = sorted(map(tuple, r.get("viaps:i").collect()))
    want = sorted((t[0], t[1] * 5) for t in before)
    assert [t[0] for t in after] == [t[0] for t in want]
    assert [t[1] for t in after] == pytest.approx([t[1] for t in want])
    r.release()


def test_reporter_auto_cse_graph_keys(rep):
    """auto_cse widened to EVERY graph key (VERDICT r11 #5): a quantity
    requested through two binary ops — not partial sums — pins on its
    second resolution, exactly the reference dask graph's memoization;
    results match the auto-off run and release() tears down."""
    _, scen = rep

    def build(auto):
        r = Reporter.from_scenario(scen)
        r.auto_cse = auto
        r.add_product("dd:i-j", "d:i-j", "d:i-j")
        r.add_ratio("unit1:i-j", "d:i-j", "d:i-j")
        return r

    r_off = build(False)
    off = [
        sorted(map(tuple, r_off.get(k).collect()))
        for k in ("dd:i-j", "unit1:i-j")
    ]
    assert not r_off._cache

    r_on = build(True)
    got = [
        sorted(map(tuple, r_on.get(k).collect()))
        for k in ("dd:i-j", "unit1:i-j")
    ]
    assert got == off
    # d:i-j resolved 4x (twice per binary op) — pinned at the 2nd
    assert "d:i-j" in r_on._cache
    assert r_on._cache["d:i-j"].df.storageLevel.useMemory
    # the binary-op keys themselves were each requested once — unpinned
    assert "dd:i-j" not in r_on._cache and "unit1:i-j" not in r_on._cache

    # a repeated request of a computed key pins IT too
    r_on.get("dd:i-j")
    assert "dd:i-j" in r_on._cache

    r_on.release()
    assert not r_on._cache and not r_on._hits


def test_reporter_unrelated_pin_survives_redefinition(rep):
    """The precision half of the r14 eviction design: when every
    cached key declares deps (leaves register deps=[]), redefining one
    key must NOT flush pins on unrelated keys — the conservative
    full-cache flush is reserved for caches holding bare-add keys."""
    from pyspark.sql import functions as F

    from ixmp_spark.plans.reporter import Quantity

    r, _ = rep
    r.persist_key("a:i")  # a declared leaf (deps=[]), pinned
    r.persist_key("b:j")
    assert "b:j" in r._cache
    pinned = r._cache["b:j"]

    full = r.get_quantity("d:i-j")
    scaled = full.df.withColumn("value", F.col("value") * 2)
    r.add("d:i-j", lambda: Quantity(scaled, full.dims, full.unit), deps=[])
    # d's subtree evicted; a/b pins untouched (same object, still pinned)
    assert r._cache.get("b:j") is pinned
    assert "a:i" in r._cache
    r.release()
