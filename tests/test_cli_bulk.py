"""CLI surface + Spark-native bulk TS path + unit algebra."""

from __future__ import annotations

import pandas as pd
import pytest

from ixmp_spark.cli import main as cli_main
from ixmp_spark.core import Platform, TimeSeries
from ixmp_spark.plans.reporter import _combine_units
from ixmp_spark.testing import make_dantzig


@pytest.fixture()
def mp(spark, tmp_path):
    return Platform(spark, str(tmp_path / "wh"))


def test_bulk_ts_ingest(mp, spark, sf_dir):
    """add_timeseries_bulk: distributed validate + append; read back via
    timeseries_spark with pushdown filters."""
    mp.add_unit("GWa")
    mp.add_region("World", hierarchy="common")
    ts = TimeSeries(mp, "bulk", "test", version="new")
    src = spark.createDataFrame(
        pd.DataFrame(
            {
                "region": "World",
                "variable": [f"v{i % 10}" for i in range(1000)],
                "unit": "GWa",
                "year": [2000 + (i % 50) for i in range(1000)],
                "value": [float(i) for i in range(1000)],
            }
        )
    )
    ts.add_timeseries_bulk(src)
    ts.commit("bulk ingest")
    # key = (region, variable, unit, subannual, year); v3 appears at years
    # 2003/2013/2023/2033/2043 → 5 surviving rows after key dedup
    assert ts.timeseries_spark(variable="v3").count() == 5
    got = ts.timeseries_spark(variable=["v1", "v2"], year=[2001, 2002])
    assert got.count() == 2  # (v1,2001),(v2,2002) keys exist once each
    ts.preload_timeseries()


def test_bulk_validation(mp, spark):
    mp.add_unit("GWa")
    mp.add_region("World", hierarchy="common")
    ts = TimeSeries(mp, "bulk", "bad", version="new")
    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "region": ["Atlantis"],
                "variable": ["v"],
                "unit": ["GWa"],
                "year": [2020],
                "value": [1.0],
            }
        )
    )
    with pytest.raises(ValueError, match="unknown regions"):
        ts.add_timeseries_bulk(bad)
    ts.discard_changes()


def test_bulk_synonym_resolution(mp, spark):
    mp.add_unit("GWa")
    mp.add_region("World", hierarchy="common")
    mp.add_region_synonym("Earth", "World")
    ts = TimeSeries(mp, "bulk", "syn", version="new")
    src = spark.createDataFrame(
        pd.DataFrame(
            {
                "region": ["Earth"],
                "variable": ["v"],
                "unit": ["GWa"],
                "year": [2020],
                "value": [1.0],
            }
        )
    )
    ts.add_timeseries_bulk(src)
    ts.commit("syn bulk")
    assert ts.timeseries()["region"].tolist() == ["World"]


def test_unit_algebra():
    assert _combine_units("km", "USD/km", "mul") == "USD"
    assert _combine_units("USD", "km", "div") == "USD/km"
    assert _combine_units("USD/km", "USD/km", "add") == "USD/km"
    assert _combine_units("km*km", "km", "div") == "km"
    assert _combine_units("km", "km", "div") == ""
    with pytest.raises(ValueError):
        _combine_units("km", "USD", "add")


def test_cli_list_report_export(mp, tmp_path, capsys):
    make_dantzig(mp)
    root = str(mp.wh.root)
    assert cli_main(["--platform", root, "list", "--match", "canning"]) == 0
    out = capsys.readouterr().out
    assert "canning problem" in out and "1" in out

    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "report", "d:i",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "seattle" in out

    # import then export round-trip through the CLI
    csv = tmp_path / "in.csv"
    csv.write_text(
        "Model,Scenario,Region,Variable,Unit,2010,2020\n"
        "x,y,DantzigLand,GDP,USD,1.5,2.5\n"
    )
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "import", str(csv),
            ]
        )
        == 0
    )
    outcsv = tmp_path / "out.csv"
    assert (
        cli_main(["--platform", root, "export", str(outcsv), "--export-all-runs"])
        == 0
    )
    got = pd.read_csv(outcsv)
    assert got["VALUE"].tolist() == [1.5, 2.5]
