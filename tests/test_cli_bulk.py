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
                "--scenario", "standard", "import", "timeseries", str(csv),
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


def test_cli_platform_and_config_groups(tmp_path, capsys, monkeypatch):
    """Reference cli.py:191–218 (config get/set/show) and 335–365
    (platform add/remove/list) over the warehouse-root config notion."""
    import importlib

    monkeypatch.setenv("IXMP_SPARK_DATA", str(tmp_path / "cfg"))
    import ixmp_spark.config as cfgmod

    importlib.reload(cfgmod)

    wh = tmp_path / "wh-root"
    wh.mkdir()
    assert cli_main(["platform", "add", "prod", "warehouse", str(wh)]) == 0
    assert "Added platform" in capsys.readouterr().out
    assert cli_main(["platform", "add", "default", "prod"]) == 0
    capsys.readouterr()
    assert cli_main(["platform", "list"]) == 0
    out = capsys.readouterr().out
    assert "prod" in out and str(wh) in out

    # the registered name resolves for real commands
    assert cli_main(["--platform", "prod", "list"]) == 0
    assert "no scenarios" in capsys.readouterr().out

    # config get/set/show
    assert cli_main(["config", "get", "platform"]) == 0
    assert "prod" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="No registered"):
        cli_main(["config", "set", "nokey", "v"])
    cfgmod.config.register("mykey", str)
    assert cli_main(["config", "set", "mykey", "myval"]) == 0
    capsys.readouterr()
    assert cli_main(["config", "show"]) == 0
    out = capsys.readouterr().out
    assert "mykey" in out and "myval" in out

    # remove
    assert cli_main(["platform", "remove", "prod"]) == 0
    with pytest.raises(SystemExit, match="not among"):
        cli_main(["--platform", "prod", "list"])
    importlib.reload(cfgmod)  # drop the test registry for later tests


def test_cli_import_scenario_and_export_excel(mp, tmp_path, capsys):
    """Reference cli.py:300–331: export scenario data to .xlsx with
    filters, then import it into a fresh scenario via the CLI."""
    make_dantzig(mp)
    root = str(mp.wh.root)
    xlsx = tmp_path / "dump.xlsx"
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "export-excel", str(xlsx),
                "i=seattle",
            ]
        )
        == 0
    )
    from ixmp_spark.sources.xlsx_lite import read_xlsx

    sheets = read_xlsx(str(xlsx))
    assert sheets["d"]["i"].unique().tolist() == ["seattle"]
    # filters apply to pars ONLY (reference io.py:94–102): the set sheet
    # keeps every member
    assert sorted(sheets["i"][sheets["i"].columns[0]]) == [
        "san-diego", "seattle"
    ]

    # full export → CLI import into a new scenario (init_items)
    full = tmp_path / "full.xlsx"
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "export-excel", str(full),
            ]
        )
        == 0
    )
    from ixmp_spark.core import Scenario

    Scenario(mp, "canning problem", "cli-import", version="new").commit("init")
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "cli-import", "import", "scenario", str(full),
                "--init-items", "--add-units",
            ]
        )
        == 0
    )
    dst = Scenario(mp, "canning problem", "cli-import")
    assert sorted(dst.set("i")) == ["san-diego", "seattle"]
    assert dst.items("par") == ["a", "b", "d", "f"]


def test_cli_report_output_and_url(mp, tmp_path, capsys, monkeypatch):
    """report --output writes csv/xlsx (Reporter.write); --url selects
    platform+scenario in one argument (reference cli.py:71–118)."""
    make_dantzig(mp)
    root = str(mp.wh.root)
    out_csv = tmp_path / "d.csv"
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "report", "d:i-j",
                "--output", str(out_csv),
            ]
        )
        == 0
    )
    got = pd.read_csv(out_csv)
    assert set(got.columns) == {"i", "j", "value", "unit"}
    assert len(got) == 6 and (got["unit"] == "km").all()

    out_xlsx = tmp_path / "d.xlsx"
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "report", "d:i-j",
                "-o", str(out_xlsx),
            ]
        )
        == 0
    )
    from ixmp_spark.sources.xlsx_lite import read_xlsx

    sheets = read_xlsx(str(out_xlsx))
    assert len(next(iter(sheets.values()))) == 6

    # --url: ixmp://PLATFORM/MODEL/SCENARIO with a registered platform
    # name (reference URLs address platforms by configured name)
    import importlib

    monkeypatch.setenv("IXMP_SPARK_DATA", str(tmp_path / "cfg"))
    import ixmp_spark.config as cfgmod

    importlib.reload(cfgmod)
    assert cli_main(["platform", "add", "cp", "warehouse", root]) == 0
    capsys.readouterr()
    assert (
        cli_main(["--url=ixmp://cp/canning problem/standard", "report", "d:i"])
        == 0
    )
    assert "seattle" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="redundant"):
        cli_main(["--url", "ixmp://cp/m/s", "--model", "m2", "list"])
    capsys.readouterr()
    assert cli_main(["show-versions"]) == 0
    assert "pyspark" in capsys.readouterr().out
    importlib.reload(cfgmod)


def test_cli_report_config(mp, tmp_path, capsys):
    """Reference-style report config file (tests/data/report-config-0.yaml;
    reference tests/report/test_reporter.py:193–204 expected shape)."""
    import re

    make_dantzig(mp)
    root = str(mp.wh.root)
    (tmp_path / "report-input0.csv").write_text(
        "i,j,value\n"
        "seattle,new-york,2.5\nseattle,chicago,1.7\nseattle,topeka,1.8\n"
        "san-diego,new-york,2.5\nsan-diego,chicago,1.8\nsan-diego,topeka,1.4\n"
    )
    (tmp_path / "report-input1.csv").write_text(
        "i,j_dim,foo,value,unit\n"
        "seattle,new-york,foo,2.5,km\nseattle,chicago,foo,1.7,km\n"
        "seattle,topeka,foo,1.8,km\nsan-diego,new-york,foo,2.5,km\n"
        "san-diego,chicago,foo,1.8,km\nsan-diego,topeka,foo,1.4,km\n"
    )
    cfg = tmp_path / "report-config-0.yaml"
    cfg.write_text(
        "default: d_check\n"
        "files:\n"
        "- path: ./report-input0.csv\n"
        "  key: d_check\n"
        "- path: ./report-input1.csv\n"
        "  key: report-input1-0\n"
        "  dims: [i, j_dim]\n"
        "- path: ./report-input1.csv\n"
        "  key: report-input1-1\n"
        "  dims: {i: i, j_dim: j}\n"
        "alias:\n"
        "  bar: d\n"
        "notarealsection:\n"
        "- 0\n"
    )
    base = [
        "--platform", root, "--model", "canning problem",
        "--scenario", "standard", "report", "--config", str(cfg),
    ]
    # explicit key → the file-backed quantity, reference output shape
    assert cli_main(base + ["d_check"]) == 0
    out = capsys.readouterr().out
    assert re.search(
        r"i\s+j\s*\n"
        r"san-diego\s+chicago\s+1\.8\s*\n"
        r"\s+new-york\s+2\.5\s*\n"
        r"\s+topeka\s+1\.4\s*\n"
        r"seattle\s+chicago\s+1\.7\s*\n"
        r"\s+new-york\s+2\.5\s*\n"
        r"\s+topeka\s+1\.8\s*\n"
        r"Name: value, dtype: float64, units: dimensionless",
        out,
    ), out
    # no key → the config's default
    assert cli_main(base) == 0
    assert "san-diego" in capsys.readouterr().out
    # dims-as-list drops the extra CSV column; unit inferred from file
    assert cli_main(base + ["report-input1-0"]) == 0
    out = capsys.readouterr().out
    assert "j_dim" in out and "units: km" in out
    # dims-as-dict renames j_dim → j
    assert cli_main(base + ["report-input1-1"]) == 0
    out = capsys.readouterr().out
    assert "j_dim" not in out and "units: km" in out
    # alias resolves to the existing scenario quantity
    assert cli_main(base + ["bar:i-j"]) == 0
    assert "seattle" in capsys.readouterr().out


def test_cli_import_error_paths(mp, tmp_path, capsys):
    """Reference cli.py:314–331: a solution-bearing scenario imported
    without --discard-solution shows a clean message (not a traceback);
    with the flag the import proceeds; report --output with an unknown
    extension is likewise a clean SystemExit."""
    make_dantzig(mp, solve=True)
    root = str(mp.wh.root)
    full = tmp_path / "full.xlsx"
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "export-excel", str(full),
            ]
        )
        == 0
    )
    with pytest.raises(SystemExit, match="solution"):
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "import", "scenario", str(full),
            ]
        )
    assert (
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "import", "scenario", str(full),
                "--discard-solution",
            ]
        )
        == 0
    )
    with pytest.raises(SystemExit, match="unsupported output format"):
        cli_main(
            [
                "--platform", root, "--model", "canning problem",
                "--scenario", "standard", "report", "d:i-j",
                "--output", str(tmp_path / "out.txt"),
            ]
        )


def test_cli_curate_end_to_end(spark, tmp_path, capsys):
    """`curate` runs the full corpus pipeline file-to-file: jsonl in
    (corrupt line quarantined), Gopher gates, exact dedup, parquet out —
    and reports honest counts."""
    from ixmp_spark.cli import main as cli_main

    good = (
        "the quick brown fox jumps over that lazy dog with great energy "
        "and a steady purpose every single day"
    )
    lines = [
        '{"doc_id": 1, "text": "%s", "lang": "en", "source": "s", "n_chars": 1}' % good,
        '{"doc_id": 2, "text": "%s", "lang": "en", "source": "s", "n_chars": 1}' % good,
        '{"doc_id": 3, "text": "### ... ###", "lang": "en", "source": "s", "n_chars": 1}',
        "{corrupt",
    ]
    src = tmp_path / "corpus.jsonl"
    src.write_text("\n".join(lines) + "\n")
    out = tmp_path / "curated"
    rc = cli_main(
        ["curate", str(src), str(out), "--min-words", "5"]
    )
    assert rc == 0
    msg = capsys.readouterr().out
    assert "read 3 docs (1 corrupt lines quarantined), kept 1" in msg
    got = spark.read.parquet(str(out)).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1  # dup kept min id
    # jsonl output + no-dedup keeps both copies of the good doc
    out2 = tmp_path / "curated2"
    rc = cli_main(
        ["curate", str(src), str(out2), "--min-words", "5",
         "--no-dedup", "--out-format", "jsonl"]
    )
    assert rc == 0
    assert "kept 2" in capsys.readouterr().out
    # re-ingest the Spark-written JSONL output (layout: _SUCCESS +
    # part-*.json[.gz]) — the _SUCCESS marker must not make the sniffer
    # misread it as parquet
    import os

    assert os.path.exists(out2 / "_SUCCESS")
    out3 = tmp_path / "curated3"
    rc = cli_main(
        ["curate", str(out2), str(out3), "--min-words", "5", "--no-dedup"]
    )
    assert rc == 0
    assert "read 2 docs" in capsys.readouterr().out
    assert spark.read.parquet(str(out3)).count() == 2


def test_cli_curate_quarantine_output(spark, tmp_path, capsys):
    """--quarantine persists the rejects (raw line + parsed fields) as
    JSONL for reprocessing, and the counts line reflects the number
    actually written."""
    import glob
    import json

    from ixmp_spark.cli import main as cli_main

    good = (
        "the quick brown fox jumps over that lazy dog with great energy "
        "and a steady purpose every single day"
    )
    src = tmp_path / "c.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "%s", "lang": "en", "source": "s", '
        '"n_chars": 1}\n{bad json\nworse\n' % good
    )
    qdir = tmp_path / "rejects"
    rc = cli_main(
        ["curate", str(src), str(tmp_path / "out"), "--min-words", "5",
         "--quarantine", str(qdir)]
    )
    assert rc == 0
    assert "(2 corrupt lines quarantined)" in capsys.readouterr().out
    rows = []
    for f in glob.glob(str(qdir / "part-*")):
        rows += [json.loads(line) for line in open(f) if line.strip()]
    assert sorted(r["_corrupt_record"] for r in rows) == ["worse", "{bad json"]


def test_cli_export_shards_end_to_end(spark, tmp_path, capsys):
    """export-shards: JSONL corpus -> gated, deduped, packed, shuffled
    training shards in one command. The test reconstructs the packing
    invariant from the written files: within every shard, walking rows
    in (seq, tok_offset) order, each document's first token lands at
    exactly (running tokens so far) — i.e. seq*capacity + tok_offset is
    the shard's cumulative token count. Gated and duplicate docs are
    absent; the honest-counts line matches the files."""
    import re

    from ixmp_spark.cli import main as cli_main

    words = lambda n, tag: " ".join(  # noqa: E731
        ("the quick brown fox and some lazy dog with it".split())[i % 9]
        + (tag if i == 0 else "")
        for i in range(n)
    )
    lines = []
    for i in range(40):
        lines.append(
            '{"doc_id": %d, "text": "%s", "lang": "en", "source": "s", '
            '"n_chars": 1}' % (i, words(20 + i, f"u{i}"))
        )
    # exact duplicate of doc 0 under a new id -> deduped
    lines.append(lines[0].replace('"doc_id": 0', '"doc_id": 900'))
    # too-short doc -> gated out
    lines.append(
        '{"doc_id": 901, "text": "tiny", "lang": "en", "source": "s", '
        '"n_chars": 4}'
    )
    src = tmp_path / "corpus.jsonl"
    src.write_text("\n".join(lines) + "\n")
    out = tmp_path / "shards"
    rc = cli_main(
        ["export-shards", str(src), str(out), "--min-words", "10",
         "--capacity", "64", "--n-shards", "4"]
    )
    assert rc == 0
    msg = capsys.readouterr().out
    m = re.search(
        r"read 42 docs \(0 corrupt lines quarantined\), kept (\d+); "
        r"packed (\d+) tokens into (\d+) sequences of 64 across (\d+) shards",
        msg,
    )
    assert m, msg
    n_kept, n_toks, n_seqs, n_shards = map(int, m.groups())
    assert n_kept == 40  # dup + tiny doc gone
    back = spark.read.parquet(str(out)).toPandas()
    assert len(back) == 40
    assert back["doc_id"].is_unique and 900 not in set(back["doc_id"])
    assert 901 not in set(back["doc_id"])
    assert back["n_tokens"].sum() == n_toks
    assert back["shard"].nunique() == n_shards
    # the packing invariant, reconstructed from the files per shard
    total_seqs = 0
    for shard, g in back.groupby("shard"):
        g = g.sort_values(["seq", "tok_offset"]).reset_index(drop=True)
        running = 0
        for _, r in g.iterrows():
            assert r["seq"] * 64 + r["tok_offset"] == running, (shard, dict(r))
            running += r["n_tokens"]
        total_seqs += g["seq"].nunique()
    assert total_seqs == n_seqs


def test_cli_export_shards_split_long_docs(spark, tmp_path, capsys):
    """--split-long-docs: a document longer than --capacity chunks into
    capacity-token units before packing (no packed unit exceeds one
    sequence), and reassembling a doc's chunks in chunk_idx order
    restores its full token stream."""
    from ixmp_spark.cli import main as cli_main

    base = (
        "the quick brown fox and some lazy dog with it over that "
    )  # 12 words incl. stopwords -> passes gates when repeated
    long_text = (base * 30).strip()  # 360 tokens
    short_text = (base * 2).strip()  # 24 tokens
    src = tmp_path / "c.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "%s", "lang": "en", "source": "s", '
        '"n_chars": 1}\n'
        '{"doc_id": 2, "text": "%s", "lang": "en", "source": "s", '
        '"n_chars": 1}\n' % (long_text, short_text)
    )
    out = tmp_path / "shards"
    rc = cli_main(
        ["export-shards", str(src), str(out), "--min-words", "10",
         "--capacity", "64", "--n-shards", "2", "--no-dedup",
         "--split-long-docs"]
    )
    assert rc == 0
    back = spark.read.parquet(str(out)).toPandas()
    assert (back["n_tokens"] <= 64).all()
    d1 = back[back["doc_id"] == 1].sort_values("chunk_idx")
    assert len(d1) == 6  # ceil(360/64) chunks, last one short
    assert d1["n_tokens"].sum() == 360
    rebuilt = " ".join(d1["text"])
    assert rebuilt == long_text.lower()
    assert len(back[back["doc_id"] == 2]) == 1
    # composition guard: BPE + split is an explicit error, not silence
    import pytest

    with pytest.raises(SystemExit, match="cannot compose"):
        cli_main(
            ["export-shards", str(src), str(tmp_path / "x"),
             "--split-long-docs", "--bpe-merges", "8"]
        )


def test_sniff_jsonl_directory_evidence(tmp_path):
    """Directory sniffing weighs positive parquet evidence over 'any
    jsonl-ish entry': a parquet dataset with a stray .json metadata
    sidecar is parquet, a partitioned JSONL dir whose top level holds
    only key=val/ subdirectories is JSONL, and an empty dir fails loudly
    instead of falling through to an unrelated parquet-read error.
    _SUCCESS is format-neutral — Spark writes it for EVERY format, so a
    Spark-written JSONL dataset (_SUCCESS + part-*.json.gz) must still
    sniff as JSONL."""
    from ixmp_spark.cli import _sniff_jsonl

    pq = tmp_path / "pq_with_sidecar"
    pq.mkdir()
    (pq / "part-00000.parquet").write_bytes(b"PAR1")
    (pq / "metadata.json").write_text("{}")
    assert _sniff_jsonl(str(pq)) is False

    # Spark parquet layout: _SUCCESS + part-*.parquet → parquet
    spq = tmp_path / "spark_parquet"
    spq.mkdir()
    (spq / "_SUCCESS").write_bytes(b"")
    (spq / "part-00000-abc.snappy.parquet").write_bytes(b"PAR1")
    assert _sniff_jsonl(str(spq)) is False

    # Spark JSONL layout: _SUCCESS + part-*.json.gz → JSONL, NOT parquet
    # (the _SUCCESS marker alone must not count as parquet evidence)
    sjl = tmp_path / "spark_jsonl"
    sjl.mkdir()
    (sjl / "_SUCCESS").write_bytes(b"")
    (sjl / "part-00000-abc.json.gz").write_bytes(b"\x1f\x8b")
    assert _sniff_jsonl(str(sjl)) is True

    part = tmp_path / "jl_partitioned"
    (part / "lang=en").mkdir(parents=True)
    (part / "lang=en" / "chunk0.jsonl").write_text('{"a":1}\n')
    assert _sniff_jsonl(str(part)) is True

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="cannot infer input format"):
        _sniff_jsonl(str(empty))


def test_cli_curate_input_format_sniff(spark, tmp_path, capsys):
    """Format sniffing for file inputs goes strictly by extension: a
    single .parquet FILE reads as parquet (previously any non-directory
    was parsed as JSONL, quarantining binary parquet rows as corrupt),
    and an extension the sniffer cannot classify fails loudly."""
    import pytest

    from ixmp_spark.cli import main as cli_main

    good = (
        "the quick brown fox jumps over that lazy dog with great energy "
        "and a steady purpose every single day"
    )
    pq_dir = tmp_path / "one_part"
    spark.createDataFrame(
        [(1, good, "en", "s", len(good))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(pq_dir))
    import glob
    import shutil

    part = glob.glob(str(pq_dir / "part-*.parquet"))[0]
    single = tmp_path / "corpus.parquet"
    shutil.copy(part, single)
    out = tmp_path / "curated_pq"
    rc = cli_main(["curate", str(single), str(out), "--min-words", "5"])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "read 1 docs" in msg and "kept 1" in msg
    assert spark.read.parquet(str(out)).count() == 1
    # unknown extension: loud failure, not silent misparse
    mystery = tmp_path / "corpus.bin"
    mystery.write_bytes(b"\x00\x01\x02")
    with pytest.raises(SystemExit, match="cannot infer input format"):
        cli_main(["curate", str(mystery), str(tmp_path / "x")])


def test_unit_parsing_pint_semantics():
    """Unit-parser upgrade toward pint (reference report/util.py
    parse_units + test_reporter.py:86–154, minus pint-exclusive
    auto-definition): invalid characters raise the reference's message
    shape; long names/spellings alias to one symbol so algebra sees
    'kilometers' ≡ 'km'; derived units expand to base form for the ADD
    compatibility check ('J/s' + 'W' accepted) while mul/div keep
    surface symbols; prefixed symbols stay opaque (kW + W must NOT be
    treated as equal — the algebra tracks symbols, not magnitudes); and
    the replacement map is runtime-extensible (config-driven)."""
    import re

    from ixmp_spark.plans.reporter import (
        UNIT_ALIASES,
        register_unit_aliases,
        _unit_exponents,
    )

    for bad, chars in (("-", "-"), ("???", "?")):
        with pytest.raises(
            ValueError,
            match=rf"unit '{re.escape(bad)}' cannot be parsed; contains "
            rf"invalid character\(s\) '{re.escape(chars)}'",
        ):
            _unit_exponents(bad)

    # alias normalization: long spellings cancel against symbols
    assert _combine_units("kilometers", "USD/km", "mul") == "USD"
    assert _combine_units("USD/kilometre", "USD/km", "add") == "USD/kilometre"
    # dimensional equivalence on add: J/s == W, Hz == 1/s
    assert _combine_units("J/s", "W", "add") == "J/s"
    assert _combine_units("Hz", "1/s", "add") == "Hz"
    # prefixed symbols stay distinct — no silent magnitude mixing
    with pytest.raises(ValueError, match="cannot add"):
        _combine_units("kW", "W", "add")
    # mul/div keep surface symbols (no surprise base-unit rewrites)
    assert _combine_units("W", "s", "mul") == "W*s"

    # config-driven replacement map — global form is explicit opt-in
    assert "pkm" not in UNIT_ALIASES
    register_unit_aliases({"passenger_km": "pkm"})
    try:
        assert _combine_units("USD/passenger_km", "USD/pkm", "add") == (
            "USD/passenger_km"
        )
    finally:
        UNIT_ALIASES.pop("passenger_km", None)

    # per-Reporter scoping: replacements passed via into= (the
    # Reporter.configure path) thread through the aliases parameter and
    # never touch the module-global map, so a second Reporter in the
    # same process is unaffected
    scoped: dict = {}
    register_unit_aliases({"passenger_km": "pkm"}, into=scoped)
    assert "passenger_km" not in UNIT_ALIASES
    assert _combine_units(
        "USD/passenger_km", "USD/pkm", "add", aliases=scoped
    ) == "USD/passenger_km"
    # without the scoped map the same add is rejected (symbols differ)
    with pytest.raises(ValueError, match="cannot add"):
        _combine_units("USD/passenger_km", "USD/pkm", "add")


def test_cli_curate_orc_round_trip(spark, tmp_path, capsys):
    """curate --out-format orc writes a Spark-native ORC dataset whose
    _SUCCESS marker stays format-neutral for the sniffer; re-ingesting
    the ORC directory (and a bare .orc file path rule) works end to
    end, and the three-way sniffer prefers columnar evidence over a
    stray .json sidecar."""
    import os

    from ixmp_spark.cli import _sniff_format
    from ixmp_spark.cli import main as cli_main

    good = (
        "the quick brown fox jumps over that lazy dog with great "
        "energy and a steady purpose every single day"
    )
    lines = [
        '{"doc_id": 1, "text": "%s", "lang": "en", "source": "s"}' % good,
        '{"doc_id": 2, "text": "%s and night", "lang": "en", '
        '"source": "s"}' % good,
    ]
    src = tmp_path / "corpus.jsonl"
    src.write_text("\n".join(lines) + "\n")
    out = tmp_path / "curated_orc"
    rc = cli_main(
        ["curate", str(src), str(out), "--min-words", "5",
         "--no-dedup", "--out-format", "orc"]
    )
    assert rc == 0
    assert "kept 2" in capsys.readouterr().out
    assert os.path.exists(out / "_SUCCESS")
    assert any(f.endswith(".orc") for f in os.listdir(out))
    assert _sniff_format(str(out)) == "orc"

    out2 = tmp_path / "curated_back"
    rc = cli_main(
        ["curate", str(out), str(out2), "--min-words", "5", "--no-dedup"]
    )
    assert rc == 0
    assert "read 2 docs" in capsys.readouterr().out
    assert spark.read.parquet(str(out2)).count() == 2

    # sidecar noise must not flip the sniffer's decision (Spark's own
    # directory reader is a separate concern)
    (out / "meta.json").write_text("{}")
    assert _sniff_format(str(out)) == "orc"
