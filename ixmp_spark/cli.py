"""Command-line interface (reference ixmp/cli.py:71–393 surface).

Verbs mirror the reference CLI:

- ``list`` — scenario registry (cli.py:330)
- ``export`` — bulk TS CSV (platform.export_timeseries_data surface)
- ``export-excel`` — scenario data to .xlsx w/ filters (cli.py:229–258)
- ``import timeseries FILE`` — TS CSV/Excel (cli.py:300–312)
- ``import scenario FILE`` — Excel scenario data incl. ``--init-items``
  / ``--add-units`` / ``--discard-solution`` / ``--commit-steps``
  (cli.py:314–331)
- ``report [KEY] [--config YAML] [--output PATH]`` — compute a reporting
  key, optionally writing the result file (cli.py:120–142)
- ``solve`` — run a registered model (cli.py:247)
- ``platform add|remove|list`` — platform registry (cli.py:335–365)
- ``config get|set|show`` — configuration keys (cli.py:191–218)
- ``show-versions`` (cli.py:145)

``--platform`` accepts a warehouse root path OR a name registered via
``platform add NAME warehouse PATH``; ``--url ixmp://PLATFORM/MODEL/
SCENARIO[#VERSION]`` combines platform+scenario selection (cli.py:71–118).

    python -m ixmp_spark.cli --platform /path/to/wh list --match canning
    python -m ixmp_spark.cli platform add prod warehouse /data/wh
    python -m ixmp_spark.cli --url ixmp://prod/M/S report "d:i" -o out.csv
"""

from __future__ import annotations

import argparse
import os
import sys


_JSONL_EXTS = (".json", ".json.gz", ".jsonl", ".jsonl.gz")


def _sniff_format(path: str) -> str:
    """Three-way input sniff: 'parquet' | 'orc' | 'jsonl', same
    evidence rules as :func:`_sniff_jsonl` (which this generalizes —
    columnar extensions are checked before jsonl-ish ones, _SUCCESS
    stays format-neutral, no evidence fails loudly)."""
    if os.path.isdir(path):
        levels = [os.listdir(path)]
        levels.append([
            os.path.join(d, f)
            for d in levels[0]
            if os.path.isdir(os.path.join(path, d))
            for f in os.listdir(os.path.join(path, d))
        ])
        entries = [f for lvl in levels for f in lvl]
        if any(f.endswith(".parquet") for f in entries):
            return "parquet"
        if any(f.endswith(".orc") for f in entries):
            return "orc"
        if any(f.endswith(_JSONL_EXTS) for f in entries):
            return "jsonl"
        raise SystemExit(
            f"cannot infer input format of directory {path!r}: no "
            "*.parquet, no *.orc and no *.jsonl entries at the top two "
            "levels (_SUCCESS alone is format-neutral)"
        )
    if path.endswith(".parquet"):
        return "parquet"
    if path.endswith(".orc"):
        return "orc"
    if path.endswith(_JSONL_EXTS):
        return "jsonl"
    raise SystemExit(
        f"cannot infer input format of {path!r}: expected a directory, "
        f"a .parquet/.orc file, or a {'/'.join(_JSONL_EXTS)} file"
    )


def _sniff_jsonl(path: str) -> bool:
    """Decide whether a curate/export input is JSONL or parquet.

    Directories: decided by data-file extensions at the top level and
    one level into partition subdirectories — ``*.parquet`` entries ⇒
    parquet, else jsonl-ish entries ⇒ JSONL. The ``_SUCCESS`` marker is
    deliberately IGNORED: Spark writes it for EVERY output format, so a
    Spark-written JSONL dataset (``_SUCCESS`` + ``part-*.json.gz`` — the
    layout of this repo's own ``write_documents_jsonl`` / ``curate
    --out-format jsonl`` output) carries one and must still sniff as
    JSONL. A parquet dataset with a stray ``.json`` metadata sidecar is
    still parquet because the parquet check runs first. A directory with
    evidence of neither (including an empty one) fails loudly instead of
    falling through to a confusing parquet-read error. Single files:
    decided strictly by extension — ``.parquet`` is parquet, jsonl-ish
    is JSONL, anything else is an error. The previous behavior (any
    non-directory ⇒ JSONL) silently parsed a parquet file as JSON and
    quarantined every row as corrupt; an ambiguous input must fail
    loudly instead."""
    return _sniff_format(path) == "jsonl"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ixmp_spark")
    p.add_argument("--platform", help="warehouse root dir or configured name")
    p.add_argument("--url", help="ixmp://PLATFORM/MODEL/SCENARIO[#VERSION]")
    p.add_argument("--model")
    p.add_argument("--scenario")
    p.add_argument("--version", type=int)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="list scenarios (reference cli.py:330)")
    sp.add_argument("--match", help="regex on 'model/scenario'")

    sp = sub.add_parser("export", help="bulk TS export (platform surface)")
    sp.add_argument("path")
    sp.add_argument("--variable", action="append")
    sp.add_argument("--region", action="append")
    sp.add_argument("--default-only", action="store_true")
    sp.add_argument("--export-all-runs", action="store_true")

    sp = sub.add_parser(
        "export-excel", help="scenario data to .xlsx (cli.py:229–258)"
    )
    sp.add_argument("path")
    sp.add_argument("--max-row", type=int)
    sp.add_argument(
        "filters", nargs="*", metavar="FILTERS",
        help="dim_1=val0,val1 dim_2=val2",
    )

    sp = sub.add_parser(
        "import", help="import time series or scenario data (cli.py:289)"
    )
    isub = sp.add_subparsers(dest="what", required=True)
    tsp = isub.add_parser("timeseries", help="TS CSV/Excel (cli.py:300)")
    tsp.add_argument("file")
    tsp.add_argument("--firstyear", type=int)
    tsp.add_argument("--lastyear", type=int)
    ssp = isub.add_parser("scenario", help="Excel scenario data (cli.py:314)")
    ssp.add_argument("file")
    ssp.add_argument("--discard-solution", action="store_true")
    ssp.add_argument("--add-units", action="store_true")
    ssp.add_argument("--init-items", action="store_true")
    ssp.add_argument("--commit-steps", action="store_true")

    sp = sub.add_parser("report", help="compute a reporting key (cli.py:120)")
    sp.add_argument("key", nargs="?", help="defaults to the config's 'default:'")
    sp.add_argument("--config", help="reporting config YAML (cli.py:121)")
    sp.add_argument(
        "-o", "--output", help="write the result to a .csv or .xlsx file"
    )

    sp = sub.add_parser("solve", help="run a model (cli.py:247)")
    sp.add_argument("--model-name", default="gams")

    sp = sub.add_parser(
        "platform", help="configure platforms (cli.py:335–365)"
    )
    psub = sp.add_subparsers(dest="action", required=True)
    ap = psub.add_parser("add", help="platform add NAME warehouse PATH")
    ap.add_argument("name")
    ap.add_argument("args", nargs="*")
    rp = psub.add_parser("remove")
    rp.add_argument("name")
    psub.add_parser("list")

    sp = sub.add_parser("config", help="get/set config keys (cli.py:191–218)")
    csub = sp.add_subparsers(dest="action", required=True)
    cg = csub.add_parser("get")
    cg.add_argument("key")
    cs = csub.add_parser("set")
    cs.add_argument("key")
    cs.add_argument("value")
    csub.add_parser("show")

    sp = sub.add_parser(
        "curate",
        help="corpus curation: quality gates + exact dedup "
        "(jsonl/parquet in, parquet/jsonl out; extension surface)",
    )
    sp.add_argument("input", help="corpus path (.jsonl[.gz] file/dir or parquet dir)")
    sp.add_argument("output", help="output directory")
    sp.add_argument("--min-words", type=int, default=50)
    sp.add_argument("--max-words", type=int, default=100_000)
    sp.add_argument("--min-stopword-hits", type=int, default=2)
    sp.add_argument("--no-dedup", action="store_true")
    sp.add_argument(
        "--out-format", choices=["parquet", "jsonl", "orc"],
        default="parquet",
    )
    sp.add_argument("--max-records-per-file", type=int, default=None)
    sp.add_argument(
        "--quarantine", default=None, metavar="DIR",
        help="write corrupt JSONL lines (raw line + any parsed fields) "
        "here for reprocessing instead of just counting them",
    )

    sp = sub.add_parser(
        "export-shards",
        help="curated corpus -> shuffled fixed-capacity training shards "
        "(gate + dedup + pack + shard in ONE pipeline; extension surface)",
    )
    sp.add_argument("input", help="corpus path (.jsonl[.gz] file/dir or parquet dir)")
    sp.add_argument("output", help="output directory (parquet, partitioned by shard)")
    sp.add_argument("--min-words", type=int, default=50)
    sp.add_argument("--max-words", type=int, default=100_000)
    sp.add_argument("--min-stopword-hits", type=int, default=2)
    sp.add_argument("--no-dedup", action="store_true")
    sp.add_argument(
        "--quarantine", default=None, metavar="DIR",
        help="write corrupt JSONL lines here for reprocessing",
    )
    sp.add_argument(
        "--capacity", type=int, default=2048,
        help="tokens per packed training sequence",
    )
    sp.add_argument(
        "--n-shards", type=int, default=64,
        help="shard count (the unit of reader parallelism; size so one "
        "shard fits an executor)",
    )
    sp.add_argument("--seed", default="42", help="shuffle/packing seed")
    sp.add_argument(
        "--split-long-docs", action="store_true",
        help="split documents longer than --capacity into capacity-token "
        "chunks (lowercased, provenance kept as doc_id+chunk_idx) before "
        "packing, so no packed unit exceeds one sequence",
    )
    sp.add_argument(
        "--bpe-merges", type=int, default=None,
        help="train a BPE merge table of this size on the kept corpus and "
        "shard token PIECES instead of raw text",
    )

    sub.add_parser("show-versions", help="package versions (cli.py:145)")
    return p


def _read_corpus(spark, path: str):
    """Shared curate/export-shards corpus reader: (docs, quarantine|None)
    by sniffed format."""
    fmt = _sniff_format(path)
    if fmt == "jsonl":
        from ixmp_spark.sources.docs_io import (
            read_documents_jsonl,
            split_corrupt,
        )

        return split_corrupt(read_documents_jsonl(spark, path))
    if fmt == "orc":
        return spark.read.orc(path), None
    return spark.read.parquet(path), None


def _quarantine_count(spark, bad, path: str | None) -> int:
    """Count corrupt rows; with ``path``, also persist them (raw line +
    any fields that did parse) as JSONL for reprocessing — provenance
    pipelines keep their rejects, they don't just tally them. The count
    is read back from the written files so it is the number actually
    quarantined, and the corpus-side frame still runs exactly once."""
    if bad is None:
        return 0
    if path is None:
        return bad.count()
    bad.write.mode("overwrite").json(path)
    # explicit schema: an all-clean corpus writes only _SUCCESS, which
    # a schema-inferring read refuses
    return spark.read.schema(bad.schema).json(path).count()


def _resolve_platform(name_or_path: str) -> str:
    """A directory path is used as-is; otherwise it must be a platform
    name registered in config (``platform add NAME warehouse PATH``)."""
    if os.path.isdir(name_or_path):
        return name_or_path
    from ixmp_spark.config import config

    try:
        _, info = config.get_platform_info(name_or_path)
    except ValueError as e:
        raise SystemExit(str(e))
    if info.get("class") != "warehouse":
        raise SystemExit(
            f"platform {name_or_path!r} uses backend {info.get('class')!r}; "
            "the CLI drives warehouse platforms"
        )
    return info["path"]


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    # config/platform groups operate on the registry only — no Spark
    if args.cmd == "config":
        from ixmp_spark.config import config

        if args.action == "get":
            print(config.get(args.key))
        elif args.action == "set":
            try:
                config.set(args.key, args.value)
            except KeyError as e:
                raise SystemExit(f"No registered configuration key {e}")
            config.save()
            print(f"Updated {config.path}")
        else:  # show
            print(f"Configuration path: {config.path}\n")
            import json

            print(json.dumps(config.values, indent=2, default=str))
        return 0
    if args.cmd == "platform":
        from ixmp_spark.config import config

        if args.action == "add":
            config.add_platform(args.name, *args.args)
            config.save()
            print(f"Added platform {args.name!r}")
        elif args.action == "remove":
            try:
                config.remove_platform(args.name)
            except KeyError:
                raise SystemExit(f"no platform named {args.name!r}")
            config.save()
            print(f"Removed platform config for {args.name!r}")
        else:  # list
            for name, info in sorted(config.get("platform").items()):
                print(f"{name}: {info}")
        return 0
    if args.cmd == "show-versions":
        from ixmp_spark.core.utils import show_versions

        print(show_versions())
        return 0
    if args.cmd == "curate":
        # the end-to-end corpus pipeline, one lazy plan: read → gate →
        # (dedup) → write. No platform needed — pure file-to-file.
        from ixmp_spark.operators.text import gopher_quality_filter
        from ixmp_spark.session import get_spark

        spark = get_spark("ixmp_spark_cli")
        docs, bad = _read_corpus(spark, args.input)
        n_in = docs.count()
        # attach mode: the gate is a map-side projection ON the scan —
        # one corpus pass, not a select-then-semi-join double scan
        signal_cols = [
            "n_words", "mean_word_len", "symbol_ratio",
            "alpha_word_frac", "stopword_hits", "keep",
        ]
        kept = (
            gopher_quality_filter(
                docs, "doc_id", "text",
                min_words=args.min_words, max_words=args.max_words,
                min_stopword_hits=args.min_stopword_hits,
                attach=True,
            )
            .where("keep")
            .drop(*signal_cols)
        )
        if not args.no_dedup:
            from ixmp_spark.operators.dedup import incremental_dedup

            empty = spark.createDataFrame([], "digest string")
            kept = incremental_dedup(kept, empty, "text", "doc_id").drop(
                "digest"
            )
        if args.out_format == "jsonl":
            from ixmp_spark.sources.docs_io import write_documents_jsonl

            write_documents_jsonl(
                kept, args.output,
                max_records_per_file=args.max_records_per_file,
            )
        else:
            w = kept.write.mode("overwrite")
            if args.max_records_per_file:
                w = w.option(
                    "maxRecordsPerFile", int(args.max_records_per_file)
                )
            # ORC is the second first-class columnar sink (Spark-native
            # reader/writer; Avro stays gated — the external module
            # isn't deployed in this environment)
            if args.out_format == "orc":
                w.orc(args.output)
            else:
                w.parquet(args.output)
        n_out = spark.read.format(
            {"jsonl": "json", "orc": "orc"}.get(args.out_format, "parquet")
        ).schema(kept.schema).load(args.output).count()
        n_bad = _quarantine_count(spark, bad, args.quarantine)
        print(
            f"read {n_in} docs ({n_bad} corrupt lines quarantined), "
            f"kept {n_out} -> {args.output}"
        )
        return 0
    if args.cmd == "export-shards":
        # curated corpus → training shards, END-TO-END in one composed
        # lazy pipeline: read → gate (map-side projection on the scan) →
        # exact dedup → tokenize → pack into fixed-capacity sequences →
        # shuffled shards → parquet partitioned by shard, rows in
        # (seq, tok_offset) order so a sequential shard reader streams
        # packed sequences directly. The corpus is scanned TWICE total
        # (the honest n_in count + the write); every intermediate stage
        # composes into the single write job.
        from pyspark.sql import functions as F

        from ixmp_spark.operators.dedup import incremental_dedup
        from ixmp_spark.operators.sampling import pack_sequences
        from ixmp_spark.operators.text import gopher_quality_filter, token_count
        from ixmp_spark.session import get_spark

        spark = get_spark("ixmp_spark_cli")
        docs, bad = _read_corpus(spark, args.input)
        n_in = docs.count()
        signal_cols = [
            "n_words", "mean_word_len", "symbol_ratio",
            "alpha_word_frac", "stopword_hits", "keep",
        ]
        kept = (
            gopher_quality_filter(
                docs, "doc_id", "text",
                min_words=args.min_words, max_words=args.max_words,
                min_stopword_hits=args.min_stopword_hits,
                attach=True,
            )
            .where("keep")
            .drop(*signal_cols)
        )
        if not args.no_dedup:
            empty = spark.createDataFrame([], "digest string")
            kept = incremental_dedup(kept, empty, "text", "doc_id").drop(
                "digest"
            )
        pack_key = "doc_id"
        if args.split_long_docs and args.bpe_merges:
            raise SystemExit(
                "--split-long-docs splits on whitespace tokens and cannot "
                "compose with --bpe-merges (piece counts differ); pick one"
            )
        if args.bpe_merges:
            from ixmp_spark.operators.text import bpe_encode, bpe_train

            merges = bpe_train(kept, "text", n_merges=args.bpe_merges)
            # shards carry token pieces, not raw text: bpe_encode's
            # output (doc_id, pieces, n_tokens) IS the training payload
            kept = bpe_encode(kept, "doc_id", "text", merges)
        elif args.split_long_docs:
            from ixmp_spark.operators.text import chunk_documents

            # capacity-token chunks (map-only), provenance as
            # (doc_id, chunk_idx); no packed unit then exceeds one
            # sequence, so a sequence straddle is at most one boundary
            kept = chunk_documents(
                kept, "doc_id", "text", window=args.capacity
            ).select(
                F.concat_ws("#", "doc_id", "chunk_idx").alias("unit_id"),
                "doc_id",
                "chunk_idx",
                "n_tokens",
                F.col("chunk").alias("text"),
            )
            pack_key = "unit_id"
        else:
            kept = kept.withColumn(
                "n_tokens", token_count(F.col("text")).cast("long")
            )
        packed = pack_sequences(
            kept, pack_key, "n_tokens",
            capacity=args.capacity, n_shards=args.n_shards, seed=args.seed,
        )
        (
            packed.repartition("shard")
            .sortWithinPartitions("seq", "tok_offset")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(args.output)
        )
        # honest counts from the OUTPUT (cheap — it is the curated
        # subset), never a third scan of the input. A fully-gated corpus
        # writes only _SUCCESS: report zero, don't die on schemaless read.
        from pyspark.errors.exceptions.captured import AnalysisException

        try:
            back = spark.read.parquet(args.output)
        except AnalysisException:
            n_bad = _quarantine_count(spark, bad, args.quarantine)
            print(
                f"read {n_in} docs ({n_bad} corrupt lines quarantined), "
                f"kept 0; nothing to pack -> {args.output}"
            )
            return 0
        stats = back.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("toks"),
            F.countDistinct("shard").alias("shards"),
            F.countDistinct("shard", "seq").alias("seqs"),
        ).collect()[0]
        n_bad = _quarantine_count(spark, bad, args.quarantine)
        print(
            f"read {n_in} docs ({n_bad} corrupt lines quarantined), "
            f"kept {stats['docs']}; packed {stats['toks']} tokens into "
            f"{stats['seqs']} sequences of {args.capacity} across "
            f"{stats['shards']} shards -> {args.output}"
        )
        return 0

    from ixmp_spark.core import Platform, Scenario, TimeSeries
    from ixmp_spark.session import get_spark

    if args.url:
        if args.platform or args.model or args.scenario or args.version:
            raise SystemExit(
                "--platform --model --scenario and/or --version redundant "
                "with --url"
            )
        from ixmp_spark.core.utils import parse_url

        plat_name, info = parse_url(args.url)
        args.platform = plat_name
        args.model = info["model"]
        args.scenario = info["scenario"]
        args.version = info.get("version")
    if not args.platform:
        raise SystemExit("give --platform (or --url) before the command")

    mp = Platform(get_spark("ixmp_spark_cli"), _resolve_platform(args.platform))

    def need_ts():
        if not (args.model and args.scenario):
            raise SystemExit("--model and --scenario required")

    if args.cmd == "list":
        from ixmp_spark.core.utils import format_scenario_list

        out = format_scenario_list(mp, match=args.match)
        print(out.to_string(index=False) if len(out) else "(no scenarios)")
    elif args.cmd == "export":
        from ixmp_spark.sources.ts_io import export_timeseries_data

        export_timeseries_data(
            mp,
            args.path,
            model=args.model,
            scenario=args.scenario,
            variable=args.variable,
            region=args.region,
            default=args.default_only,
            export_all_runs=args.export_all_runs,
        )
        print(f"wrote {args.path}")
    elif args.cmd == "export-excel":
        need_ts()
        filters = {}
        for group in args.filters:
            dim, _, values = group.partition("=")
            if not _:
                raise SystemExit(f"filters must be dim=v1,v2 — got {group!r}")
            filters[dim] = values.split(",")
        scen = Scenario(mp, args.model, args.scenario, version=args.version)
        scen.to_excel(args.path, filters=filters or None, max_row=args.max_row)
        print(f"wrote {args.path}")
    elif args.cmd == "import":
        need_ts()
        if args.what == "timeseries":
            from ixmp_spark.sources.ts_io import import_timeseries

            ts = TimeSeries(mp, args.model, args.scenario, version=args.version)
            ts.check_out()
            import_timeseries(
                ts, args.file, firstyear=args.firstyear, lastyear=args.lastyear
            )
            ts.commit(f"imported {args.file}")
            print(f"imported {args.file} into {args.model}/{args.scenario}")
        else:  # scenario (reference cli.py:314–331)
            scen = Scenario(mp, args.model, args.scenario, version=args.version)
            if scen.has_solution() and args.discard_solution:
                scen.remove_solution()
            try:
                scen.check_out()
            except ValueError as e:
                raise SystemExit(str(e))
            except RuntimeError as e:
                # --version=new scenarios start checked out (reference
                # cli.py:314-331 passes through its "not yet saved" analogue);
                # any other case (e.g. undiscarded solution) gets the clean
                # message instead of a traceback.
                if "already checked out" not in str(e):
                    raise SystemExit(str(e))
            scen.read_excel(
                args.file,
                add_units=args.add_units,
                init_items=args.init_items,
                commit_steps=args.commit_steps,
            )
            if scen._checked_out:
                scen.commit(f"imported {args.file}")
            print(f"imported {args.file} into {args.model}/{args.scenario}")
    elif args.cmd == "report":
        need_ts()
        from ixmp_spark.plans import Reporter

        scen = Scenario(mp, args.model, args.scenario, version=args.version)
        rep = Reporter.from_scenario(scen)
        if args.config:
            rep.configure(args.config)
        key = args.key or rep.default_key
        if not key:
            raise SystemExit("no key given and no 'default:' in config")
        if args.output:
            try:
                rep.write(key, args.output)
            except ValueError as e:
                raise SystemExit(str(e))
            print(f"wrote {args.output}")
            return 0
        q = rep.get_quantity(key)
        pdf = q.df.toPandas()
        if q.dims:
            # reference CLI output shape (tests/report/test_reporter.py:
            # 193–204): a dim-indexed value series, sorted, with the
            # trailing dtype/units line
            ser = pdf.set_index(list(q.dims))["value"].sort_index()
            body = ser.to_string()
            print(f"{body}\nName: value, dtype: float64, units: "
                  f"{q.unit or 'dimensionless'}")
        else:
            print(pdf.to_string(index=False))
    elif args.cmd == "solve":
        need_ts()
        from ixmp_spark.core.model import solve as do_solve

        scen = Scenario(mp, args.model, args.scenario, version=args.version)
        do_solve(scen, model=args.model_name)
        print("solved")
    return 0


if __name__ == "__main__":
    sys.exit(main())
