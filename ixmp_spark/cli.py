"""Command-line interface (reference ixmp/cli.py:71–393 surface).

Commands mirror the reference CLI verbs that make sense without a GAMS
install: ``list`` (scenario registry), ``export`` (bulk TS CSV),
``import`` (TS CSV into a run), ``report`` (compute one reporting key),
``solve`` (run a registered model).

    python -m ixmp_spark.cli --platform /path/to/wh list --match canning
    python -m ixmp_spark.cli --platform WH --model M --scenario S \
        import ts.csv --firstyear 2005
    python -m ixmp_spark.cli --platform WH export out.csv --default-only
    python -m ixmp_spark.cli --platform WH --model M --scenario S \
        report "d:i"
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ixmp_spark")
    p.add_argument("--platform", required=True, help="warehouse root dir")
    p.add_argument("--model")
    p.add_argument("--scenario")
    p.add_argument("--version", type=int)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="list scenarios (reference cli.py:330)")
    sp.add_argument("--match", help="regex on 'model/scenario'")

    sp = sub.add_parser("export", help="bulk TS export (cli.py:281)")
    sp.add_argument("path")
    sp.add_argument("--variable", action="append")
    sp.add_argument("--region", action="append")
    sp.add_argument("--default-only", action="store_true")
    sp.add_argument("--export-all-runs", action="store_true")

    sp = sub.add_parser("import", help="TS CSV import (cli.py:281)")
    sp.add_argument("path")
    sp.add_argument("--firstyear", type=int)
    sp.add_argument("--lastyear", type=int)

    sp = sub.add_parser("report", help="compute a reporting key (cli.py:371)")
    sp.add_argument("key", nargs="?", help="defaults to the config's 'default:'")
    sp.add_argument("--config", help="reporting config YAML (cli.py:121)")

    sp = sub.add_parser("solve", help="run a model (cli.py:247)")
    sp.add_argument("--model-name", default="gams")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from ixmp_spark.core import Platform, Scenario, TimeSeries
    from ixmp_spark.session import get_spark

    mp = Platform(get_spark("ixmp_spark_cli"), args.platform)

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
    elif args.cmd == "import":
        need_ts()
        from ixmp_spark.sources.ts_io import import_timeseries

        ts = TimeSeries(mp, args.model, args.scenario, version=args.version)
        ts.check_out()
        import_timeseries(
            ts, args.path, firstyear=args.firstyear, lastyear=args.lastyear
        )
        ts.commit(f"imported {args.path}")
        print(f"imported {args.path} into {args.model}/{args.scenario}")
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
