"""CLI runner — the TezExampleBase analog (every reference example runs
via `hadoop jar tez-examples.jar <example> args`,
tez-examples/.../TezExampleBase.java:230 local-mode entry). Here:

    python -m tez_spark.cli list
    python -m tez_spark.cli run q05 --sf-dir /root/testdata/sf0.01 --show 10
    python -m tez_spark.cli run q08 --counters          # TaskCounter dump
    python -m tez_spark.cli explain q08 --sf-dir /root/testdata/sf0.001
    python -m tez_spark.cli report q08                  # skew + stage report
    python -m tez_spark.cli sql "SELECT COUNT(*) FROM orders"

One long-lived session per invocation (session mode, SURVEY.md §3.3);
`run` prints rows (--counters adds the TaskCounter-flavored totals),
`explain` prints the formatted physical plan for shuffle/pushdown
inspection, and `report` is the tez-tools analyzer analog (SkewAnalyzer /
CriticalPathAnalyzer as a post-hoc report over the query's stages).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tez_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list declared queries")

    for cmd in ("run", "explain", "report"):
        p = sub.add_parser(cmd)
        p.add_argument("query", help="query name from the registry")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        p.add_argument("--cpus", type=int, default=None)
        if cmd == "run":
            p.add_argument("--show", type=int, default=20)
            p.add_argument(
                "--counters", action="store_true",
                help="print TaskCounter-flavored totals for the run",
            )

    p = sub.add_parser(
        "sql", help="ad-hoc SQL over the fixture tables (Tez entry point 3 "
        "— Hive-style session, SURVEY.md §3.3)"
    )
    p.add_argument("statement")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--show", type=int, default=20)

    args = ap.parse_args(argv)

    from tez_spark.plans.registry import all_queries

    queries = all_queries()
    if args.cmd == "list":
        for name in sorted(queries):
            print(name)
        return 0

    if args.cmd == "sql":
        from tez_spark.session import get_spark
        from tez_spark.sources.catalog import register_views

        spark = get_spark(app_name="tez_spark:sql", cpus=args.cpus)
        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.show, truncate=False)
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    from tez_spark.session import get_spark

    spark = get_spark(app_name=f"tez_spark:{args.query}", cpus=args.cpus)
    if args.cmd == "explain":
        queries[args.query](spark, args.sf_dir).explain("formatted")
    elif args.cmd == "report":
        import json

        from tez_spark.observability import capture, skew_report, stage_report

        _, counters = capture(
            spark, lambda: queries[args.query](spark, args.sf_dir).collect()
        )
        print(json.dumps({
            "counters": counters,
            "skew": skew_report(spark)[:10],
            "stages": stage_report(spark, top=10),
        }, indent=2))
    else:
        df = queries[args.query](spark, args.sf_dir)
        if args.counters:
            from tez_spark.observability import capture

            rows, counters = capture(spark, lambda: df.collect())
            for r in rows[: args.show]:
                print(r)
            for k in sorted(counters):
                print(f"{k}={counters[k]}")
        else:
            df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
