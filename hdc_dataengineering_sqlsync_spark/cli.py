"""Catalog CLI — list, run, and explain any declared query:

    python -m hdc_dataengineering_sqlsync_spark.cli --list
    python -m hdc_dataengineering_sqlsync_spark.cli --qid agg_pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--limit 20] [--explain]
    python -m hdc_dataengineering_sqlsync_spark.cli --oracle agg_pricing_summary

The run path is exactly the driver contract path (plans.CATALOG →
(spark_fn, oracle_sql)), so what the CLI shows is what the verify gate
checks.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Run queries from the engine catalog")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--list", action="store_true", help="list declared qids")
    g.add_argument("--qid", help="run this query")
    g.add_argument("--oracle", metavar="QID", help="print a qid's DuckDB oracle SQL")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="table directory")
    ap.add_argument("--limit", type=int, default=20, help="max rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan too")
    return ap


def main(argv: list[str] | None = None, out=sys.stdout) -> int:
    from hdc_dataengineering_sqlsync_spark.plans import CATALOG

    args = build_parser().parse_args(argv)

    if args.list:
        for qid in sorted(CATALOG):
            q = CATALOG[qid]
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{qid:32s} {q.family:22s} {kind}", file=out)
        return 0

    if args.oracle:
        q = CATALOG.get(args.oracle)
        if q is None:
            print(f"unknown qid: {args.oracle}", file=out)
            return 2
        print(q.oracle or "-- rows-only qid: no oracle declared", file=out)
        return 0

    q = CATALOG.get(args.qid)
    if q is None:
        print(f"unknown qid: {args.qid}", file=out)
        return 2
    from hdc_dataengineering_sqlsync_spark.session import get_session

    df = q.fn(get_session(app_name=f"cli_{args.qid}"), args.sf_dir)
    if args.explain:
        df.explain("formatted")
    for row in df.limit(args.limit).collect():
        print(row.asDict(), file=out)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
