"""Command-line entry point: list and run suite queries on any data dir.

Usage::

    python -m kafka_bigdata_jobs_spark list
    python -m kafka_bigdata_jobs_spark run pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m kafka_bigdata_jobs_spark explain near_dup_pairs_minhash

This is the switch-over surface for a reference user: every analysis the
reference's batch/streaming jobs compute exists here as a named query
over parquet tables (COVERAGE.md maps reference job -> query name).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kafka_bigdata_jobs_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list available queries")
    for cmd, hlp in [
        ("run", "execute a query and print rows"),
        ("explain", "print the formatted physical plan"),
    ]:
        s = sub.add_parser(cmd, help=hlp)
        s.add_argument("query")
        s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        s.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    from . import suite

    reg = suite.registry()
    if args.cmd == "list":
        try:
            for name, q in sorted(reg.items()):
                kind = "oracle" if q.oracle else "rows-only"
                print(f"{name:40s} [{kind}]")
        except BrokenPipeError:
            pass  # `| head` closed the pipe
        return 0

    if args.query not in reg:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(f"kbj-cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = reg[args.query].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
