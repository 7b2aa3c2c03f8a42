"""Command-line entry point: list and run suite queries on any data dir.

Usage::

    python -m kafka_bigdata_jobs_spark list
    python -m kafka_bigdata_jobs_spark run pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m kafka_bigdata_jobs_spark explain near_dup_pairs_minhash
    python -m kafka_bigdata_jobs_spark oracle token_stats   # Spark vs DuckDB

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
        ("oracle", "run Spark AND the DuckDB oracle, compare strictly"),
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
    elif args.cmd == "oracle":
        rc = _oracle_compare(args.query, reg[args.query], df, args.sf_dir)
        spark.stop()
        return rc
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


_ORACLE_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _oracle_compare(name: str, q, df, sf_dir: str) -> int:
    """Strict value comparison — exactly the driver's discipline:
    columns sorted by name, rows stringified and sorted, compared
    exactly (no float tolerance)."""
    if q.oracle is None:
        print(f"{name} is rows-only by design (no oracle SQL); "
              f"ran Spark side: {df.count()} rows")
        return 0
    import duckdb

    con = duckdb.connect()
    for t in _ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    scols = sorted(df.columns)
    srows = sorted(tuple(str(r[c]) for c in scols) for r in df.collect())
    cur = con.execute(q.oracle)
    ocols_raw = [d[0] for d in cur.description]
    idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    orows = sorted(tuple(str(r[i]) for i in idx) for r in cur.fetchall())
    if scols != sorted(ocols_raw):
        print(f"SCHEMA MISMATCH: spark={scols} oracle={sorted(ocols_raw)}")
        return 1
    if srows != orows:
        print(f"VALUE MISMATCH: {len(srows)} spark rows vs {len(orows)} oracle rows")
        for a, b in zip(srows, orows):
            if a != b:
                print(f"  first diff:\n    spark:  {a}\n    oracle: {b}")
                break
        return 1
    print(f"MATCH: {len(srows)} rows, {len(scols)} columns")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
