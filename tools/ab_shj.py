"""A/B the session-wide AQE SHJ threshold on the two r9 flagged queries
(r10 VERDICT item 5): dsir_selection_report (-16% in r9's driver run)
and waiting_suppliers_q21 (-6%).

One long-lived JVM; `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`
is a runtime conf, so the two arms alternate inside the same session
(interleaved, min-of-N each) — same-host, same-JVM evidence.  Executed
(AQE-final) plans are captured per arm.

Usage: python tools/ab_shj.py [--sf-dir /root/testdata/sf0.1] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ("dsir_selection_report", "waiting_suppliers_q21")
CONF = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--out", default="/tmp/ab_shj.json")
    args = ap.parse_args()

    from kafka_bigdata_jobs_spark.session import get_spark
    from kafka_bigdata_jobs_spark import suite

    spark = get_spark("kbj-ab-shj")
    spark.sparkContext.setLogLevel("ERROR")
    reg = suite.registry()

    def run_once(name: str) -> float:
        df = reg[name].fn(spark, args.sf_dir)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    def executed_plan(name: str) -> str:
        df = reg[name].fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return df._jdf.queryExecution().executedPlan().toString()

    results: dict = {}
    # untimed warm-up of both queries (JIT, parquet footers, base scans)
    for q in QUERIES:
        run_once(q)
    for arm in ("128m", "0"):
        spark.conf.set(CONF, arm)
        for q in QUERIES:
            spark.sparkContext.setJobDescription(f"ab_shj {q} thr={arm}")
            best = min(run_once(q) for _ in range(args.n))
            results[f"{q}@{arm}"] = round(best, 3)
            print(f"{q} thr={arm}: {best:.3f}s", flush=True)
    # second interleave pass (host drift check): re-run arms reversed
    for arm in ("0", "128m"):
        spark.conf.set(CONF, arm)
        for q in QUERIES:
            best = min(run_once(q) for _ in range(args.n))
            results[f"{q}@{arm}#2"] = round(best, 3)
            print(f"{q} thr={arm} (pass2): {best:.3f}s", flush=True)
    os.makedirs("plans/r10", exist_ok=True)
    for arm in ("128m", "0"):
        spark.conf.set(CONF, arm)
        for q in QUERIES:
            with open(f"plans/r10/{q}_shj{arm}_executed.txt", "w",
                      encoding="utf-8") as fh:
                fh.write(executed_plan(q))
    import json
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(results, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
