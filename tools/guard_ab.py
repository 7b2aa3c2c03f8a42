"""Interleaved guard-mode A/B (r10 VERDICT item 1): cache vs recount.

One long-lived JVM per scale; attempts ALTERNATE the guard mode
(cache, recount, cache, recount, ...), so host drift (the sandbox's
documented first-touch balloon) hits both arms symmetrically and the
per-arm minima are comparable.  Pair counts and replication factors
are asserted identical across arms.

Usage: python tools/guard_ab.py [--scales x10,x30] [--rounds 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = {"x1": 50_000, "x3": 150_000, "x10": 500_000, "x30": 1_500_000,
         "x100": 5_000_000}
DIM = 64
THRESHOLD = 0.95
DATA_ROOT = ".scaledata/embpairs"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="x10,x30")
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved (cache,recount) rounds per scale")
    ap.add_argument("--order", default="cr", choices=("cr", "rc"),
                    help="arm order per round: cr=cache first, rc="
                         "recount first (run both at big footprints — "
                         "the host balloon penalizes the LATER run)")
    ap.add_argument("--out", default="/tmp/guard_ab.json")
    args = ap.parse_args()

    from kafka_bigdata_jobs_spark.session import get_spark
    from kafka_bigdata_jobs_spark.operators import similarity as sim

    results: dict = {}
    for scale in args.scales.split(","):
        path = os.path.join(DATA_ROOT, f"{scale}.parquet")
        spark = get_spark("kbj-guard-ab")
        spark.sparkContext.setLogLevel("ERROR")

        def run_cold(mode: str):
            os.environ["SPARK_GRAFT_GUARD_MODE"] = mode
            spark.catalog.clearCache()
            sim._TWO_LEVEL_FIT_CACHE.clear()
            df = spark.read.parquet(path)
            t0 = time.monotonic()
            out = sim.embedding_near_dup_pairs_hier(
                df, "vec_id", "embedding", threshold=THRESHOLD, dim=DIM)
            n_pairs = out.count()
            total = time.monotonic() - t0
            stages = dict(
                sim.embedding_near_dup_pairs_hier.last_stage_seconds)
            stages["tail"] = round(total - sum(stages.values()), 3)
            import gc
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            return (round(total, 3), n_pairs, stages,
                    sim.embedding_near_dup_pairs_hier.last_replication)

        order = (("cache", "recount") if args.order == "cr"
                 else ("recount", "cache"))
        run_cold(order[0])  # untimed warm-up
        rows = []
        for _ in range(args.rounds):
            for mode in order:
                total, pairs, stages, rep = run_cold(mode)
                rows.append({"mode": mode, "total": total,
                             "pairs": pairs, "stages": stages,
                             "rep": rep})
                print(f"{scale} {mode:8s} total={total:8.2f}s "
                      f"pairs={pairs} guard={stages['replicate_guard']} "
                      f"tail={stages['tail']} "
                      f"scan_cache={stages['scan_cache']}", flush=True)
        pair_set = {r["pairs"] for r in rows}
        rep_set = {r["rep"] for r in rows}
        assert len(pair_set) == 1, f"pair counts diverged: {pair_set}"
        assert len(rep_set) == 1, f"replication diverged: {rep_set}"
        best = {m: min(r["total"] for r in rows if r["mode"] == m)
                for m in ("cache", "recount")}
        # drift-robust per-pair comparison: each consecutive
        # (cache, recount) pair ran back-to-back
        pair_deltas = []
        for i in range(0, len(rows) - 1, 2):
            a, b = rows[i], rows[i + 1]
            ca = a["total"] if a["mode"] == "cache" else b["total"]
            re_ = b["total"] if a["mode"] == "cache" else a["total"]
            pair_deltas.append(round(ca - re_, 3))
        results[scale] = {"rows": rows, "best": best,
                          "cache_minus_recount_per_pair": pair_deltas}
        print(f"{scale}: best {best}, per-pair deltas {pair_deltas}",
              flush=True)
        spark.stop()

    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
