"""Interleaved storage-level A/B for the hier path's two caches
(r10 VERDICT items 1 & 6): the corpus scan cache (`base`) and the
replication guard cache (`rep`).

Arms alternate inside one JVM per scale so the sandbox's host drift
hits all arms symmetrically.  Pair counts asserted identical.

Usage: python tools/cache_level_ab.py [--scales x30] [--rounds 2]
       [--which scan|guard]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
THRESHOLD = 0.95
DATA_ROOT = ".scaledata/embpairs"

ARMS = {
    "scan": [("SPARK_GRAFT_SCAN_CACHE_LEVEL", v)
             for v in ("", "DISK_ONLY", "NONE")],
    "guard": [("SPARK_GRAFT_GUARD_CACHE_LEVEL", v)
              for v in ("", "DISK_ONLY")],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="x30")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--which", default="scan", choices=("scan", "guard"))
    ap.add_argument("--out", default="/tmp/cache_level_ab.json")
    args = ap.parse_args()

    from kafka_bigdata_jobs_spark.session import get_spark
    from kafka_bigdata_jobs_spark.operators import similarity as sim

    arms = ARMS[args.which]
    env_key = arms[0][0]
    results: dict = {}
    for scale in args.scales.split(","):
        path = os.path.join(DATA_ROOT, f"{scale}.parquet")
        spark = get_spark("kbj-cache-level-ab")
        spark.sparkContext.setLogLevel("ERROR")

        def run_cold(value: str):
            if value:
                os.environ[env_key] = value
            else:
                os.environ.pop(env_key, None)
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
            return round(total, 3), n_pairs, stages

        run_cold("")  # untimed warm-up
        rows = []
        for _ in range(args.rounds):
            for _, val in arms:
                total, pairs, stages = run_cold(val)
                label = val or "DEFAULT"
                rows.append({"arm": label, "total": total,
                             "pairs": pairs, "stages": stages})
                print(f"{scale} {label:10s} total={total:8.2f}s "
                      f"scan_cache={stages['scan_cache']} "
                      f"guard={stages['replicate_guard']} "
                      f"tail={stages['tail']}", flush=True)
        assert len({r["pairs"] for r in rows}) == 1, "pairs diverged"
        best = {}
        for _, val in arms:
            label = val or "DEFAULT"
            best[label] = min(r["total"] for r in rows if r["arm"] == label)
        results[scale] = {"rows": rows, "best": best}
        print(f"{scale}: best {best}", flush=True)
        spark.stop()

    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
