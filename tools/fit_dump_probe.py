"""Dump the hier quantizer fit state for offline pass-2 prototyping
(r10, VERDICT item 1).

Runs ``embedding_near_dup_pairs_hier`` with ``max_replication=None`` —
the operator's eager driver work then stops after pass-1 assign_radii,
and the ``SPARK_GRAFT_HIER_FIT_DUMP`` hook (similarity.py) fires just
before the replication-strategy dispatch — so one run per scale records
the exact quantizer metadata (branch/leaf centers, radii, tiers,
thresholds) the pass-2 scan closes over, without paying the replication
pass or the tail.

Usage: python tools/fit_dump_probe.py [--scales x10,x30,x100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
THRESHOLD = 0.95
DATA_ROOT = ".scaledata/embpairs"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="x10,x30,x100")
    ap.add_argument("--out-prefix", default="/tmp/hier_fit")
    args = ap.parse_args()

    from kafka_bigdata_jobs_spark.session import get_spark
    from kafka_bigdata_jobs_spark.operators import similarity as sim

    spark = get_spark("kbj-spark-fitdump")
    spark.sparkContext.setLogLevel("ERROR")
    for s in args.scales.split(","):
        path = os.path.join(DATA_ROOT, f"{s}.parquet")
        if not os.path.exists(path):
            print(f"skip {s}: no corpus at {path}", flush=True)
            continue
        spark.catalog.clearCache()
        sim._TWO_LEVEL_FIT_CACHE.clear()
        os.environ["SPARK_GRAFT_HIER_FIT_DUMP"] = f"{args.out_prefix}_{s}"
        t0 = time.monotonic()
        df = spark.read.parquet(path)
        sim.embedding_near_dup_pairs_hier(
            df, "vec_id", "embedding", threshold=THRESHOLD, dim=DIM,
            max_replication=None)
        print(f"{s}: fit-state dumped in {time.monotonic() - t0:.1f}s "
              f"(K={sim.embedding_near_dup_pairs_hier.last_k}, "
              f"strategy={sim.embedding_near_dup_pairs_hier.last_replication_strategy})",
              flush=True)
        del os.environ["SPARK_GRAFT_HIER_FIT_DUMP"]
    spark.stop()


if __name__ == "__main__":
    main()
