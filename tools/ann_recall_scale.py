"""ANN recall at 1×/3×/10× corpus scale (r4 verdict item 6).

The ANN indexes hold their fit parameters fixed as the corpus grows —
capped codebook fit samples, fixed hyperplane count, fixed IVF cell
count — exactly as a production index does between rebuilds, so their
recall at sf0.1 says nothing about recall at 10× the vectors.  This
tool runs the suite's ``ann_recall_report`` (recall@10 of every ANN
method vs the exact brute-force top-k, in integer basis points) on the
replicated datasets from tools/scaleup.py and records the
recall-vs-scale surface into SCALING.json under ``ann_recall``; a
floor assertion at x10 lives in tests/test_scaling_exponents.py.

Replica geometry matters for interpretation (tools/scaleup.py): each
replica is a Haar-rotated copy of the sf0.1 embedding table, so
within-replica structure is preserved verbatim while cross-replica
cosines fall to the isotropic ~N(0, 1/64) background.  The exact
brute-force top-k is recomputed at every scale, so recall measures the
index against the truth OF THAT corpus — including background vectors
that genuinely enter the top-10 as the corpus grows.

Usage: python tools/ann_recall_scale.py [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_bigdata_jobs_spark import suite  # noqa: E402
from kafka_bigdata_jobs_spark.session import get_spark  # noqa: E402

SCALES = {
    "x1": "/root/testdata/sf0.1",
    "x3": ".scaledata/x3",
    "x10": ".scaledata/x10",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    for scale, d in SCALES.items():
        if not os.path.exists(d):
            raise SystemExit(
                f"{scale} dataset missing at {d} — run tools/scaleup.py first"
            )

    spark = get_spark("kbj-spark-ann-recall-scale")
    spark.sparkContext.setLogLevel("ERROR")
    fn = suite.registry()["ann_recall_report"].fn

    out_rows: dict[str, dict[str, dict]] = {}
    for scale, d in SCALES.items():
        spark.catalog.clearCache()
        t0 = time.monotonic()
        rows = fn(spark, d).collect()
        dt = time.monotonic() - t0
        per_method = {
            r["method"]: {
                "recall_bp": int(r["recall_bp"]),
                "hits": int(r["hits"]),
                "possible": int(r["possible"]),
            }
            for r in rows
        }
        per_method["_wall_sec"] = round(dt, 3)
        out_rows[scale] = per_method
        print(f"{scale:4s} ({dt:6.1f}s): " + ", ".join(
            f"{m}={v['recall_bp']}bp" for m, v in per_method.items()
            if m != "_wall_sec"), flush=True)

    try:
        with open(args.out, encoding="utf-8") as fh:
            scaling = json.load(fh)
    except (OSError, ValueError):
        scaling = {}
    scaling["ann_recall"] = {
        "k": 10,
        "n_queries": 20,
        "note": ("recall@10 in basis points vs exact brute-force top-k "
                 "recomputed per scale; index fit parameters held at "
                 "their production caps (tools/ann_recall_scale.py)"),
        "scales": out_rows,
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(scaling, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote ann_recall into {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
