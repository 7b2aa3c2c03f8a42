#!/usr/bin/env python
"""Benchmark harness: run the suite's headline queries at sf0.1.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}``

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_bigdata_jobs_spark import suite  # noqa: E402
from kafka_bigdata_jobs_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("kbj-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    # Warm the JVM + parquet footer caches once with the flagship query so
    # per-query numbers measure the engine, not first-touch JIT.
    suite.registry()["pricing_summary"].fn(spark, sf_dir).collect()

    for name, q in sorted(suite.registry().items()):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        if not df.isStreaming:
            # noop sink materializes every row (unlike count(), which can
            # skip projections) without writing anything.
            df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Operators cache reused intermediates (signatures, vectors);
        # drop them so queries are timed independently and memory stays
        # flat across the suite.
        spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
