"""SparkSession factory with scale-sane defaults.

Reference parity note: every reference job hard-codes
``spark.sql.shuffle.partitions=3`` (reference ``streaming/job1_bots.py:24``,
``batch/job1_locations.py:16``).  We instead enable AQE with partition
coalescing so the identical code runs on ``local[32]`` for tests and on a
1000-executor cluster without retuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs that are safe to (re)apply to an existing session.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE rewrite a sort-merge join to a shuffled-hash join when
    # every post-shuffle partition of the build side fits under this
    # bound (default 0 = never).  SHJ skips BOTH sort passes; the
    # rewrite is a runtime decision from ACTUAL partition sizes, so it
    # is safe at any scale — partitions above the bound keep the
    # spill-graceful sort-merge path.  128 MB matches a comfortable
    # per-task hash-table footprint against the worker heap here and
    # on a typical 4-8 GB-per-core cluster executor.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "128m",
    # The driver's events.parquet carries TIMESTAMP(NANOS) which Spark's
    # reader rejects by default; read as long and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime (post-plan) bloom-filter join reduction: when a shuffle
    # join's small side carries a selective filter, inject a bloom probe
    # into the big side's scan so non-matching rows die before the
    # shuffle.  Size thresholds keep it off for tiny local inputs; at
    # the 100 TB target this is the difference between shuffling the
    # full fact table and shuffling the ~matching slice.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Spark still defaults timestamp columns to legacy INT96, which
    # parquet writes WITHOUT min/max statistics — no footer exists for
    # the one column (event time) most predicates filter on, so
    # row-group/file skipping silently never happens on the time axis.
    # TIMESTAMP_MICROS is the modern annotated int64: full stats,
    # readable by every current engine.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def get_spark(
    app_name: str = "kafka-bigdata-jobs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32) so tests and
    bench.py share one code path; on a real cluster pass ``master=None``
    with ``SPARK_GRAFT_MASTER`` unset and spark-submit's master wins.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # Export the BLAS env for python WORKERS before the JVM launches
    # (local mode: workers inherit the driver process env via the JVM;
    # clusters: executorEnv below).  Must happen before getOrCreate —
    # a running JVM's env is immutable.  The driver's own numpy was
    # already initialized at package import, so the worker-only thread
    # bound cannot shrink the driver's BLAS pool (see _blas.py).
    from ._blas import export_worker_env

    worker_env = export_worker_env()
    builder = SparkSession.builder.appName(app_name).master(master)
    conf: dict[str, str] = {
        # local-mode default heap is 1g; the 32-thread local runner needs
        # real memory for wide aggregate folds / cached signatures.  Only
        # effective when this call creates the JVM (ignored on attach).
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        # The suite compiles hundreds of large whole-stage-codegen classes
        # (unrolled vector math, 64-aggregate signature folds); the JVM's
        # default 240 MB reserved code cache fills mid-run, JIT flushes /
        # stops compiling, and late queries run interpreted at 5-10x cost.
        # Only effective when this call creates the JVM.
        "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        # The compiled-class cache defaults to 100 entries; the 89-query
        # suite generates several hundred distinct codegen classes, so
        # eviction forces random queries to repay Janino+JIT compile —
        # the dominant run-to-run variance in bench timings.  Static
        # conf: must be set before the first codegen (session create).
        "spark.sql.codegen.cache.maxEntries": "2000",
        **RUNTIME_CONF,
        # 32 matches local test parallelism; AQE coalesces down when small
        # and a cluster deployment overrides upward.  Never the reference's
        # hard-coded 3.
        "spark.sql.shuffle.partitions": str(shuffle_partitions or 32),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        # Graceful stop for streaming queries (reference keeps this too:
        # streaming/job1_bots.py:25).
        "spark.streaming.stopGracefullyOnShutdown": "true",
        "spark.ui.enabled": "false",
        # Cluster twin of the local-mode env inheritance above: python
        # workers on executors get the same guarded BLAS settings.
        **{f"spark.executorEnv.{k}": v for k, v in worker_env.items()},
        **(extra_conf or {}),
    }
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply session-safe confs to an externally-created session.

    The correctness driver owns its own SparkSession; queries() callables
    route through this so UTC timezone + AQE hold regardless of who built
    the session.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — leave as-is
    ensure_package_shipped(spark)
    return spark


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to Python workers via ``addPyFile`` (once per
    SparkContext).

    A driver that imports the engine through a ``sys.path`` insert (the
    correctness driver runs from an arbitrary cwd) leaves Spark's Python
    WORKERS without the package: any closure cloudpickle serializes by
    reference — UDTF classes, the Python DataSource, a mapInPandas
    helper — dies on the worker with ModuleNotFoundError.  Zipping the
    package and ``addPyFile``-ing it makes every queries() callable
    location-independent.  No-op when the package is a normal installed/
    cwd-visible import AND workers share that view (local mode from the
    repo root), but shipping is cheap (~100 KB) and always correct.
    """
    sc = spark.sparkContext
    if sc is None or getattr(sc, "_kbj_pkg_shipped", False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    stem = os.path.join(
        tempfile.gettempdir(), f"kbj_spark_pkg_{os.getpid()}")
    try:
        zip_path = shutil.make_archive(
            stem, "zip", root_dir=parent,
            base_dir=os.path.basename(pkg_dir))
        sc.addPyFile(zip_path)
    except Exception:
        # Read-only tmp or an exotic deployment: leave import resolution
        # to the environment (the in-repo/local-mode path still works).
        pass
    sc._kbj_pkg_shipped = True
