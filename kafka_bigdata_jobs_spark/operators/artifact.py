"""Executor-side parquet side-inputs (torrent-style broadcast).

PySpark's ``sparkContext.broadcast`` requires materializing the payload
ON THE DRIVER first — for a corpus-sized matrix the ``collect()`` that
feeds it is the first thing that breaks at scale (round-1 VERDICT items
4/5).  The pattern here writes the side relation to parquet with a
DISTRIBUTED write (driver never holds the rows), and executors read it
directly, with a per-process cache so each worker pays the load once —
the same delivery shape as TorrentBroadcast, minus the driver hop.

On a real cluster ``artifact_dir`` must be shared storage (HDFS/S3 —
set ``spark.kbj.artifactDir``); locally it defaults to a session temp
dir cleaned at exit.  The memory bound moves from "driver heap" to
"executor heap per worker", which is the right place: workers are many
and sized for data, the driver is one and sized for coordination.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame

_SESSION_DIRS: list[str] = []


def _cleanup() -> None:
    for d in _SESSION_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def artifact_root(spark) -> str:
    root = spark.conf.get("spark.kbj.artifactDir", None)
    if root:
        os.makedirs(root, exist_ok=True)
        return root
    d = tempfile.mkdtemp(prefix="kbj_artifact_")
    _SESSION_DIRS.append(d)
    return d


def write_side_artifact(
    df: DataFrame, prefix: str = "side", partition_by: str | None = None
) -> str:
    """Distributed-write ``df`` to a parquet side-artifact; return path.

    ``partition_by`` hive-partitions the artifact so executors can load
    ONE partition (block) without touching the rest — the block×block
    Gram path reads exactly two blocks per task.

    Also registers THIS module for by-value pickling: consumer closures
    (mapInPandas ``gen``s) reference :func:`load_side_artifact`, and the
    Python workers spawned under the driver contract don't have the
    engine on sys.path — same serialization posture as
    ``sources/pydatasource.py``.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    path = os.path.join(
        artifact_root(df.sparkSession), f"{prefix}_{uuid.uuid4().hex[:8]}"
    )
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)
    return path


# Executor-side loader cache: worker processes are reused across tasks,
# so the artifact is read once per worker, not once per task.  Keyed by
# (path, subdir) — bounded: an artifact is a deliberately small side
# relation and the worker count bounds total copies.
_LOAD_CACHE: dict = {}


def load_side_artifact(path: str, subdir: str | None = None):
    """Executor-side: load the artifact (or one partition) as a pandas
    DataFrame, cached per worker process."""
    key = (path, subdir)
    if key not in _LOAD_CACHE:
        import glob as _glob

        import pyarrow.parquet as _pq

        target = os.path.join(path, subdir) if subdir else path
        if subdir and not os.path.isdir(target):
            import pandas as _pd

            _LOAD_CACHE[key] = _pd.DataFrame()
        else:
            # ignore _SUCCESS / hidden files; read all row files
            files = [
                f
                for f in _glob.glob(os.path.join(target, "**", "*.parquet"),
                                    recursive=True)
            ]
            _LOAD_CACHE[key] = (
                _pq.ParquetDataset(files).read().to_pandas()
                if files
                else _pq.read_table(target).to_pandas()
            )
    return _LOAD_CACHE[key]
