"""Spark 4 Python DataSource: deterministic tweet-replay generator.

The reference's ingest side is two Kafka producer scripts replaying CSV
tweet corpora at a fixed rate (`producers/kafka_producer_bitcoin.py:
92-124`, seeded `sample(n, random_state=42)` at `:100`).  Re-expressed
Spark-first, replay is a *data source*, not an external process: the
Python DataSource API (Spark 4) lets the generator run inside the scan
stage — each partition generates its own slice in parallel on the
executors, so there is no driver bottleneck, no broker dependency in
tests, and the same source serves `spark.read` (bounded corpus) and
`spark.readStream` (micro-batched replay with real offset tracking).

Scale: generation is embarrassingly parallel (`numPartitions` splits
the id range); downstream transforms see an ordinary DataFrame with
the canonical tweet schema, so every batch/streaming job runs on it
unchanged.  Determinism: row i is a pure function of (seed, i) —
re-running a batch or restarting a stream from an offset reproduces
byte-identical rows (the replay analogue of the reference's fixed
`random_state`).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from ..schemas import TWEET_SCHEMA

_CRYPTOS = ("bitcoin", "ethereum")
_SOURCES = ("Twitter Web App", "Twitter for iPhone", "Twitter for Android", "bot_client")
_LOCATIONS = ("", "London", "NYC", "Unknown", "madrid", "Tokyo 🗼", "remote")
_TAGS = ("btc", "eth", "crypto", "hodl", "defi", "nft", "moon")
_WORDS = (
    "buy", "sell", "moon", "dip", "pump", "great", "terrible", "love",
    "crash", "bullish", "bearish", "hold", "market", "price", "news",
)


def _tweet(seed: int, i: int) -> tuple:
    """Row i as a pure function of (seed, i) — stable across restarts."""
    import random

    rng = random.Random((seed << 32) ^ i)
    crypto = _CRYPTOS[i % 2]
    n_words = rng.randint(3, 12)
    text = " ".join(rng.choice(_WORDS) for _ in range(n_words))
    tags = sorted(rng.sample(_TAGS, rng.randint(0, 3)))
    hashtags = "[" + ", ".join(f"'{t}'" for t in tags) + "]" if tags else "[]"
    base = 1_600_000_000 + i  # one tweet/sec from a fixed epoch
    ts = __import__("datetime").datetime.utcfromtimestamp(base)
    created = __import__("datetime").datetime.utcfromtimestamp(
        base - rng.randint(10_000, 100_000_000)
    )
    return (
        crypto,
        f"user_{rng.randint(0, 499)}",
        rng.choice(_LOCATIONS),
        f"desc {rng.choice(_WORDS)}",
        created.strftime("%Y-%m-%d %H:%M:%S"),
        rng.randint(0, 100_000),
        rng.randint(0, 5_000),
        rng.randint(0, 50_000),
        rng.random() < 0.05,
        ts.strftime("%Y-%m-%d %H:%M:%S"),
        text,
        hashtags,
        rng.choice(_SOURCES),
        rng.random() < 0.3,
        ts.strftime("%Y-%m-%dT%H:%M:%S"),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _TweetBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _tweet(self.seed, i)


class _TweetStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched replay: offset = next row id.  ``read`` serves
    ``rowsPerBatch`` new rows per trigger; ``readBetweenOffsets``
    regenerates any range deterministically for recovery."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 10_000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.per_batch, self.max_rows)
        return iter([_tweet(self.seed, i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_tweet(self.seed, i) for i in range(start["next"], end["next"])])


class TweetReplayDataSource(DataSource):
    """``spark.read.format("tweet_replay")`` after
    ``spark.dataSource.register(TweetReplayDataSource)``.

    Options: ``rows``, ``numPartitions``, ``seed`` (batch);
    ``rowsPerBatch``, ``maxRows``, ``seed`` (stream).
    """

    @classmethod
    def name(cls):
        return "tweet_replay"

    def schema(self):
        return TWEET_SCHEMA

    def reader(self, schema):
        return _TweetBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _TweetStreamReader(self.options)


class _FileCommit(WriterCommitMessage):
    """Per-task commit message: the temp file the task wrote."""

    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    """Task side of the sink's exactly-once protocol: write to a
    uniquely-named ``.tmp`` file, report it in the commit message.
    Nothing becomes visible until the driver's ``commit`` publishes a
    manifest — a speculative/retried task just leaves an orphaned temp
    file that ``abort`` (or the next commit's manifest scope) ignores.

    This is the Spark-native re-expression of the reference's external
    sink (streaming/elk_sender.py:107-128, per-row HTTP posts with no
    atomicity): batch the rows, stage them, publish atomically.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_archive requires .option('path', ...)")

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit(tmp, n)

    def _publish(self, messages, manifest_name: str):
        import json
        import os

        final_files = []
        total = 0
        for m in messages:
            if m is None:
                continue
            final = m.tmp_path.replace(".tmp", "").replace("/.part-", "/part-")
            os.replace(m.tmp_path, final)
            # Touch at publish: rename preserves the WRITE-time mtime, so
            # a slow commit whose data landed > gc min_age_s ago would be
            # GC-eligible the instant it publishes.  Re-stamping makes
            # gc_archive's age guard key off commit time (ADVICE r1).
            os.utime(final, None)
            final_files.append(os.path.basename(final))
            total += m.rows
        manifest = os.path.join(self.path, manifest_name)
        with open(manifest + ".tmp", "w") as f:
            json.dump({"files": sorted(final_files), "rows": total}, f)
        # os.replace is atomic: a manifest is either absent or complete,
        # and a replayed micro-batch (same batchId after restart)
        # overwrites rather than duplicates its manifest.
        os.replace(manifest + ".tmp", manifest)

    def commit(self, messages):
        self._publish(messages, "_manifest-batch.json")

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _JsonlStreamWriter(DataSourceStreamWriter, _JsonlWriter):
    """Streaming face: one manifest per micro-batch, keyed by batchId,
    so checkpoint-recovery replays of a batch republish (idempotent)
    instead of appending duplicates."""

    # DataSourceStreamWriter precedes _JsonlWriter in the MRO, so its
    # abstract ``write`` would otherwise shadow the concrete one.
    write = _JsonlWriter.write

    def commit(self, messages, batchId):
        self._publish(messages, f"_manifest-{batchId:020d}.json")

    def abort(self, messages, batchId):
        _JsonlWriter.abort(self, messages)


class JsonlArchiveDataSource(DataSource):
    """``df.write.format("jsonl_archive").option("path", d)`` — batch
    and streaming JSONL sink with manifest-commit exactly-once
    semantics.  Readers consume only manifest-listed files (see
    ``read_archive_manifests``); temp files from failed or speculative
    tasks are invisible."""

    @classmethod
    def name(cls):
        return "jsonl_archive"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)


def read_archive_manifests(path: str) -> tuple[list[str], int]:
    """Driver-side helper: the committed view of an archive directory —
    (sorted file names, total rows) across all manifests."""
    import glob
    import json
    import os

    files: list[str] = []
    rows = 0
    for man in sorted(glob.glob(os.path.join(path, "_manifest-*.json"))):
        with open(man) as f:
            d = json.load(f)
        files.extend(d["files"])
        rows += d["rows"]
    return sorted(files), rows


def gc_archive(path: str, min_age_s: float = 3600.0) -> tuple[int, int]:
    """Garbage-collect an archive directory against its manifests.

    Two kinds of garbage accumulate under the staged-commit protocol:
    ``.part-*.jsonl.tmp`` orphans from failed/speculative tasks whose
    ``abort`` never ran, and renamed ``part-*.jsonl`` files whose
    publishing crashed BETWEEN the renames and the manifest write (the
    one non-atomic window — readers never see them because reads go
    through manifests, but the bytes stay).  Both are deleted once
    older than ``min_age_s``; the age guard keeps GC from racing an
    in-flight commit.  ``_publish`` re-stamps mtime at publish time
    (rename preserves write-time mtime), so the guard measures age
    since COMMIT, not since the task wrote the bytes — a commit slower
    than ``min_age_s`` still publishes safely; only its pre-rename
    ``.tmp`` files must beat the clock (a task's .tmp lives from task
    end until the driver-side commit renames it), so size ``min_age_s``
    above the worst-case write-to-commit lag — bounded by job duration.
    Returns (orphan_tmp_removed, unreferenced_removed).
    """
    import glob
    import os
    import time

    referenced, _ = read_archive_manifests(path)
    referenced_set = set(referenced)
    now = time.time()
    n_tmp = n_unref = 0
    for p in glob.glob(os.path.join(path, ".part-*.jsonl.tmp")):
        if now - os.path.getmtime(p) >= min_age_s:
            os.remove(p)
            n_tmp += 1
    for p in glob.glob(os.path.join(path, "part-*.jsonl")):
        if os.path.basename(p) not in referenced_set and (
            now - os.path.getmtime(p) >= min_age_s
        ):
            os.remove(p)
            n_unref += 1
    return n_tmp, n_unref


def register_tweet_replay(spark) -> None:
    # The data source class is recreated inside a dedicated Python
    # worker process that does NOT inherit the driver's sys.path, so a
    # by-reference pickle ("import kafka_bigdata_jobs_spark...") fails
    # whenever the engine isn't installed on the workers.  Serialize
    # this module by value instead — it is self-contained on purpose.
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(TweetReplayDataSource)
    spark.dataSource.register(JsonlArchiveDataSource)
