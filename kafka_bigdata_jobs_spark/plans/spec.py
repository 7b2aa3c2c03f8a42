"""JobSpec — the one lifecycle artifact this engine owns (SURVEY.md §3).

The reference repeats an ``__init__ / read / transform / start`` class
shape five times, each hard-wiring source, transforms and sinks.  A
JobSpec is that shape as data: a source factory, an ordered transform
chain (each a pure ``DataFrame -> DataFrame``), and named sinks.  The
runner executes it in batch or streaming mode — the spec itself is
mode-agnostic because every operator in this engine is.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class JobSpec:
    name: str
    source: Callable[[SparkSession], DataFrame]
    transforms: Sequence[Transform] = field(default_factory=list)

    def build(self, spark: SparkSession) -> DataFrame:
        """Compose the logical plan (no execution)."""
        df = self.source(spark)
        for t in self.transforms:
            df = t(df)
        return df

    def run_batch(self, spark: SparkSession) -> DataFrame:
        df = self.build(spark)
        if df.isStreaming:
            raise ValueError(f"job {self.name}: source is streaming; use run_stream")
        return df

    def run_stream(
        self,
        spark: SparkSession,
        sinks: Sequence,
        checkpoint: str,
        trigger: dict | None = None,
    ):
        from ..streaming.runner import run_multi_sink

        df = self.build(spark)
        if not df.isStreaming:
            raise ValueError(f"job {self.name}: source is batch; use run_batch")
        return run_multi_sink(
            df, sinks, checkpoint=checkpoint, trigger=trigger, query_name=self.name
        )
