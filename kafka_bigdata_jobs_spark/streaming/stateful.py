"""Custom stateful streaming: per-key sessionization with
``applyInPandasWithState`` (beyond-reference; the reference has no
custom state — SURVEY.md §2.10 lists it out of parity scope).

Semantics: events for a key belong to one session while the gap between
consecutive event times stays under ``gap``; a session closes when the
watermark passes its last event + gap, emitting one row
``(key, session_start, session_end, n_events, total_value)``.

Batch twin: :func:`sessionize_batch` computes identical sessions with
``session_window`` (and the suite oracles it in plain SQL as a
gaps-and-islands query), so the stateful operator has a golden output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = "start timestamp, last timestamp, n bigint, cents bigint"


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    State per key: (session start, last event time, count, cents sum).
    Events extend the open session or close it and start a new one;
    event-time timeout fires when the watermark passes last+gap and
    flushes the open session.  Output mode must be ``append``.
    """
    gap_ms = _duration_ms(gap)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, cents = state.get
                rows.append((user_id, start, last, n, cents))
            state.remove()
        else:
            events_pdf = _pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            if state.exists:
                start, last, n, cents = state.get
            else:
                start = last = None
                n = cents = 0
            for ts, val in zip(events_pdf["ts"], events_pdf["value"]):
                cts = ts.to_pydatetime()
                cval = int(round(float(val) * 100))
                if last is not None and (cts - last).total_seconds() * 1000 > gap_ms:
                    rows.append((user_id, start, last, n, cents))
                    start, n, cents = cts, 0, 0
                if start is None:
                    start = cts
                last = cts
                n += 1
                cents += cval
            state.update((start, last, n, cents))
            state.setTimeoutTimestamp(
                int(last.timestamp() * 1000) + gap_ms
            )
        if rows:
            yield _pd.DataFrame(
                rows,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "total_value_cents",
                ],
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin via ``session_window`` — the golden output for the
    stateful stream (and oracle-checkable as gaps-and-islands SQL)."""
    return (
        events.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "total_value_cents"
            ),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key_col, "session_start", "session_end", "n_events", "total_value_cents"
        )
    )


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(n) * mult


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): running per-key totals
# ---------------------------------------------------------------------------

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cum_events", T.LongType()),
        T.StructField("cum_cents", T.LongType()),
    ]
)


def running_user_totals(events: DataFrame, key_col: str = "user_id",
                        value_col: str = "value") -> DataFrame:
    """Streaming running totals per key via ``transformWithStateInPandas``
    (Spark 4's typed-state successor to ``applyInPandasWithState``:
    named ValueState/ListState/MapState handles + timers instead of one
    opaque tuple).  Each micro-batch emits the key's updated cumulative
    (event count, exact cents) — the incremental-metrics shape the
    reference approximates with sliding-window re-aggregation
    (streaming/job2.py:267-308) but with O(keys) state and
    update-not-recompute semantics.

    Batch twin for the duality test: ``groupBy(key).agg(count, sum)``
    must equal each key's LAST emitted update.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as _np
            import pandas as _pd

            n, cents = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                v = pdf[value_col].astype(float).to_numpy()
                # per-row half-away-from-zero cents, matching F.round(v*100)
                c = _np.sign(v) * _np.floor(_np.abs(v) * 100.0 + 0.5)
                cents += int(c.sum())
            self._state.update((n, cents))
            yield _pd.DataFrame(
                {"user_id": [key[0]], "cum_events": [n], "cum_cents": [cents]}
            )

        def close(self):
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
