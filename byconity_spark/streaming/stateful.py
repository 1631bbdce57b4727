"""Custom stateful streaming operators (applyInPandasWithState).

ByConity's behavioral aggregates (sessionSplit et al.,
src/AggregateFunctions/AggregateFunctionSessionSplit.cpp) are batch UDAFs;
the streaming counterpart needs explicit per-key state that survives
micro-batches.  Spark's contract for that is
``groupBy(key).applyInPandasWithState`` — the kernel sees (key, batch
iterator, state handle) and owns what persists between batches.

``stateful_sessionize`` keeps ONE open session per user in state:
  * events are merged with the open session if the silence gap to the
    session's last event is <= gap; otherwise the open session CLOSES
    (emitted this batch) and a new one opens;
  * the final open session per user stays in state and is NOT emitted
    until a later batch closes it — so emitted rows are exactly the
    sessions whose closure the stream has proven.  (An event-time timeout
    would flush idle sessions; the driver fixture replays a finite file
    stream, so closure-by-successor is the testable contract and the
    timeout path is configuration, not logic.)

Scale: state is O(1) per active user (five scalars), sharded by the
stream's groupBy(user) exchange; each micro-batch touches only the users
present in that batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# state: microsecond epochs (timestamps are not state-codable primitives)
_STATE_SCHEMA = "start_us long, last_us long, n long, total double"


def _sessionize_kernel(gap_us: int, idle_flush: bool = False):
    def fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if idle_flush and state.hasTimedOut:
            # watermark passed last_event + gap with no successor: the open
            # session is provably closed — flush it and drop the state
            start_us, last_us, n, total = state.get
            state.remove()
            out = pd.DataFrame(
                [(user_id, start_us, last_us, n, total)],
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out
            return
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = None, None, 0, 0.0
        closed: list[tuple[int, int, int, int, float]] = []
        for pdf in pdfs:
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            order = us.argsort(kind="stable")
            vals = pdf["value"].to_numpy()
            for i in order:
                t = int(us[i])
                v = float(vals[i])
                if start_us is None:
                    start_us, last_us, n, total = t, t, 1, v
                elif t - last_us <= gap_us:
                    last_us, n, total = t, n + 1, total + v
                else:
                    closed.append((user_id, start_us, last_us, n, total))
                    start_us, last_us, n, total = t, t, 1, v
        state.update((start_us, last_us, n, total))
        if idle_flush and last_us is not None:
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return fn


def stateful_sessionize(
    stream: DataFrame,
    gap_us: int = 1_800_000_000,
    idle_flush: bool = False,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Session rows for every CLOSED session (see module doc for the
    open-session contract).  Input needs (user_id, ts, value).

    With ``idle_flush`` the stream carries a watermark on ``ts`` and open
    sessions are ALSO emitted once the watermark proves no in-gap successor
    can arrive (EventTimeTimeout) — the production contract for unbounded
    streams, where closure-by-successor alone would pin idle users' state
    forever."""
    src = stream
    timeout = GroupStateTimeout.NoTimeout
    if idle_flush:
        src = src.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    return (
        src.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_kernel(gap_us, idle_flush),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def fan_out_sinks(
    stream: DataFrame,
    sinks: dict[str, str],
    checkpoint: str,
    transforms: dict[str, Any] | None = None,
):
    """foreachBatch multi-sink: one streaming query feeding N parquet sinks
    (optionally each through its own transform).  Exactly-once composition:
    the batch_id-deterministic transforms + parquet append make replays
    idempotent at the file-manifest level, matching the reference's
    one-consumer-many-MVs layout (StorageMaterializedView.h:129).

    ``sinks`` maps sink name -> output path.  Returns the StreamingQuery.
    """
    transforms = transforms or {}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for name, path in sinks.items():
                out = batch_df
                t = transforms.get(name)
                if t is not None:
                    out = t(out)
                out.write.mode("append").parquet(path)
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
