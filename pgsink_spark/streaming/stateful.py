"""Custom stateful streaming operators (applyInPandasWithState).

Where the built-in windows/dedup can't express the semantics, Spark's
arbitrary-stateful API is the designated escape hatch (SURVEY §2.F).
Implemented here: a per-user running session tracker that emits one row
per closed session — state is (last_ts, start_ts, n_events) per user,
expired via processing-time timeouts so state stays bounded (the
100 TB requirement on every stateful op).

Works identically under batch replay tests (availableNow trigger) and a
live stream.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("closed", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _track(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's events into the user's open session.

    Emits a row per session closed by a gap inside the batch, plus (on
    timeout) the final open session. Timestamps travel as epoch micros
    inside the state tuple (state schemas take primitives).
    """
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "closed": [True],
                }
            )
        return

    ts_all = []
    for pdf in pdf_iter:
        ts_all.append(pdf["ts"])
    ts = pd.concat(ts_all).sort_values()
    micros = (ts.astype("int64") // 1000).to_numpy()

    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    out = []
    for t in micros:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us > SESSION_GAP_S * 1_000_000:
            out.append((user_id, start_us, last_us, n, True))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1
    state.update((int(start_us), int(last_us), int(n)))
    try:
        state.setTimeoutDuration(60_000)  # close idle sessions after 60s
    except Exception:  # noqa: BLE001 — NoTimeout mode (batch replay tests)
        pass
    if out:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                "n_events": [r[3] for r in out],
                "closed": [r[4] for r in out],
            }
        )


def session_tracker(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Custom gap-sessionizer over a streaming events frame.

    ``events`` needs (user_id, ts TimestampType). Complements the
    built-in ``session_window`` agg with arbitrary per-session logic
    (here: closed-flag emission; extend the fold for custom features).

    ``timeout`` defaults to NoTimeout so an availableNow replay
    terminates when data is exhausted; a live deployment passes
    ``GroupStateTimeout.ProcessingTimeTimeout`` so idle sessions flush
    and state stays bounded (a ProcessingTimeTimeout query under
    availableNow never terminates — it keeps scheduling batches to fire
    timeouts).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
