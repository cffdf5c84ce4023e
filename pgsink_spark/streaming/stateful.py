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


# ---------------------------------------------------------------------------
# Per-key EWMA anomaly detector
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.2
ANOMALY_Z = 3.0

ANOMALY_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("ewma", T.DoubleType(), False),
        T.StructField("zscore", T.DoubleType(), False),
    ]
)

ANOMALY_STATE = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _detect(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Exponentially-weighted mean/variance per key; emit rows whose
    deviation exceeds ANOMALY_Z sigmas of the state BEFORE the update
    (an outlier must not first inflate the baseline it is judged by).

    State is three scalars per key — bounded regardless of stream
    length, the 100 TB requirement. The fold is a tight NumPy loop over
    the micro-batch (state transitions are inherently sequential per
    key; cross-key parallelism comes from the groupBy partitioning).
    """
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    frames = [pdf for pdf in pdf_iter]
    pdf = pd.concat(frames).sort_values("ts")
    mean, var, n = state.get if state.exists else (0.0, 0.0, 0)

    import numpy as np

    vals = pdf["value"].to_numpy(dtype="float64")
    out_idx, out_ewma, out_z = [], [], []
    a = EWMA_ALPHA
    for i, v in enumerate(vals):
        if n >= 5:  # baseline warm: judge v against the pre-update state
            sd = np.sqrt(var) if var > 0 else 0.0
            z = (v - mean) / sd if sd > 0 else 0.0
            if abs(z) >= ANOMALY_Z:
                out_idx.append(i)
                out_ewma.append(mean)
                out_z.append(z)
        # West's EWMA mean/variance update
        delta = v - mean
        incr = a * delta
        mean = mean + incr
        var = (1.0 - a) * (var + delta * incr)
        n += 1

    state.update((float(mean), float(var), int(n)))
    if out_idx:
        sel = pdf.iloc[out_idx]
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_idx),
                "ts": sel["ts"].to_list(),
                "value": sel["value"].to_list(),
                "ewma": out_ewma,
                "zscore": out_z,
            }
        )


def anomaly_detector(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming per-key anomaly detection: EWMA mean/variance state,
    emit events ≥ ANOMALY_Z sigmas from the running baseline.

    ``events`` needs (user_id, ts TimestampType, value double). The
    second custom stateful operator (§2.F) beside the session tracker:
    sessionization shows gap logic, this shows numeric state evolution
    — together they cover the applyInPandasWithState surface
    (accumulate, judge-before-update, bounded per-key state).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _detect,
        outputStructType=ANOMALY_OUTPUT,
        stateStructType=ANOMALY_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


ATTRIBUTION_WINDOW_S = 86400

ATTR_OUTPUT = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("attributed", T.BooleanType(), False),
        T.StructField("lag_s", T.LongType(), True),
    ]
)

ATTR_STATE = T.StructType([T.StructField("last_click_us", T.LongType())])


def _attribute(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Last-touch attribution fold: one timestamp of state per user.

    Rows are processed in (ts, event_id) order; a purchase is judged
    against the click state BEFORE the current row (strictly-preceding
    semantics — identical to d71's ``ROWS ... 1 PRECEDING`` frame), and
    lag is whole epoch-seconds (floor on each side, matching
    ``date_diff('second', ...)``).
    """
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    (last_click_us,) = state.get if state.exists else (None,)

    ts_us = pdf["ts"].astype("int64").to_numpy() // 1000
    out = {"event_id": [], "user_id": [], "attributed": [], "lag_s": []}
    for eid, etype, t_us in zip(
        pdf["event_id"].to_numpy(), pdf["event_type"].to_numpy(), ts_us
    ):
        if etype == "purchase":
            lag = (
                None
                if last_click_us is None
                else int(t_us // 1_000_000 - last_click_us // 1_000_000)
            )
            ok = lag is not None and lag <= ATTRIBUTION_WINDOW_S
            out["event_id"].append(int(eid))
            out["user_id"].append(user_id)
            out["attributed"].append(ok)
            out["lag_s"].append(lag if ok else None)
        if etype == "click":
            last_click_us = int(t_us)

    state.update((int(last_click_us) if last_click_us is not None else None,))
    if out["event_id"]:
        yield pd.DataFrame(out)


def attribution_tracker(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming last-touch conversion attribution: per-user state is
    ONE timestamp (the latest click), purchases emit an attribution
    row judged against it. The third custom stateful operator (§2.F):
    the batch twin d71 computes the identical result declaratively
    with a running conditional MAX, and the oracle pins stream ==
    batch row-for-row.

    ``events`` needs (event_id, user_id, ts TimestampType,
    event_type). State is bounded at one scalar per live user —
    timeout-expirable, the 100 TB requirement.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _attribute,
        outputStructType=ATTR_OUTPUT,
        stateStructType=ATTR_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


ROLL_WINDOW = 20
ROLL_MIN_N = 8
ROLL_Z = 3.0

ROLL_OUTPUT = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("z", T.DoubleType(), False),
    ]
)

# bounded ring buffer of the trailing window, newest-last
ROLL_STATE = T.StructType(
    [T.StructField("window", T.ArrayType(T.DoubleType()))]
)


def _roll_zscore(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Trailing-window z-score fold: state is the user's last
    ROLL_WINDOW values (bounded — the 100 TB requirement). Each event
    is judged against the window BEFORE it enters (self-exclusion,
    matching d69's ``1 PRECEDING`` frame), with sample stddev and the
    same 4-dp rounding the batch twin applies before its ≥3 cut.
    """
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    import numpy as np

    pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    (window,) = state.get if state.exists else ([],)
    window = list(window)

    out = {"event_id": [], "user_id": [], "z": []}
    for eid, v in zip(
        pdf["event_id"].to_numpy(), pdf["value"].to_numpy(dtype="float64")
    ):
        if len(window) >= ROLL_MIN_N:
            arr = np.asarray(window)
            mu = float(arr.mean())
            sd = float(arr.std(ddof=1))
            if sd > 0:
                # replicate the batch twin's two-stage HALF_UP
                # rounding (cast DECIMAL(24,6) then ROUND(.., 4)) —
                # pandas' half-even rounding differs one ulp on
                # x.xxxx5 boundaries
                from decimal import ROUND_HALF_UP, Decimal

                d = Decimal(repr((v - mu) / sd)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                ).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
                z = float(d)
                if abs(z) >= ROLL_Z:
                    out["event_id"].append(int(eid))
                    out["user_id"].append(user_id)
                    out["z"].append(z)
        window.append(float(v))
        if len(window) > ROLL_WINDOW:
            window.pop(0)

    state.update((window,))
    if out["event_id"]:
        yield pd.DataFrame(out)


def rolling_zscore_detector(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming trailing-window anomaly detection — the stateful twin
    of the batch window query d69_rolling_zscore. Fourth custom
    stateful operator: ring-buffer state (20 doubles per live user),
    judge-before-update, bounded regardless of stream length.

    ``events`` needs (event_id, user_id, ts TimestampType, value).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _roll_zscore,
        outputStructType=ROLL_OUTPUT,
        stateStructType=ROLL_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


CUSUM_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("s", T.DoubleType(), False),
    ]
)

CUSUM_STATE = T.StructType([T.StructField("s", T.DoubleType())])


def _cusum(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Page's-test fold: one accumulator scalar per key, reset after
    each alarm — float-identical to the batch twin d74 (same
    sequential order, same two-stage HALF_UP rounding on emit)."""
    from pgsink_spark.operators.relational import CUSUM_H, CUSUM_K

    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    from decimal import ROUND_HALF_UP, Decimal

    pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    (s,) = state.get if state.exists else (0.0,)
    out = {"user_id": [], "event_id": [], "s": []}
    for eid, v in zip(pdf["event_id"].to_numpy(), pdf["value"].to_numpy()):
        s = max(0.0, s + float(v) - CUSUM_K)
        if s > CUSUM_H:
            d = Decimal(repr(s)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            ).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
            out["user_id"].append(user_id)
            out["event_id"].append(int(eid))
            out["s"].append(float(d))
            s = 0.0
    state.update((float(s),))
    if out["user_id"]:
        yield pd.DataFrame(out)


def cusum_detector(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming CUSUM changepoint detection — fifth custom stateful
    operator (§2.F): ONE scalar of keyed state, alarm-and-reset
    semantics, batch/stream equality pinned against the same
    recursive-CTE oracle as d74_cusum_changepoints.

    ``events`` needs (event_id, user_id, ts TimestampType, value).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _cusum,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# SCD Type-2 version tracker
# ---------------------------------------------------------------------------

SCD2_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("valid_from", T.TimestampType(), False),
        T.StructField("valid_to", T.TimestampType(), False),
    ]
)

# the OPEN version per key: its own timestamp, ordinal, and payload
SCD2_STATE = T.StructType(
    [
        T.StructField("from_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _scd2(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold a micro-batch of change events into the key's open SCD2
    version: each arriving event CLOSES the open version (emitting it
    with valid_to = the new event's timestamp) and becomes the new open
    version. State is exactly one (from_us, event_id, value) triple per
    key — the open interval; closed intervals leave state immediately.
    """
    user_id, event_type = key
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    open_ver = state.get if state.exists else None
    out = {
        "user_id": [],
        "event_type": [],
        "event_id": [],
        "value": [],
        "valid_from": [],
        "valid_to": [],
    }
    micros = (pdf["ts"].astype("int64") // 1000).to_numpy()
    for t, eid, v in zip(
        micros, pdf["event_id"].to_numpy(), pdf["value"].to_numpy()
    ):
        if open_ver is not None:
            from_us, prev_eid, prev_val = open_ver
            out["user_id"].append(user_id)
            out["event_type"].append(event_type)
            out["event_id"].append(int(prev_eid))
            out["value"].append(float(prev_val))
            out["valid_from"].append(pd.Timestamp(from_us, unit="us"))
            out["valid_to"].append(pd.Timestamp(t, unit="us"))
        open_ver = (int(t), int(eid), float(v))
    state.update(open_ver)
    if out["user_id"]:
        yield pd.DataFrame(out)


def scd2_tracker(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming SCD Type-2 maintenance — the live twin of the batch
    a19_scd2_history operator: keyed on the dimension PK
    (user_id, event_type), each change event closes the previous
    version with its validity interval. The still-open (current)
    version stays in state, so the stream's emitted rows are exactly
    the batch history filtered to ``valid_to IS NOT NULL``.

    ``events`` needs (event_id, user_id, event_type, ts TimestampType,
    value). State is one scalar triple per key — bounded by live key
    cardinality, never by history length.

    ORDERING CONTRACT: arrivals must be (ts, event_id)-monotone PER KEY
    across micro-batches (within a batch the fold sorts). That is the
    CDC source's guarantee — the walsender emits each key's changes in
    (lsn, sequence) order and the repo's sources preserve it — but a
    key whose event arrives with ts earlier than the open version's
    would close it with an inverted interval and diverge from the
    batch twin. For out-of-order feeds, bound the disorder with a
    watermark and sort within the allowed lateness BEFORE this
    operator (the standard Spark pattern for order-sensitive state).
    """
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _scd2,
        outputStructType=SCD2_OUTPUT,
        stateStructType=SCD2_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Online per-group sample maintenance (hash-priority reservoir)
# ---------------------------------------------------------------------------

RESERVOIR_K = 50

EVICT_OUTPUT = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)

# the group's current sample frontier: parallel (hash, id) arrays,
# sorted by (hash, id), length ≤ RESERVOIR_K
EVICT_STATE = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.StringType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)


def _evict(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Maintain the group's deterministic k-sample online and emit the
    REJECTED rows. Membership in the final sample is the hash-priority
    top-k, so rejection is MONOTONE — once a row falls outside the
    frontier it can never re-enter — which makes evictions valid
    append-mode output while the sample itself stays in state. Each row
    is emitted at most once: on arrival (if it misses the frontier) or
    at the later arrival that displaces it."""
    import hashlib as _hl

    (source,) = key
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    hs, ids = state.get if state.exists else ([], [])
    frontier = list(zip(hs, ids))
    arrivals = pd.concat(list(pdf_iter))["doc_id"].to_numpy()
    merged = frontier + [
        (_hl.md5(str(int(d)).encode()).hexdigest(), int(d))
        for d in arrivals
    ]
    merged.sort()
    keep, rejects = merged[:RESERVOIR_K], merged[RESERVOIR_K:]
    state.update(([h for h, _ in keep], [i for _, i in keep]))
    # frontier rows were never emitted, so evicted ex-frontier rows and
    # straight-to-reject arrivals are both first-time emissions here
    if rejects:
        yield pd.DataFrame(
            {
                "source": [source] * len(rejects),
                "doc_id": [i for _, i in rejects],
            }
        )


def reservoir_evictions(
    docs: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming twin of the batch per-group hash sample
    (sample_group_topk): state holds each group's current k-row sample
    frontier (≤ RESERVOIR_K (hash, id) pairs), and the stream emits
    rejections. sample == all − emitted, and both are batch-identical
    regardless of how arrivals split across micro-batches.

    ``docs`` needs (source, doc_id).
    """
    return docs.groupBy("source").applyInPandasWithState(
        _evict,
        outputStructType=EVICT_OUTPUT,
        stateStructType=EVICT_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# funnel tracker (stream_funnel)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("signup", "view", "purchase")

FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("signup_id", T.LongType(), False),
        T.StructField("view_id", T.LongType(), False),
        T.StructField("purchase_id", T.LongType(), False),
        T.StructField("funnel_s", T.LongType(), False),
    ]
)

# stage: 0 = awaiting signup, 1 = awaiting view, 2 = awaiting purchase,
# 3 = funnel already emitted (terminal — one funnel per user)
FUNNEL_STATE = T.StructType(
    [
        T.StructField("stage", T.LongType()),
        T.StructField("s_id", T.LongType()),
        T.StructField("s_us", T.LongType()),
        T.StructField("v_id", T.LongType()),
    ]
)


def _funnel(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Ordered-sequence fold: rows advance a 3-stage cursor in
    (ts, event_id) order; the first completion emits one row and the
    cursor parks at the terminal stage. Greedy-earliest semantics —
    identical to the oracle's chained QUALIFY row_number()=1 picks."""
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    stage, s_id, s_us, v_id = (
        state.get if state.exists else (0, None, None, None)
    )
    ts_us = pdf["ts"].astype("int64").to_numpy() // 1000
    out = None
    for eid, etype, t_us in zip(
        pdf["event_id"].to_numpy(), pdf["event_type"].to_numpy(), ts_us
    ):
        if stage == 0 and etype == "signup":
            stage, s_id, s_us = 1, int(eid), int(t_us)
        elif stage == 1 and etype == "view":
            stage, v_id = 2, int(eid)
        elif stage == 2 and etype == "purchase":
            stage = 3
            out = pd.DataFrame(
                {
                    "user_id": [user_id],
                    "signup_id": [s_id],
                    "view_id": [v_id],
                    "purchase_id": [int(eid)],
                    "funnel_s": [
                        int(t_us) // 1_000_000 - s_us // 1_000_000
                    ],
                }
            )

    state.update((stage, s_id, s_us, v_id))
    if out is not None:
        yield out


def funnel_tracker(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming funnel detection (signup → view → purchase): per-user
    state is a 4-field cursor; a completed funnel emits exactly once.
    The sequential-pattern operator (MATCH_RECOGNIZE's simplest useful
    shape) that no built-in streaming primitive expresses.

    State is O(1) per live user and timeout-expirable — on an
    unbounded stream, parked terminal cursors age out exactly like
    open sessions (the 100 TB requirement on every stateful op).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel,
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# band-index near-dup prober (stream_band_neardup)
# ---------------------------------------------------------------------------

BAND_OUTPUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("dup_of", T.LongType(), True),
    ]
)

# one long of state per live band bucket: the minimum doc_id seen
BAND_STATE = T.StructType([T.StructField("min_doc", T.LongType())])


def _band_probe(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Running-min fold per band bucket: each arriving (doc, band) row
    reports the earliest doc already in the bucket (None if it is the
    first), then the bucket's min updates. Min is order-independent,
    so any doc_id-sorted replay reproduces the same verdicts."""
    if state.hasTimedOut:  # pragma: no cover — live-mode state expiry
        state.remove()
        return

    pdf = pd.concat(list(pdf_iter)).sort_values("doc_id")
    (min_doc,) = state.get if state.exists else (None,)
    docs = pdf["doc_id"].to_numpy()
    dups = []
    for d in docs:
        d = int(d)
        dups.append(min_doc if (min_doc is not None and min_doc < d) else None)
        if min_doc is None or d < min_doc:
            min_doc = d
    state.update((min_doc,))
    yield pd.DataFrame({"doc_id": [int(d) for d in docs], "dup_of": dups})


def band_neardup_prober(chunks: DataFrame) -> DataFrame:
    """Streaming near-dup triage against a band index built ON THE
    STREAM: grouped by simhash band bucket, each document probes the
    bucket's running-min doc_id — any hit means a candidate near-dup
    with an EARLIER document. State is one long per live bucket.

    ``chunks`` needs (doc_id, ck) — one row per (document, band).
    """
    return chunks.groupBy("ck").applyInPandasWithState(
        _band_probe,
        outputStructType=BAND_OUTPUT,
        stateStructType=BAND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming per-window top-k (stateful operator #10)
# ---------------------------------------------------------------------------

TOPK_K = 3

TOPK_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("rank", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

# bounded by construction: the open window's start + K (value, id)
# slots — NOT the window's row census (a collect_list-style windowed
# agg would hold every row until the watermark closes the window)
TOPK_STATE = T.StructType(
    [T.StructField("win_us", T.LongType())]
    + [T.StructField(f"v{i}", T.DoubleType()) for i in range(TOPK_K)]
    + [T.StructField(f"e{i}", T.LongType()) for i in range(TOPK_K)]
)


def _topk_rows(event_type: str, win_us: int, top: list) -> "pd.DataFrame":
    return pd.DataFrame(
        {
            "event_type": [event_type] * len(top),
            "window_start": [pd.Timestamp(win_us, unit="us")] * len(top),
            "rank": list(range(1, len(top) + 1)),
            "event_id": [e for _, e in top],
            "value": [v for v, _ in top],
        }
    )


def _topk(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this batch's events into the key's open tumbling window,
    keeping only the K best (value desc, event_id asc) in state;
    emit a window's top-k exactly once, when a LATER window's first
    event closes it (same emit-on-close contract as the sessionizer:
    the final open window stays in state)."""
    (event_type,) = key
    if state.hasTimedOut:  # pragma: no cover — live mode only
        state.remove()
        return

    pdf = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    micros = (pdf["ts"].astype("int64") // 1000).to_numpy()
    day_us = 86_400_000_000
    if state.exists:
        s = state.get
        win_us = s[0]
        top = [
            (s[1 + i], s[1 + TOPK_K + i])
            for i in range(TOPK_K)
            if s[1 + i] is not None
        ]
    else:
        win_us, top = None, []

    def insert(top: list, v: float, e: int) -> list:
        top.append((v, e))
        top.sort(key=lambda t: (-t[0], t[1]))
        return top[:TOPK_K]

    for t_us, e_id, val in zip(
        micros, pdf["event_id"].to_numpy(), pdf["value"].to_numpy()
    ):
        w = int(t_us) // day_us * day_us
        if win_us is None:
            win_us = w
        elif w > win_us:
            yield _topk_rows(event_type, win_us, top)
            win_us, top = w, []
        elif w < win_us:
            # late row for an already-closed window: dropped, exactly
            # what a watermark would do (the emitted ranking is final)
            continue
        top = insert(top, float(val), int(e_id))
    vs = [top[i][0] if i < len(top) else None for i in range(TOPK_K)]
    es = [top[i][1] if i < len(top) else None for i in range(TOPK_K)]
    state.update((int(win_us), *vs, *es))


def window_topk_tracker(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming per-(event_type, day-window) top-k by value with
    BOUNDED state — the rank query Structured Streaming's built-in
    windowed aggregates cannot express without collecting every row of
    the window (collect_list state grows with the window census; this
    state is K slots + a timestamp per key, period). Emission follows
    the emit-on-close rule: a window's ranking is final the moment a
    later window's first event arrives on that key.

    ``events`` needs (event_id, ts TimestampType, event_type, value).
    """
    return events.groupBy("event_type").applyInPandasWithState(
        _topk,
        outputStructType=TOPK_OUTPUT,
        stateStructType=TOPK_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
