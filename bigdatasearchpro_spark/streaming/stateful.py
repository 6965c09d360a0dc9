"""Custom stateful streaming operator (SURVEY.md §2.9 / §2.11):
gap-based sessionization via ``applyInPandasWithState``.

``F.session_window`` covers declarative sessions; this operator is the
*arbitrary-state* form — the pattern to copy whenever the per-key logic
can't be said in SQL (running ML features, CUSUM/anomaly state, dedup
rings, …). The reference has no analogue (its only state is the 200k-row
app buffer, reference ``BulkProcessImpl.java:104,120``).

Scale design: state is partitioned by the grouping key and lives in the
executor state store (RocksDB on a real cluster), so 1000 executors
shard it horizontally; the watermark bounds it — event-time timeouts
evict idle keys, so state size tracks *active* users, not all users
ever seen. Arrow moves each key-group batch into pandas in one block,
not row-at-a-time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
# epoch microseconds for the timestamps: plain longs cross the Arrow
# state boundary with no timezone ambiguity.
STATE_SCHEMA = "start bigint, last bigint, n int, s double"

_US = 1_000_000


def _to_us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)  # ns -> us


def sessionize_with_state(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "60 minutes",
) -> DataFrame:
    """Emit one row per *closed* session (closed by a ``gap_minutes``
    silence, either observed in-stream or enforced by an event-time
    timeout once the watermark passes ``last + gap``).

    Append-mode output: a session row is final when emitted — the
    downstream sink never sees updates, which is what an at-least-once
    bulk sink (S3) wants.
    """
    gap_us = gap_minutes * 60 * _US
    gap_ms = gap_minutes * 60 * 1000

    def fn(key: tuple, pdfs, state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            start, last, n, s = state.get
            closed.append((user_id, start, last, n, s))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts", kind="mergesort")
            cur = state.get if state.exists else None
            wm_us = state.getCurrentWatermarkMs() * 1000
            for ts, value in zip(rows["ts"], rows["value"]):
                t = _to_us(ts)
                if cur is None:
                    cur = (t, t, 1, float(value))
                elif t - cur[1] >= gap_us:  # session_window: [start, last+gap)
                    closed.append((user_id, *cur))
                    cur = (t, t, 1, float(value))
                elif cur[0] - t >= gap_us:
                    # late event DISJOINT from (strictly before) the open
                    # session: batch session_window would make it its own
                    # session. Emit it closed when the watermark proves no
                    # future event can extend it; otherwise fold it into
                    # the open session (scalar state can't hold two open
                    # sessions — a bounded approximation for stragglers
                    # landing in the wm..wm+gap twilight).
                    if t + gap_us <= wm_us:
                        closed.append((user_id, t, t, 1, float(value)))
                    else:
                        cur = (t, cur[1], cur[2] + 1, cur[3] + float(value))
                else:
                    # late-but-overlapping event — extend the window,
                    # never shrink it (a backwards `last` would corrupt
                    # later gap checks)
                    cur = (
                        min(cur[0], t),
                        max(cur[1], t),
                        cur[2] + 1,
                        cur[3] + float(value),
                    )
            if cur is not None:
                state.update(cur)
                # evict once the watermark passes the session's gap edge;
                # a timeout may not be set behind the current watermark
                # (stale keys fed by a late batch) — clamp to wm+1 so the
                # session closes on the very next trigger.
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(cur[1] // 1000 + gap_ms, wm + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [round(c[4], 2) for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
