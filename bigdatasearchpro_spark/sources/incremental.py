"""Incremental (watermark-based) extraction — the reference's manual
time-window batched load made first-class.

The reference pulled large tables in hand-run time slices (its
``README.md:819``: batched extraction by time window to bound a run) and
re-ran failed windows by hand. Here the high watermark is durable state
next to the sink: each run loads strictly-newer rows, appends them, and
advances the watermark only after the write commits — a crash before
commit re-loads the same window (at-least-once), and the idempotent
last-write-wins sink (S3) absorbs the replay.

At 100 TB the watermark predicate reaches the source as a pushed filter
(JDBC: folded into the generated WHERE; parquet: min/max row-group
skipping), so an incremental run's scan cost is proportional to the new
data, not the table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATE_FILE = "_incremental_state.json"


def read_watermark(sink_dir: str) -> str | None:
    path = os.path.join(sink_dir, _STATE_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)["high_watermark"]


def _write_watermark(sink_dir: str, value: str) -> None:
    os.makedirs(sink_dir, exist_ok=True)
    tmp = os.path.join(sink_dir, _STATE_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"high_watermark": value}, f)
    os.replace(tmp, os.path.join(sink_dir, _STATE_FILE))  # atomic commit


def incremental_load(
    spark: SparkSession,
    source: DataFrame,
    sink_dir: str,
    *,
    ts_col: str,
) -> int:
    """Load rows with ``ts_col`` strictly greater than the stored
    watermark, append them to the parquet sink, then advance the
    watermark to the loaded window's max. Returns rows loaded (0 when
    nothing is new — no write, no watermark change)."""
    wm = read_watermark(sink_dir)
    batch = source if wm is None else source.filter(F.col(ts_col) > F.lit(wm))
    stats = batch.agg(
        F.count("*").alias("n"), F.max(ts_col).cast("string").alias("hi")
    ).first()
    n = int(stats["n"])
    if n == 0:
        return 0
    batch.write.mode("append").parquet(os.path.join(sink_dir, "data"))
    _write_watermark(sink_dir, stats["hi"])
    return n
