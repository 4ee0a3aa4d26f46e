"""Windowed aggregates over the events log (stream-shaped workload).

Ray Data is a batch engine with no event-time watermarks; stream
semantics are expressed as the guide's pattern: treat `events` as an
ordered, key-partitioned log — tumbling windows become a (key, window)
groupby with partial aggregation, session windows become per-key sorted
gap detection inside ``groupby(key).map_groups``.  Ordering assumption:
within one key group, windows are computed after an explicit in-group
sort by ts (the reference's in-group sort semantics, SURVEY.md §2.6 /
formats/evernote.py:187-191).

Value sums are rounded to integer milli-units before summation so partial
sums are order-independent (same rationale as the integer-cent sums in
jimmy_ray.pipelines.relational).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TUMBLE_MS = 3_600_000  # 1 hour
SESSION_GAP_MS = 1_800_000  # 30 minutes


def tumbling_window(sf_dir: str, window_ms: int = TUMBLE_MS):
    """Per (user, hour-window): event count + exact milli-value sum.

    Partial-agg per batch (A1 pattern) → small groupby of partials."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_ms = pc.divide(pc.cast(batch["ts"], pa.int64()), 1000)
        window = pc.multiply(pc.divide(ts_ms, window_ms), window_ms)
        milli = pc.cast(pc.round(pc.multiply(batch["value"], 1000.0)), pa.int64())
        t = pa.table({"user_id": batch["user_id"], "window_ms": window,
                      "value_milli": milli})
        g = t.group_by(["user_id", "window_ms"]).aggregate(
            [("value_milli", "sum"), ("value_milli", "count")]
        )
        return g.rename_columns(["user_id", "window_ms", "p_sum", "p_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.repartition(8).groupby(["user_id", "window_ms"]).aggregate(
        Sum("p_sum", alias_name="sum_value_milli"),
        Sum("p_n", alias_name="n_events"),
    )


def sql_tumbling_window(window_ms: int = TUMBLE_MS) -> str:
    return (
        "SELECT user_id, "
        f"(epoch_ms(ts) // {window_ms}) * {window_ms} AS window_ms, "
        "CAST(SUM(CAST(round(value * 1000.0) AS BIGINT)) AS BIGINT)"
        " AS sum_value_milli, "
        "CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY 1, 2"
    )


def session_window(sf_dir: str, gap_ms: int = SESSION_GAP_MS):
    """Gap-based sessionization per user: (user_id, session_start_ms,
    session_end_ms, n_events).  Sorted-group state inside map_groups."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts", kind="mergesort")
        ts_ms = g["ts"].astype("int64") // 1000  # us -> ms
        new_session = ts_ms.diff().fillna(gap_ms + 1) > gap_ms
        session_id = new_session.cumsum()
        out = (
            pd.DataFrame({"user_id": g["user_id"], "ts_ms": ts_ms, "sid": session_id})
            .groupby("sid")
            .agg(user_id=("user_id", "first"), session_start_ms=("ts_ms", "min"),
                 session_end_ms=("ts_ms", "max"), n_events=("ts_ms", "size"))
            .reset_index(drop=True)
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_start_ms", "session_end_ms", "n_events"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def sql_session_window(gap_ms: int = SESSION_GAP_MS) -> str:
    return f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > {gap_ms}
              OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS is_new
  FROM events
),
s AS (
  SELECT user_id, ts_ms,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id, MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


def sliding_window(sf_dir: str, window_ms: int = TUMBLE_MS,
                   slide_ms: int = TUMBLE_MS // 2):
    """Sliding windows: each event lands in window_ms/slide_ms hops.
    Expressed as an explode (one row per covering hop) + groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    hops = window_ms // slide_ms
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def explode(batch: pa.Table) -> pa.Table:
        ts_ms = pc.divide(pc.cast(batch["ts"], pa.int64()), 1000).to_numpy()
        users = batch["user_id"].to_numpy()
        base = (ts_ms // slide_ms) * slide_ms
        out_user, out_win, out_n = [], [], []
        for h in range(hops):
            win_start = base - h * slide_ms
            valid = ts_ms < win_start + window_ms
            out_user.append(users[valid])
            out_win.append(win_start[valid])
        t = pa.table({
            "user_id": pa.array(np.concatenate(out_user), pa.int64()),
            "window_start_ms": pa.array(np.concatenate(out_win), pa.int64()),
        })
        g = t.group_by(["user_id", "window_start_ms"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "window_start_ms", "p_n"])

    partials = ds.map_batches(explode, batch_format="pyarrow", batch_size=65536)
    return partials.repartition(8).groupby(["user_id", "window_start_ms"]).aggregate(
        Sum("p_n", alias_name="n_events")
    )


def sql_sliding_window(window_ms: int = TUMBLE_MS,
                       slide_ms: int = TUMBLE_MS // 2) -> str:
    hops = window_ms // slide_ms
    hop_values = ", ".join(f"({h})" for h in range(hops))
    return f"""
WITH hops(h) AS (VALUES {hop_values})
SELECT user_id,
       (epoch_ms(ts) // {slide_ms}) * {slide_ms} - h * {slide_ms} AS window_start_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events, hops
WHERE epoch_ms(ts) < (epoch_ms(ts) // {slide_ms}) * {slide_ms} - h * {slide_ms} + {window_ms}
GROUP BY 1, 2
"""
