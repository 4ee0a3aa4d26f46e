"""Generic relational operators on the driver's TPC-H-ish tables.

These demonstrate the engine's aggregate / join / sort machinery
(SURVEY.md §2.4-§2.6) in their scale-correct shapes:

- partial (combiner) aggregation inside map_batches before the shuffle —
  the A1/A2 pattern at 100 TB (pre-aggregate, then a tiny groupby);
- broadcast hash join for fact ⋈ small-dim (J2: the reference's
  parent-notebook dict probes, /root/reference/src/jimmy/formats/joplin.py:43-49);
- distributed sort + limit (§2.6 determinism-by-sort,
  /root/reference/docs/contributing/development_considerations.md:11).

Float determinism note: all SUM columns here are cent/integral-valued
doubles, so partial sums are exact in IEEE double (< 2**53) and match the
DuckDB oracle bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def lineitem_agg(sf_dir: str):
    """Partial-agg per batch, then small groupby of partials (A1 pattern)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # money → exact int64 cents: float partial sums are order-dependent
        # (0.01 is not binary-representable); integer sums are not.
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0)), pa.int64())
        batch = batch.append_column("price_cents", cents)
        grouped = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("price_cents", "sum"), ("l_quantity", "count")]
        )
        return grouped.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_cents", "p_n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return (
        partials.repartition(8).groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_cents", alias_name="sum_price_cents"),
            Sum("p_n", alias_name="n"),
        )
    )


def orders_join(sf_dir: str):
    """orders ⋈ customer ⋈ nation via broadcast small side (J2 pattern)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust_nation = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    ).set_index("c_custkey")["n_name"]
    lookup = cust_nation.to_dict()  # small: broadcast by closure capture

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def join_and_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["nation"] = batch["o_custkey"].map(lookup)
        batch["cents"] = (batch["o_totalprice"] * 100.0).round().astype("int64")
        g = batch.groupby("nation", as_index=False).agg(
            p_n=("o_custkey", "size"), p_cents=("cents", "sum")
        )
        return g

    partials = ds.map_batches(join_and_partial, batch_format="pandas", batch_size=65536)
    return partials.repartition(8).groupby("nation").aggregate(
        Sum("p_n", alias_name="n_orders"), Sum("p_cents", alias_name="total_cents")
    )


def lineitem_orders_join(sf_dir: str, num_partitions: int = 16):
    """Large ⋈ large via Ray's native hash join (Dataset.join): lineitem ⋈
    orders on orderkey, then revenue cents per order priority (the J1-class
    shuffle join when neither side fits a broadcast)."""
    import pyarrow.compute as pc

    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = li.join(
        orders, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        # half_towards_infinity == DuckDB round(): exact .5 boundaries agree
        cents = pc.cast(
            pc.round(pc.multiply(revenue, 100.0), 0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        t = pa.table({"o_orderpriority": batch["o_orderpriority"],
                      "cents": cents})
        g = t.group_by("o_orderpriority").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["o_orderpriority", "p_cents", "p_n"])

    return joined.map_batches(partial, batch_format="pyarrow").repartition(8).groupby(
        "o_orderpriority"
    ).aggregate(
        Sum("p_cents", alias_name="revenue_cents"),
        Sum("p_n", alias_name="n_items"),
    )


def top_orders(sf_dir: str, n: int = 10):
    """Distributed sort + limit with deterministic tie-break (§2.6)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(n)


def _local_asof(g: pd.DataFrame) -> pd.DataFrame:
    ev = g[g["side"] == 0][["key", "t_us", "row_id"]].rename(
        columns={"row_id": "event_id"})
    od = g[g["side"] == 1][["key", "t_us", "row_id"]].rename(
        columns={"row_id": "o_orderkey"})
    if ev.empty:
        return pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "user_id": pd.Series([], dtype=np.int64),
            "ts_us": pd.Series([], dtype=np.int64),
            "o_orderkey": pd.Series([], dtype="Int64"),
            "order_ts_us": pd.Series([], dtype="Int64"),
        })
    ev = ev.sort_values(["t_us", "event_id"], kind="mergesort")
    od = od.sort_values(["t_us", "o_orderkey"], kind="mergesort")
    # duplicate the order timestamp so it rides the merge — no
    # post-hoc lookup needed
    od["order_ts_us"] = od["t_us"]
    m = pd.merge_asof(ev, od, on="t_us", by="key",
                      direction="backward",
                      suffixes=("", "_o"))
    return pd.DataFrame({
        "event_id": m["event_id"].astype(np.int64),
        "user_id": m["key"].astype(np.int64),
        "ts_us": m["t_us"].astype(np.int64),
        "o_orderkey": m["o_orderkey"].astype("Int64"),
        "order_ts_us": m["order_ts_us"].astype("Int64"),
    })



def asof_join_events_orders(sf_dir: str, n_buckets: int = 64):
    """As-of join: each event matched to the latest order of the same
    user at or before the event time (left as-of, backward direction).

    Ray Data has no as-of join; the scale shape is hash-bucket
    colocation on the join key (user/cust) followed by a vectorized
    per-bucket ``pd.merge_asof`` — each bucket holds both sides of its
    keys, so the merge is exact, and the bucket count (not the key
    cardinality) bounds the shuffle.  Ties on order date break toward
    the larger o_orderkey (both engines: merge_asof takes the last row
    of the (date, key)-sorted right side; the mirror orders the window
    DESC, DESC).  Output times are exact int64 epoch-us.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64())
        return pa.table({
            "key": batch["user_id"].cast(pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            "t_us": ts_us,
            "row_id": batch["event_id"].cast(pa.int64()),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["o_custkey"].cast(pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            "t_us": batch["o_orderdate"].cast(pa.int64()),
            "row_id": batch["o_orderkey"].cast(pa.int64()),
        })

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow"))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["__b"] = (df["key"] % n_buckets).astype(np.int64)
        return df

    return (
        both.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(_local_asof, batch_format="pandas")
    )


def sql_asof_join_events_orders() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
),
cand AS (
  SELECT e.event_id, o.o_orderkey, epoch_us(o.o_orderdate) AS order_ts_us,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM e JOIN orders o
    ON o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= e.ts_us
)
SELECT e.event_id, e.user_id, e.ts_us,
       c.o_orderkey, c.order_ts_us
FROM e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c USING (event_id)
"""


RANGE_WINDOW_US = 30 * 24 * 3600 * 1_000_000  # 30 days


def _local_range(g: pd.DataFrame) -> pd.DataFrame:
    ev = g[g["side"] == 0]
    od = g[g["side"] == 1].sort_values(["key", "t_us", "row_id"],
                                       kind="mergesort")
    out_eid, out_uid, out_ts, out_n, out_min = [], [], [], [], []
    od_groups = {k: sub for k, sub in od.groupby("key")}
    for k, esub in ev.groupby("key"):
        osub = od_groups.get(k)
        ets = esub["t_us"].to_numpy()
        eids = esub["row_id"].to_numpy()
        if osub is None:
            n = np.zeros(len(ets), dtype=np.int64)
            mins = np.full(len(ets), -1, dtype=np.int64)
        else:
            ots = osub["t_us"].to_numpy()
            oks = osub["row_id"].to_numpy()
            # window is strict at the lower edge (SQL mirror:
            # o_orderdate > ts - W), inclusive at the upper —
            # side="right" on the lower bound excludes t == ts - W
            lo = np.searchsorted(ots, ets - RANGE_WINDOW_US, side="right")
            hi = np.searchsorted(ots, ets, side="right")
            n = (hi - lo).astype(np.int64)
            # exact per-window slice-min, fully vectorized: reduceat
            # over interleaved [lo, hi) boundaries (even positions are
            # the window mins); an int64-max sentinel keeps hi == len
            # a valid index without affecting any min
            mins = np.full(len(ets), -1, dtype=np.int64)
            nz = np.nonzero(n > 0)[0]
            if nz.size:
                pairs = np.empty(2 * nz.size, dtype=np.int64)
                pairs[0::2] = lo[nz]
                pairs[1::2] = hi[nz]
                oks_ext = np.append(oks, np.iinfo(np.int64).max)
                mins[nz] = np.minimum.reduceat(oks_ext, pairs)[0::2]
        out_eid.extend(eids.tolist())
        out_uid.extend([k] * len(eids))
        out_ts.extend(ets.tolist())
        out_n.extend(n.tolist())
        out_min.extend(mins.tolist())
    return pd.DataFrame({
        "event_id": pd.Series(out_eid, dtype=np.int64),
        "user_id": pd.Series(out_uid, dtype=np.int64),
        "ts_us": pd.Series(out_ts, dtype=np.int64),
        "n_orders": pd.Series(out_n, dtype=np.int64),
        "min_orderkey": pd.Series(out_min, dtype=np.int64),
    })



def range_join_events_orders(sf_dir: str, n_buckets: int = 64):
    """Banded range join: per event, aggregate the same user's orders
    inside the trailing 30-day window (count + min orderkey).

    Same scale shape as the as-of join — hash-bucket colocation on the
    key, then a per-bucket vectorized sweep: orders sorted per key by
    time, window bounds located with two searchsorted calls per event
    group.  No per-row Python in the hot path; shuffle = one coarse
    bucket exchange.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["user_id"].cast(pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            "t_us": batch["ts"].cast(pa.int64()),
            "row_id": batch["event_id"].cast(pa.int64()),
        })

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["o_custkey"].cast(pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            "t_us": batch["o_orderdate"].cast(pa.int64()),
            "row_id": batch["o_orderkey"].cast(pa.int64()),
        })

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow"))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["__b"] = (df["key"] % n_buckets).astype(np.int64)
        return df

    return (
        both.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(_local_range, batch_format="pandas")
    )


def sql_range_join_events_orders() -> str:
    return f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
SELECT e.event_id, e.user_id, e.ts_us,
  CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
  CAST(COALESCE(MIN(o.o_orderkey), -1) AS BIGINT) AS min_orderkey
FROM e LEFT JOIN orders o
  ON o.o_custkey = e.user_id
  AND epoch_us(o.o_orderdate) > e.ts_us - {RANGE_WINDOW_US}
  AND epoch_us(o.o_orderdate) <= e.ts_us
GROUP BY e.event_id, e.user_id, e.ts_us
"""
