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
