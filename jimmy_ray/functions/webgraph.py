"""Web link-graph analytics: degree rollup and fixed-point PageRank.

The crawl-curation companions to functions/webtext.py: a hyperlink
graph over the corpus (src page -> dst page edges) feeding the two
classic web-scale graph operators —

- ``link_graph_degrees``: out-/in-degree per node (the seed-scoring /
  spam-heuristic primitive; one exchange),
- ``pagerank``: damped PageRank with dangling-mass redistribution,
  run for a fixed number of synchronous iterations in **pure integer
  arithmetic** (micro-rank units, floor division) so the Ray path and
  the DuckDB mirror are bit-identical — the same integer-exactness
  rule the geo tier uses (CLAUDE.md) applied to an iterative
  algorithm.  Each iteration is one distributed exchange: explode
  contributions inside ``map_batches`` (the out-edge set of a node is
  a pure function of its id, so no edge join is shipped), pre-sum
  per batch, one ``groupby(dst)``, then a finalize map that folds in
  the dangling mass (collected as a single sentinel row — O(1) driver
  state per iteration, never the rank table).

Edge synthesis is deterministic from ``documents`` (no external data):
node ``d`` has ``d % 4`` out-edges, edge ``j`` points at
``(d + 1 + ((d*31 + j*17) % 97)) % n_docs``.  ``d % 4 == 0`` nodes are
dangling — they exercise the redistribution path.  The SQL mirrors are
generated from the same constants, unrolled one CTE per iteration
(recursive CTEs cannot GROUP BY in the recursive term, so a fixed
iteration count is also what keeps the oracle expressible).

Scale shape: degrees is map-side partial counts + one small groupby;
pagerank is T exchanges of (2 rows per edge max) contribution tuples —
no all-pairs, no whole-graph state on any worker; the driver holds one
integer (the dangling mass) per iteration.  At 10^12 nodes the only
change is salting hot dst keys, same as the geo tier's hot cells.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- deterministic graph synthesis (mirrored in SQL) ------------------------

MAX_OUT = 4          # out_degree(d) = d % MAX_OUT  (0 => dangling)
EDGE_MUL_D = 31
EDGE_MUL_J = 17
EDGE_MOD = 97

RANK_SCALE = 1_000_000   # initial integer rank per node (micro-ranks)
DAMP_NUM, DAMP_DEN = 85, 100
N_ITER = 3


@lru_cache(maxsize=8)
def _n_docs(sf_dir: str) -> int:
    """Node count from parquet footer metadata (no data read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def out_degree(d: np.ndarray) -> np.ndarray:
    return d % MAX_OUT


def edge_dsts(d: np.ndarray, j: int, n: int) -> np.ndarray:
    """dst of edge j for every src in d (valid where j < d % MAX_OUT)."""
    return (d + 1 + ((d * EDGE_MUL_D + j * EDGE_MUL_J) % EDGE_MOD)) % n


def _sql_edges_cte(n_expr: str = "(SELECT count(*) FROM documents)") -> str:
    return (
        "edges AS (\n"
        "  SELECT doc_id AS src,\n"
        f"         (doc_id + 1 + ((doc_id * {EDGE_MUL_D} + j.j * {EDGE_MUL_J})"
        f" % {EDGE_MOD})) % {n_expr} AS dst\n"
        "  FROM documents CROSS JOIN (VALUES (0), (1), (2)) AS j(j)\n"
        f"  WHERE j.j < doc_id % {MAX_OUT}\n"
        ")"
    )


# --- degrees -----------------------------------------------------------------

def link_graph_degrees(sf_dir: str):
    """Per-node (node, out_deg, in_deg).  Map-side partial in-degree
    counts (plus a zero row per node so in_deg=0 nodes survive), one
    groupby(node), out_deg recomputed from the id in the finalize map."""
    import ray.data as rd

    n = _n_docs(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        d = batch["doc_id"].to_numpy()
        nodes = [d]          # zero row per node (in-degree may be 0)
        ones = [np.zeros(len(d), np.int64)]
        for j in range(MAX_OUT - 1):
            src = d[d % MAX_OUT > j]
            nodes.append(edge_dsts(src, j, n))
            ones.append(np.ones(len(src), np.int64))
        df = pd.DataFrame({"node": np.concatenate(nodes),
                           "p_in": np.concatenate(ones)})
        out = df.groupby("node", sort=False)["p_in"].sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def finalize(df):
        import pandas as pd

        node = df["node"].iloc[0]
        return pd.DataFrame({
            "node": [int(node)],
            "out_deg": [int(node % MAX_OUT)],
            "in_deg": [int(df["p_in"].sum())],
        })

    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=8192)
            .repartition(8)
            .groupby("node")
            .map_groups(finalize, batch_format="pandas"))


def sql_link_graph_degrees() -> str:
    return f"""
WITH {_sql_edges_cte()}
SELECT d.doc_id AS node,
       CAST(d.doc_id % {MAX_OUT} AS BIGINT) AS out_deg,
       CAST(count(e.src) AS BIGINT) AS in_deg
FROM documents d LEFT JOIN edges e ON e.dst = d.doc_id
GROUP BY d.doc_id
"""


# --- PageRank ----------------------------------------------------------------

_DANGLING = -1  # sentinel node id carrying the dangling mass


def _contrib_batch(batch: pa.Table, n: int) -> pa.Table:
    """rank rows -> pre-summed contribution partials.

    Emits floor(rank/out_deg) to each out-neighbor, the full rank to
    the _DANGLING sentinel for out_deg==0 nodes, and a zero row per
    node so every node survives the groupby."""
    import pandas as pd

    d = batch["node"].to_numpy()
    r = batch["rank"].to_numpy()
    deg = out_degree(d)
    nodes = [d, np.full((deg == 0).sum(), _DANGLING, np.int64)]
    amts = [np.zeros(len(d), np.int64), r[deg == 0]]
    for j in range(MAX_OUT - 1):
        m = deg > j
        nodes.append(edge_dsts(d[m], j, n))
        amts.append(r[m] // deg[m])
    df = pd.DataFrame({"node": np.concatenate(nodes),
                       "amt": np.concatenate(amts)})
    out = df.groupby("node", sort=False)["amt"].sum().reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def pagerank(sf_dir: str, n_iter: int = N_ITER):
    """Integer PageRank, ``n_iter`` synchronous iterations.

    r'(d) = floor(15*SCALE/100)
          + floor(85 * (incoming(d) + floor(D/n)) / 100)
    where incoming(d) = sum over in-edges of floor(r(src)/out_deg(src))
    and D = total rank held by dangling nodes.  All floor divisions —
    the DuckDB mirror reproduces every intermediate exactly."""
    import ray.data as rd

    n = _n_docs(sf_dir)
    ranks = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda b: pa.table({
            "node": b["doc_id"],
            "rank": pa.array(np.full(b.num_rows, RANK_SCALE, np.int64)),
        }),
        batch_format="pyarrow", batch_size=8192,
    )

    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    for _ in range(n_iter):
        # materialize() per iteration: the rank table is the natural
        # checkpoint of a synchronous iterative algorithm — without it,
        # consuming `summed` twice (sentinel + finalize) re-executes the
        # lineage and the recompute compounds 2^T across iterations
        summed = (ranks.map_batches(
            lambda b: _contrib_batch(b, n),
            batch_format="pyarrow", batch_size=8192,
        ).repartition(8).groupby("node").map_groups(
            lambda df: df.groupby("node", as_index=False)["amt"].sum(),
            batch_format="pandas",
        ).materialize())
        # O(1) driver state: one sentinel row holds the dangling mass
        drow = summed.map_batches(
            lambda b: b.filter(pc.equal(b["node"], _DANGLING)),
            batch_format="pyarrow", batch_size=65536,
        ).take_all()
        share = (drow[0]["amt"] if drow else 0) // n

        def finalize(b: pa.Table, share=share) -> pa.Table:
            b = b.filter(pc.not_equal(b["node"], _DANGLING))
            amt = b["amt"].to_numpy()
            rank = base + DAMP_NUM * (amt + share) // DAMP_DEN
            return pa.table({"node": b["node"],
                             "rank": pa.array(rank, pa.int64())})

        ranks = summed.map_batches(finalize, batch_format="pyarrow",
                                   batch_size=65536)
    return ranks


def sql_pagerank(n_iter: int = N_ITER) -> str:
    """Unrolled mirror: one (dangling, incoming, ranks) CTE triple per
    iteration, generated from the same constants as the Ray path."""
    n = "(SELECT count(*) FROM documents)"
    base = f"({RANK_SCALE} * {DAMP_DEN - DAMP_NUM} // {DAMP_DEN})"
    parts = [
        _sql_edges_cte(n),
        f"pr0 AS (SELECT doc_id AS node, CAST({RANK_SCALE} AS BIGINT)"
        " AS rank FROM documents)",
    ]
    for i in range(n_iter):
        p, q = f"pr{i}", f"pr{i + 1}"
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(rank), 0) // {n} AS share"
            f" FROM {p} WHERE node % {MAX_OUT} = 0)"
        )
        parts.append(
            f"inc{i} AS (\n"
            f"  SELECT p.node, coalesce(sum(s.rank // (s.node % {MAX_OUT})), 0)"
            " AS amt\n"
            f"  FROM {p} p LEFT JOIN edges e ON e.dst = p.node\n"
            f"  LEFT JOIN {p} s ON s.node = e.src\n"
            "  GROUP BY p.node\n)"
        )
        parts.append(
            f"{q} AS (SELECT node, {base} + {DAMP_NUM} * (amt +"
            f" (SELECT share FROM d{i})) // {DAMP_DEN} AS rank FROM inc{i})"
        )
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM pr{n_iter}")
