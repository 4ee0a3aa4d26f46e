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

    def finalize(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "out_deg": pa.array(node % MAX_OUT, pa.int64()),
            "in_deg": pc.cast(batch["in_deg"], pa.int64()),
        })

    from ray.data.aggregate import Sum

    # vectorized Sum aggregate, NOT map_groups: per-node map_groups costs
    # one Python call per node per round (CLAUDE.md 192s-vs-0.4s lesson)
    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=8192)
            .repartition(8)
            .groupby("node")
            .aggregate(Sum("p_in", alias_name="in_deg"))
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=65536))


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
        from ray.data.aggregate import Sum

        summed = (ranks.map_batches(
            lambda b: _contrib_batch(b, n),
            batch_format="pyarrow", batch_size=8192,
        ).repartition(8).groupby("node")
         .aggregate(Sum("amt", alias_name="amt"))
         .materialize())
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


# --- anchor-text aggregation --------------------------------------------------

ANCHOR_MOD = 97      # inlink target of doc d = d % ANCHOR_MOD


def synth_anchors(doc_id: int) -> list[tuple[int, str]]:
    """(target, anchor) inlink rows contributed by one source page:
    the site's brand anchor twice plus one generic anchor that varies
    by source parity — so every target sees 3 distinct anchor strings
    with the brand anchor strictly most frequent."""
    t = doc_id % ANCHOR_MOD
    generic = "click here" if doc_id % 2 == 0 else "read more"
    return [(t, f"brand {t}"), (t, f"brand {t}"), (t, generic)]


def anchor_text_agg(sf_dir: str):
    """Per-target inlink anchor rollup: n_inlinks, distinct anchors,
    and the most-frequent anchor (ties break lexicographically) — the
    classic target-description signal search/quality pipelines build.

    Scale shape: explode anchors map-side with per-batch (target,
    anchor) pre-counts, then ONE coarse-bucket exchange and a local
    pandas fold per bucket (targets are high-cardinality — the
    functions/dedup.py pattern, not groupby().aggregate()).
    """
    import pandas as pd
    import ray.data as rd

    from jimmy_ray.functions.folds import n_fold_buckets

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    nb = n_fold_buckets(3 * _n_docs(sf_dir))  # 3 anchor rows per doc

    def partial(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for d in batch["doc_id"].to_pylist():
            rows.extend(synth_anchors(d))
        df = pd.DataFrame(rows, columns=["target", "anchor"])
        out = df.groupby(["target", "anchor"], as_index=False).size()
        out.columns = ["target", "anchor", "n"]
        out["__b"] = (out["target"].to_numpy() % nb).astype(np.int64)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["target", "anchor"], as_index=False)["n"].sum()
        c = c.sort_values(["target", "n", "anchor"],
                          ascending=[True, False, True], kind="mergesort")
        top = c.drop_duplicates("target", keep="first")
        agg = c.groupby("target").agg(
            n_inlinks=("n", "sum"), n_anchors=("anchor", "size")
        ).reset_index()
        out = agg.merge(top[["target", "anchor"]], on="target")
        out.columns = ["target", "n_inlinks", "n_anchors", "top_anchor"]
        return out

    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=4096)
            .groupby("__b")
            .map_groups(fold, batch_format="pandas")
            .select_columns(["target", "n_inlinks", "n_anchors",
                             "top_anchor"]))


def sql_anchor_text_agg() -> str:
    """General ranked aggregation in SQL over the same synthesized
    anchor table — independent recomputation, not fixture shortcuts."""
    t = f"doc_id % {ANCHOR_MOD}"
    return f"""
WITH anchors AS (
  SELECT {t} AS target, 'brand ' || CAST({t} AS VARCHAR) AS anchor
  FROM documents
  UNION ALL
  SELECT {t}, 'brand ' || CAST({t} AS VARCHAR) FROM documents
  UNION ALL
  SELECT {t}, CASE WHEN doc_id % 2 = 0 THEN 'click here'
                   ELSE 'read more' END
  FROM documents
), counts AS (
  SELECT target, anchor, count(*) AS n FROM anchors GROUP BY 1, 2
), ranked AS (
  SELECT target, anchor, n,
         row_number() OVER (PARTITION BY target
                            ORDER BY n DESC, anchor) AS rn
  FROM counts
)
SELECT c.target, CAST(sum(c.n) AS BIGINT) AS n_inlinks,
       CAST(count(*) AS BIGINT) AS n_anchors,
       any_value(r.anchor) AS top_anchor
FROM counts c JOIN ranked r ON r.target = c.target AND r.rn = 1
GROUP BY c.target
"""


# --- redirect-chain resolution -------------------------------------------------

MAX_CHAIN = 3        # chain length of doc d = d % (MAX_CHAIN + 1)


def synth_redirects(doc_id: int) -> tuple[list[str], list[tuple[str, str]]]:
    """(chain urls, redirect edges) for one doc: hop0 -> ... -> hopL
    where L = doc_id % (MAX_CHAIN+1); hopL is the terminal (200)."""
    length = doc_id % (MAX_CHAIN + 1)
    urls = [f"https://r.test/{doc_id}/hop{j}" for j in range(length + 1)]
    return urls, list(zip(urls, urls[1:]))


def redirect_resolve(sf_dir: str, num_partitions: int = 8):
    """Resolve every url to its final (non-redirecting) target + hop
    count by POINTER DOUBLING over the redirect map: compose the jump
    table with itself ceil(log2(MAX_CHAIN)) times, then one hash join
    from the url table.  O(log chain-length) exchanges — chains of a
    million hops cost 20 rounds, never a driver-side walk.
    """
    import pandas as pd
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def url_rows(batch: pa.Table) -> pa.Table:
        urls = []
        for d in batch["doc_id"].to_pylist():
            urls.extend(synth_redirects(d)[0])
        return pa.table({"url": pa.array(urls, pa.string())})

    def edge_rows(batch: pa.Table) -> pa.Table:
        src, dst = [], []
        for d in batch["doc_id"].to_pylist():
            for s, t in synth_redirects(d)[1]:
                src.append(s)
                dst.append(t)
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string()),
                         "steps": pa.array([1] * len(src), pa.int64())})

    urls = docs.map_batches(url_rows, batch_format="pyarrow",
                            batch_size=4096)
    jump = docs.map_batches(edge_rows, batch_format="pyarrow",
                            batch_size=4096)

    # clamp join partitions to the edge count (the connected-components
    # lesson: 8-way hash joins over a few hundred rows thrash workers)
    n_edges = _n_docs(sf_dir) * MAX_CHAIN // 2
    num_partitions = max(1, min(num_partitions, n_edges // 4096 + 1))

    rounds = max(1, int(np.ceil(np.log2(max(MAX_CHAIN, 2)))))
    for _ in range(rounds):
        hop = (jump.select_columns(["src", "dst", "steps"])
               .rename_columns({"src": "src2", "dst": "dst2",
                                "steps": "steps2"}))
        jump = jump.join(hop, join_type="left_outer",
                         num_partitions=num_partitions,
                         on=("dst",), right_on=("src2",))

        def compose(batch: pd.DataFrame) -> pa.Table:
            hit = batch["dst2"].notna()
            batch.loc[hit, "dst"] = batch.loc[hit, "dst2"]
            batch.loc[hit, "steps"] = (batch.loc[hit, "steps"]
                                       + batch.loc[hit, "steps2"])
            # arrow out: rename_columns projects on arrow blocks only,
            # and the NaN-padded steps2 add upcasts steps to float
            return pa.table({
                "src": pa.array(batch["src"], pa.string()),
                "dst": pa.array(batch["dst"], pa.string()),
                "steps": pa.array(batch["steps"].astype("int64"),
                                  pa.int64()),
            })

        jump = jump.map_batches(compose, batch_format="pandas")

    resolved = urls.join(jump, join_type="left_outer",
                         num_partitions=num_partitions,
                         on=("url",), right_on=("src",))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        miss = batch["dst"].isna()
        batch.loc[miss, "dst"] = batch.loc[miss, "url"]
        batch.loc[miss, "steps"] = 0
        return pd.DataFrame({"url": batch["url"],
                             "final_url": batch["dst"],
                             "hops": batch["steps"].astype("int64")})

    return resolved.map_batches(finish, batch_format="pandas")


def sql_redirect_resolve() -> str:
    chain = f"doc_id % {MAX_CHAIN + 1}"
    u = (f"'https://r.test/' || CAST(doc_id AS VARCHAR) || '/hop'"
         f" || CAST(v AS VARCHAR)")
    fin = (f"'https://r.test/' || CAST(doc_id AS VARCHAR) || '/hop'"
           f" || CAST({chain} AS VARCHAR)")
    return f"""
WITH hops AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(v))
SELECT {u} AS url, {fin} AS final_url,
       CAST({chain} - v AS BIGINT) AS hops
FROM documents CROSS JOIN hops
WHERE v <= {chain}
"""


# --- triangle counting ----------------------------------------------------------

def _canonical_edges(sf_dir: str):
    """Distinct undirected edges with a < b (orientation dedupe), from
    the same formula-derived graph the degree/pagerank ops use."""
    import pandas as pd
    import ray.data as rd

    n = _n_docs(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    from jimmy_ray.functions.folds import n_fold_buckets

    nb = n_fold_buckets(n * MAX_OUT)  # ≤ MAX_OUT-1 edges per doc

    def edge_rows(batch: pa.Table) -> pd.DataFrame:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        a_all, b_all = [], []
        for j in range(MAX_OUT - 1):
            mask = j < (d % MAX_OUT)
            src, dst = d[mask], edge_dsts(d[mask], j, n)
            keep = src != dst
            src, dst = src[keep], dst[keep]
            a_all.append(np.minimum(src, dst))
            b_all.append(np.maximum(src, dst))
        df = pd.DataFrame({"a": np.concatenate(a_all),
                           "b": np.concatenate(b_all)})
        df = df.drop_duplicates()
        df["__b"] = ((df["a"].to_numpy() * 1_000_003 + df["b"].to_numpy())
                     % nb).astype(np.int64)
        return df

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    return (docs.map_batches(edge_rows, batch_format="pyarrow",
                             batch_size=4096)
            .groupby("__b")
            .map_groups(dedupe, batch_format="pandas"))


def triangle_count(sf_dir: str, num_partitions: int = 8):
    """Global triangle count — the clustering-coefficient numerator.

    Canonical-orientation algorithm (each triangle a<b<c counted
    exactly once): wedges = edges ⋈ edges on b = a′ (giving a<b<c
    paths), then one multi-key hash join probes the closing (a, c)
    edge.  Two exchanges over O(edges × avg-degree) wedge rows;
    orientation bounds the join fan-out by the max canonical
    out-degree — the standard skew control for triangle counting at
    scale (order by degree when real graphs have hubs).  Partitions
    clamp to the edge count."""
    import pandas as pd

    edges = _canonical_edges(sf_dir)
    n_edges = _n_docs(sf_dir) * MAX_OUT // 2
    num_partitions = max(1, min(num_partitions, n_edges // 4096 + 1))

    hop = edges.map_batches(
        lambda t: pa.table({"a2": t["a"], "c": t["b"]}),
        batch_format="pyarrow")
    wedges = edges.join(hop, join_type="inner",
                        num_partitions=num_partitions,
                        on=("b",), right_on=("a2",))

    closing = edges.map_batches(
        lambda t: pa.table({"ka": t["a"], "kc": t["b"],
                            "hit": pa.array([1] * t.num_rows,
                                            pa.int64())}),
        batch_format="pyarrow")
    closed = wedges.join(closing, join_type="inner",
                         num_partitions=num_partitions,
                         on=("a", "c"), right_on=("ka", "kc"))

    def count_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p_n": [len(batch)]})

    from ray.data.aggregate import Sum

    total = (closed.map_batches(count_rows, batch_format="pandas")
             .aggregate(Sum("p_n", alias_name="n_triangles")))

    import pyarrow as _pa

    return _pa.table({"n_triangles": _pa.array(
        [int(total["n_triangles"] or 0)], _pa.int64())})


def sql_triangle_count() -> str:
    return f"""
WITH {_sql_edges_cte()},
ce AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
w AS (
  SELECT e1.a, e1.b, e2.b AS c FROM ce e1 JOIN ce e2 ON e2.a = e1.b
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM w JOIN ce e ON e.a = w.a AND e.b = w.c
"""


# --- HITS (hubs & authorities, unnormalized integer) ---------------------------

N_HITS_ITER = 2
HITS_SCALE = 1_000


def hits(sf_dir: str, n_iter: int = N_HITS_ITER):
    """Integer HITS: h0 = SCALE, then per iteration
    a_i(v) = Σ_{u→v} h_{i-1}(u) and h_i(u) = Σ_{u→v} a_i(v).
    Unnormalized (rank order identical to normalized HITS); with
    out-degree ≤ 3 and 2 iterations values stay ≪ int64, so the DuckDB
    mirror reproduces every intermediate exactly.

    Shape per iteration: the authority step explodes contributions
    map-side (out-edges are a pure function of the node id — no edge
    join shipped, the pagerank pattern) + one groupby(dst); the hub
    step is one hash join of the edge table against the authority
    table + one groupby(src).  Zero rows ride along so isolated nodes
    survive; the per-iteration rank table materializes as the
    checkpoint (compounding-lineage rule from pagerank)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    n = _n_docs(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def edge_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        src_all, dst_all = [], []
        for j in range(MAX_OUT - 1):
            src = d[d % MAX_OUT > j]
            src_all.append(src)
            dst_all.append(edge_dsts(src, j, n))
        return pa.table({
            "src": pa.array(np.concatenate(src_all), pa.int64()),
            "dst": pa.array(np.concatenate(dst_all), pa.int64()),
        })

    edges = docs.map_batches(edge_rows, batch_format="pyarrow",
                             batch_size=8192)
    num_partitions = max(1, min(8, n * 2 // 4096 + 1))

    h = docs.map_batches(
        lambda b: pa.table({
            "node": b["doc_id"],
            "h": pa.array(np.full(b.num_rows, HITS_SCALE, np.int64)),
        }), batch_format="pyarrow", batch_size=8192)

    a = None
    for _ in range(n_iter):
        # authority step: out-edges exploded map-side from the formula
        def contrib(batch: pa.Table) -> pa.Table:
            d = batch["node"].to_numpy(zero_copy_only=False)
            hv = batch["h"].to_numpy(zero_copy_only=False)
            nodes = [d]
            amts = [np.zeros(len(d), np.int64)]  # zero row per node
            for j in range(MAX_OUT - 1):
                m = d % MAX_OUT > j
                nodes.append(edge_dsts(d[m], j, n))
                amts.append(hv[m])
            return pa.table({
                "node": pa.array(np.concatenate(nodes), pa.int64()),
                "amt": pa.array(np.concatenate(amts), pa.int64()),
            })

        a = (h.map_batches(contrib, batch_format="pyarrow",
                           batch_size=8192)
             .repartition(8).groupby("node")
             .aggregate(Sum("amt", alias_name="a"))).materialize()

        # hub step: edge table joins the authority table on dst
        hub_part = edges.join(
            a.map_batches(lambda t: pa.table({"anode": t["node"],
                                              "av": t["a"]}),
                          batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("anode",),
        ).map_batches(
            lambda t: pa.table({"node": t["src"], "amt": t["av"]}),
            batch_format="pyarrow")
        zeros = docs.map_batches(
            lambda b: pa.table({
                "node": b["doc_id"],
                "amt": pa.array(np.zeros(b.num_rows, np.int64)),
            }), batch_format="pyarrow")
        h = (hub_part.union(zeros)
             .repartition(8).groupby("node")
             .aggregate(Sum("amt", alias_name="h"))).materialize()

    def assemble(batch: pd.DataFrame) -> pd.DataFrame:
        return batch

    joined = h.join(
        a.map_batches(lambda t: pa.table({"anode": t["node"],
                                          "auth": t["a"]}),
                      batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("node",), right_on=("anode",))
    return joined.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "hub": t["h"], "auth": t["auth"]}),
        batch_format="pyarrow")


def sql_hits(n_iter: int = N_HITS_ITER) -> str:
    parts = [f"WITH {_sql_edges_cte()},",
             f"h0 AS (SELECT doc_id AS node, {HITS_SCALE} AS v"
             " FROM documents)"]
    prev_h = "h0"
    for i in range(1, n_iter + 1):
        parts.append(
            f", a{i} AS (SELECT d.doc_id AS node,"
            f" coalesce(sum(h.v), 0) AS v FROM documents d"
            f" LEFT JOIN edges e ON e.dst = d.doc_id"
            f" LEFT JOIN {prev_h} h ON h.node = e.src"
            f" GROUP BY d.doc_id)")
        parts.append(
            f", h{i} AS (SELECT d.doc_id AS node,"
            f" coalesce(sum(a.v), 0) AS v FROM documents d"
            f" LEFT JOIN edges e ON e.src = d.doc_id"
            f" LEFT JOIN a{i} a ON a.node = e.dst"
            f" GROUP BY d.doc_id)")
        prev_h = f"h{i}"
    parts.append(
        f"\nSELECT h.node, CAST(h.v AS BIGINT) AS hub,"
        f" CAST(a.v AS BIGINT) AS auth"
        f"\nFROM h{n_iter} h JOIN a{n_iter} a ON a.node = h.node")
    return "\n".join(parts)


# --- 2-hop reach ----------------------------------------------------------------

def two_hop_reach(sf_dir: str, num_partitions: int = 8):
    """Per-node count of DISTINCT nodes reachable in exactly two
    directed hops (self excluded) — the friends-of-friends primitive
    behind related-page recommendation.  One wedge hash join (edges ⋈
    edges on dst = src′) then a coarse src-bucket distinct fold;
    orientation on the directed formula graph keeps fan-out ≤
    out-degree², so no skew salt is needed here (salt hot middles on
    real graphs)."""
    import pandas as pd
    import ray.data as rd

    n = _n_docs(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def edge_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        src_all, dst_all = [], []
        for j in range(MAX_OUT - 1):
            src = d[d % MAX_OUT > j]
            src_all.append(src)
            dst_all.append(edge_dsts(src, j, n))
        return pa.table({
            "src": pa.array(np.concatenate(src_all), pa.int64()),
            "dst": pa.array(np.concatenate(dst_all), pa.int64()),
        })

    edges = docs.map_batches(edge_rows, batch_format="pyarrow",
                             batch_size=8192)
    n_edges = n * MAX_OUT // 2
    num_partitions = max(1, min(num_partitions, n_edges // 4096 + 1))

    hop2 = edges.map_batches(
        lambda t: pa.table({"mid": t["src"], "c": t["dst"]}),
        batch_format="pyarrow")
    wedges = edges.join(hop2, join_type="inner",
                        num_partitions=num_partitions,
                        on=("dst",), right_on=("mid",))

    from jimmy_ray.functions.folds import n_fold_buckets

    nb = n_fold_buckets(n * MAX_OUT * MAX_OUT)  # wedge-row upper bound

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[batch["src"] != batch["c"]][["src", "c"]]
        df = df.drop_duplicates()
        df["__b"] = (df["src"].to_numpy() % nb).astype(np.int64)
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["src", "c"]).groupby(
            "src", as_index=False)["c"].size()
        out.columns = ["node", "n_two_hop"]
        return out

    return (wedges.map_batches(partial, batch_format="pandas")
            .groupby("__b")
            .map_groups(fold, batch_format="pandas"))


def sql_two_hop_reach() -> str:
    return f"""
WITH {_sql_edges_cte()}
SELECT e1.src AS node,
       CAST(count(DISTINCT e2.dst) AS BIGINT) AS n_two_hop
FROM edges e1 JOIN edges e2 ON e2.src = e1.dst
WHERE e2.dst <> e1.src
GROUP BY e1.src
"""
