"""Crawl scheduling: the capstone composition of the curation tiers.

A recrawl scheduler ranks the frontier by (page importance ×
freshness churn), gated by robots policy — exactly the three signals
the repo already computes as separate operators.  This pipeline
COMPOSES the shipped operators (it does not re-derive their logic):

    priority = rank × (1 + n_changes)   if robots allows the url
             = 0                         otherwise

- ``robots_filter``      → (doc_id, variant, url, allowed)
- ``pagerank``           → (node, rank)        [integer micro-ranks]
- ``snapshot_drift``     → (url, n_changes)

joined with two partitioned hash joins (partitions clamped to the row
count — the connected-components lesson) and finished with one integer
map.  The DuckDB mirror nests the SAME three oracle queries as
subqueries, so the composition is verified end-to-end, not re-modeled.

Scale shape: two exchanges over O(urls) rows; the rank side is
O(nodes) ≤ O(urls).  All integer arithmetic — bit-identical by
construction.
"""

from __future__ import annotations

import pyarrow as pa


def crawl_schedule(sf_dir: str, num_partitions: int = 8):
    from jimmy_ray.functions import robots, webgraph, webtext

    urls = robots.robots_filter(sf_dir)
    rank = webgraph.pagerank(sf_dir)
    drift = webtext.snapshot_drift(sf_dir)

    n_rows = webgraph._n_docs(sf_dir) * webtext.N_URL_VARIANTS
    num_partitions = max(1, min(num_partitions, n_rows // 4096 + 1))

    with_rank = urls.join(rank, join_type="inner",
                          num_partitions=num_partitions,
                          on=("doc_id",), right_on=("node",))
    with_drift = with_rank.join(
        drift.select_columns(["url", "n_changes"]),
        join_type="inner", num_partitions=num_partitions, on=("url",))

    def score(batch: pa.Table) -> pa.Table:
        import numpy as np

        allowed = batch["allowed"].to_numpy(zero_copy_only=False)
        rank_arr = batch["rank"].to_numpy(zero_copy_only=False)
        churn = batch["n_changes"].to_numpy(zero_copy_only=False)
        prio = np.where(allowed, rank_arr * (1 + churn), 0).astype("int64")
        return pa.table({
            "url": batch["url"],
            "doc_id": batch["doc_id"],
            "allowed": batch["allowed"],
            "priority": pa.array(prio, pa.int64()),
        })

    return with_drift.map_batches(score, batch_format="pyarrow",
                                  batch_size=8192)


def sql_crawl_schedule() -> str:
    from jimmy_ray.functions import robots, webgraph, webtext

    return f"""
SELECT u.url, u.doc_id, u.allowed,
       CAST(CASE WHEN u.allowed
                 THEN pr.rank * (1 + d.n_changes) ELSE 0 END
            AS BIGINT) AS priority
FROM ({robots.sql_robots_filter()}) u
JOIN ({webgraph.sql_pagerank()}) pr ON pr.node = u.doc_id
JOIN ({webtext.sql_snapshot_drift()}) d ON d.url = u.url
"""
