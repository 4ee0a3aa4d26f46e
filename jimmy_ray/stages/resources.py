"""Resource sink: content-hash dedup + deterministic name allocation
(SURVEY.md §2.5 A3, §2.7).

Ports the reference's sink semantics: duplicated resources are detected
by md5 equality (intermediate_format.py:123-131, writer.py:273) and name
collisions between *different* contents get ``name_0001``-style suffixes
(get_unique_path, common.py:171-202).  The reference probes the
filesystem in write order; here allocation is a deterministic function of
the group: within each target-name group, md5-content groups are ordered
by their smallest doc_id and numbered — so any parallelism (and the SQL
oracle) produces identical names.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from jimmy_ray.scalars import paths as path_mod

N_NAMES = 7  # distinct target names -> forced collisions
DUP_RUN = 3  # docs in runs of 3 share content -> md5 duplicates


def synth_resources(sf_dir: str):
    """One resource row per doc: colliding names + duplicated contents."""
    import ray.data as rd

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    text_map = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        names, contents = [], []
        for doc_id in ids:
            rep = doc_id - doc_id % DUP_RUN  # content representative
            names.append(f"res{doc_id % N_NAMES}.bin")
            contents.append(text_map.get(rep, "").encode("utf-8"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "name": pa.array(names, pa.string()),
                "content": pa.array(contents, pa.binary()),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", batch_size=512)


def resource_sink_names(sf_dir: str):
    """(doc_id, name, md5, final_name): the A3 dedup + unique-path pass.

    groupby(name) is the §2.7 shuffle key; within each group, md5 groups
    ordered by min(doc_id) get names via the deterministic allocator."""

    resources = synth_resources(sf_dir)

    def add_md5(batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5(c).hexdigest() for c in batch["content"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "name": batch["name"],
                         "md5": pa.array(digests, pa.string())})

    hashed = resources.map_batches(add_md5, batch_format="pyarrow")

    def allocate(group: pd.DataFrame) -> pd.DataFrame:
        name = group["name"].iloc[0]
        order = (
            group.groupby("md5", as_index=False)["doc_id"].min()
            .sort_values("doc_id", kind="mergesort")
        )
        seen: dict[str, str] = {}
        final_by_md5 = {
            row.md5: path_mod.unique_name(name, seen, row.md5)
            for row in order.itertuples()
        }
        out = group.copy()
        out["final_name"] = out["md5"].map(final_by_md5)
        return out[["doc_id", "name", "md5", "final_name"]]

    return hashed.groupby("name").map_groups(allocate, batch_format="pandas")


def sql_resource_sink_names() -> str:
    return f"""
WITH r AS (
  SELECT d.doc_id,
         'res' || CAST(d.doc_id % {N_NAMES} AS VARCHAR) || '.bin' AS name,
         md5((SELECT text FROM documents d2
              WHERE d2.doc_id = d.doc_id - d.doc_id % {DUP_RUN})) AS md5
  FROM documents d
),
g AS (SELECT name, md5, MIN(doc_id) AS first_doc FROM r GROUP BY 1, 2),
ranked AS (
  SELECT name, md5,
         dense_rank() OVER (PARTITION BY name ORDER BY first_doc) AS rk
  FROM g
)
SELECT r.doc_id, r.name, r.md5,
       CASE WHEN rk = 1 THEN r.name
            ELSE 'res' || CAST(r.doc_id % {N_NAMES} AS VARCHAR) || '_'
                 || lpad(CAST(rk - 1 AS VARCHAR), 4, '0') || '.bin' END
         AS final_name
FROM r JOIN ranked ON r.name = ranked.name AND r.md5 = ranked.md5
"""
