"""Similarity search over the embeddings table (training-data tier).

- :func:`ann_topk` — exact brute-force cosine top-k: per-batch bounded
  top-k against a broadcast query matrix (numpy matmul), then a tiny
  groupby(qid) merge.  Same distributed-top-k shape as the geo kNN
  (jimmy_ray.stages.spatial.KNNCandidateStage); exact, so DuckDB-oracle
  checkable.
- :func:`ann_topk_lsh` — the scale path: random-hyperplane LSH buckets
  (deterministic seeded planes), multi-probe within hamming-1 buckets.
  Approximate → no SQL oracle; recall vs brute force is asserted in
  tests.
- :func:`embedding_dup_pairs` — embedding-cosine near-dup pairs over a
  corpus with injected noisy replicas (vec_id + 1_000_000), verified in
  tests against the known replica pairing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOPK_EXTRA = 8
REPLICA_OFFSET = 1_000_000


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """First n_queries vectors by vec_id as the query matrix.

    Distributed bottom-k: each batch keeps only its n smallest vec_ids, so
    the driver materializes O(blocks × n) candidate rows, never the table."""
    import ray.data as rd

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        keep = np.argsort(ids, kind="stable")[:n_queries]
        return batch.take(keep)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    batches = list(
        ds.map_batches(bottomk, batch_format="pyarrow", batch_size=8192)
        .iter_batches(batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in batches]
    )
    vec_ids = t["vec_id"].to_numpy()
    order = np.argsort(vec_ids, kind="stable")[:n_queries]
    q = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return vec_ids[order], q


class AnnTopkStage:
    """Per-batch cosine top-k vs a broadcast query matrix (actor state)."""

    def __init__(self, qids: np.ndarray, qmat: np.ndarray, k: int):
        self.qids = qids
        self.qmat = qmat  # (Q, d), rows normalized
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vec_ids = batch["vec_id"].to_numpy()
        sims = vecs @ self.qmat.T  # (B, Q)
        kk = min(self.k + TOPK_EXTRA, len(vec_ids))
        out_q: list[int] = []
        out_v: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(col) else np.arange(len(col))
            out_q.extend([int(qid)] * idx.size)
            out_v.append(vec_ids[idx])
            out_s.append(col[idx])
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def ann_topk(sf_dir: str, n_queries: int = 10, k: int = 10):
    """Exact top-k by cosine: (qid, vec_id, rank); rank ties broken by
    (sim desc, vec_id) in both engines."""
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir, n_queries)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cands = ds.map_batches(
        AnnTopkStage,
        fn_constructor_kwargs={"qids": qids, "qmat": qmat, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True],
                              kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return cands.groupby("qid").map_groups(topk, batch_format="pandas")


def sql_ann_topk(n_queries: int = 10, k: int = 10) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {n_queries}
),
d AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim
  FROM q, embeddings e
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
  FROM d
)
SELECT qid, vec_id, CAST(rn AS BIGINT) AS "rank" FROM r WHERE rn <= {k}
"""


# --- LSH-bucketed variant (scale path, approximate) ------------------------

N_PLANES = 12


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(4242)
    return rng.standard_normal((N_PLANES, dim))


def lsh_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    return (bits.astype(np.uint64) << np.arange(N_PLANES, dtype=np.uint64)).sum(axis=1)


def ann_topk_lsh(sf_dir: str, n_queries: int = 10, k: int = 10):
    """LSH-bucketed ANN: candidates limited to query buckets ∪ hamming-1
    probes, then exact rerank.  Approximate — recall tested vs ann_topk."""
    import ray.data as rd

    qids, qmat = _load_queries(sf_dir, n_queries)
    planes = _planes(qmat.shape[1])
    qbuckets = lsh_bucket(qmat, planes)
    probe: set[int] = set()
    for b in qbuckets:
        probe.add(int(b))
        for bit in range(N_PLANES):
            probe.add(int(b) ^ (1 << bit))
    probe_arr = np.fromiter(probe, dtype=np.int64, count=len(probe))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def bucket_filter(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        buckets = lsh_bucket(nv, planes)
        keep = np.isin(buckets.astype(np.int64), probe_arr)
        return batch.filter(pa.array(keep))

    filtered = ds.map_batches(bucket_filter, batch_format="pyarrow", batch_size=4096)
    cands = filtered.map_batches(
        AnnTopkStage,
        fn_constructor_kwargs={"qids": qids, "qmat": qmat, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True],
                              kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return cands.groupby("qid").map_groups(topk, batch_format="pandas")


# --- IVF (coarse-quantizer) variant ----------------------------------------

N_CENTROIDS = 16
KMEANS_ITERS = 10
NPROBE = 4


def train_centroids(vecs: np.ndarray, k: int = N_CENTROIDS,
                    iters: int = KMEANS_ITERS) -> np.ndarray:
    """Deterministic Lloyd k-means on normalized vectors (init = first k
    distinct rows in vec order; no RNG, so every run/cluster size trains
    the identical quantizer)."""
    centroids = vecs[:k].copy()
    for _ in range(iters):
        sims = vecs @ centroids.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                mean = members.mean(axis=0)
                norm = np.linalg.norm(mean)
                if norm > 0:
                    centroids[c] = mean / norm
    return centroids


TRAIN_SAMPLE_TARGET = 4096
_SAMPLE_MOD = 1 << 32


def _training_sample(sf_dir: str) -> np.ndarray:
    """Bounded deterministic quantizer-training sample: keep rows whose
    hashed vec_id falls under TRAIN_SAMPLE_TARGET/n — a distributed
    map-side filter, so the driver materializes O(sample) vectors and the
    sample is identical at any partitioning/cluster size (Knuth
    multiplicative hash, no RNG)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n = ds.count()  # parquet metadata count — no scan
    thresh = min(_SAMPLE_MOD, (TRAIN_SAMPLE_TARGET * _SAMPLE_MOD) // max(n, 1))

    def samp(batch: pa.Table) -> pa.Table:
        h = (batch["vec_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(_SAMPLE_MOD)
        return batch.take(np.nonzero(h < thresh)[0])

    rows = list(
        ds.map_batches(samp, batch_format="pyarrow", batch_size=8192)
        .iter_batches(batch_format="pyarrow")
    )
    t = pa.concat_tables(
        [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
         for b in rows]
    )
    order = np.argsort(t["vec_id"].to_numpy(), kind="stable")
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs


def ann_topk_ivf(sf_dir: str, n_queries: int = 10, k: int = 10,
                 nprobe: int = NPROBE):
    """IVF ANN: train a coarse quantizer once on a bounded deterministic
    sample (O(TRAIN_SAMPLE_TARGET) driver state at any corpus size),
    assign each vector to its nearest centroid, and scan only the
    queries' nprobe nearest centroid buckets — the classic IVF scale
    path next to the LSH variant.  Approximate: recall vs ann_topk
    asserted in tests."""
    import ray.data as rd

    centroids = train_centroids(_training_sample(sf_dir))

    qids, qmat = _load_queries(sf_dir, n_queries)
    qprobe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_arr = np.unique(qprobe.astype(np.int64))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def bucket_filter(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        assign = np.argmax(nv @ centroids.T, axis=1)
        keep = np.isin(assign.astype(np.int64), probe_arr)
        return batch.filter(pa.array(keep))

    cands = ds.map_batches(bucket_filter, batch_format="pyarrow",
                           batch_size=4096).map_batches(
        AnnTopkStage,
        fn_constructor_kwargs={"qids": qids, "qmat": qmat, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True],
                              kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["qid", "vec_id", "rank"]]

    return cands.groupby("qid").map_groups(topk, batch_format="pandas")


# --- embedding-cosine near-dup ---------------------------------------------

def replicated_embeddings_batch(batch: pa.Table) -> pa.Table:
    """Inject noisy replicas (vec_id + REPLICA_OFFSET, vec + seeded noise)."""
    vec_ids = batch["vec_id"].to_numpy()
    vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    noise = np.stack([
        np.random.default_rng(int(v)).normal(0, 0.01, vecs.shape[1])
        for v in vec_ids
    ])
    out_ids = np.concatenate([vec_ids, vec_ids + REPLICA_OFFSET])
    out_vecs = np.concatenate([vecs, vecs + noise])
    return pa.table(
        {
            "vec_id": pa.array(out_ids, pa.int64()),
            "embedding": pa.array(list(out_vecs), pa.list_(pa.float64())),
        }
    )


DUP_TABLES = 6
DUP_PLANES = 8          # minimum planes; buckets per table = 2**planes
DUP_TARGET_BUCKET = 2048  # target expected bucket population
DUP_MISS_EPS = 0.05     # tolerated miss probability for a tau-boundary pair
PAIR_TILE = 2048        # in-bucket scan tile edge: peak sim matrix ≤ TILE²


def dup_plane_count(n_total: int) -> int:
    """Planes per LSH table, derived from corpus size so the *expected*
    bucket population stays ≈ DUP_TARGET_BUCKET: 2^b ≈ n / target.  Fixes
    the r3 scale caveat (fixed 256 buckets → O((n/256)²) in-bucket scans)."""
    if n_total <= DUP_TARGET_BUCKET:
        return DUP_PLANES
    return max(DUP_PLANES, int(np.ceil(np.log2(n_total / DUP_TARGET_BUCKET))))


def dup_table_count(planes: int, tau: float) -> int:
    """Tables needed so a pair at exactly cosine tau is missed with
    probability ≤ DUP_MISS_EPS: collision prob per plane p = 1 − θ/π,
    miss = (1 − p^b)^T ≤ eps → T = ⌈ln eps / ln(1 − p^b)⌉.  Reproduces
    T=6 at (b=8, tau=0.95); grows slowly (T≈10 at b=12, ≈15 at b=16) as
    planes scale with log(corpus), keeping recall flat."""
    p = 1.0 - np.arccos(np.clip(tau, -1.0, 1.0)) / np.pi
    pb = p ** planes
    if pb >= 1.0:
        return 1
    return max(1, int(np.ceil(np.log(DUP_MISS_EPS) / np.log1p(-pb))))


def _dup_planes(dim: int, tables: int = DUP_TABLES,
                planes: int = DUP_PLANES) -> np.ndarray:
    rng = np.random.default_rng(777)
    return rng.standard_normal((tables, planes, dim))


def bucket_pairs_kernel(ids: np.ndarray, vecs: np.ndarray, tau: float,
                        tile: int = PAIR_TILE,
                        stats: dict | None = None) -> pd.DataFrame:
    """Exact in-bucket cosine pairs (a < b, sim ≥ tau), computed in
    tile×tile blocks so peak pair-matrix memory is ≤ tile² float64 no
    matter how skewed the LSH bucket is (upper-triangle tiles only)."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    n = len(ids)
    for i0 in range(0, n, tile):
        vi = vecs[i0:i0 + tile]
        ii = ids[i0:i0 + tile]
        for j0 in range(i0, n, tile):
            vj = vecs[j0:j0 + tile]
            jj = ids[j0:j0 + tile]
            sims = vi @ vj.T
            if stats is not None:
                stats["peak_pair_matrix"] = max(
                    stats.get("peak_pair_matrix", 0), sims.size)
            rows, cols = np.nonzero((sims >= tau)
                                    & (ii[:, None] < jj[None, :]))
            if rows.size:
                out_a.append(ii[rows])
                out_b.append(jj[cols])
                out_s.append(sims[rows, cols])
    if not out_a:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "sim": pd.Series([], dtype=np.float64)})
    return pd.DataFrame({"a": np.concatenate(out_a),
                         "b": np.concatenate(out_b),
                         "sim": np.concatenate(out_s)})


def embedding_dup_pairs(sf_dir: str, tau: float = 0.95):
    """Cosine ≥ tau pairs over the replicated corpus: (a, b, sim).

    LSH-bucketed pair generation: T independent random-hyperplane tables;
    each vector lands in one bucket per table, in-bucket all-pairs cosine
    (exact, so no false positives), cross-table duplicates removed by a
    pair-grouped max.  Scale shape: planes b ≈ log2(n / target_bucket)
    bounds expected bucket population at any corpus size, T is derived
    from (tau, b) to pin the miss rate ≤ DUP_MISS_EPS, and the in-bucket
    scan is tiled (bucket_pairs_kernel) so peak memory is ≤ PAIR_TILE²
    even for skewed buckets; per-worker state is one bucket's vectors,
    never the corpus."""
    import ray.data as rd

    from jimmy_ray.functions.dedup import pair_grouped

    base = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n_total = 2 * base.count()  # parquet metadata count; ×2 for replicas
    n_planes = dup_plane_count(n_total)
    n_tables = dup_table_count(n_planes, tau)

    ds = base.map_batches(replicated_embeddings_batch, batch_format="pyarrow")

    planes: np.ndarray | None = None

    def bucket_explode(batch: pa.Table) -> pa.Table:
        nonlocal planes
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        if planes is None:
            planes = _dup_planes(vecs.shape[1], n_tables, n_planes)
        ids = batch["vec_id"].to_numpy()
        out = []
        for t in range(n_tables):
            bits = (vecs @ planes[t].T) > 0
            bucket = (bits.astype(np.int64)
                      << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            out.append(pa.table({
                "tb": pa.array(t * (1 << n_planes) + bucket, pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }))
        return pa.concat_tables(out)

    buckets = ds.map_batches(bucket_explode, batch_format="pyarrow",
                             batch_size=4096)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return bucket_pairs_kernel(
                np.array([], dtype=np.int64), np.empty((0, 1)), tau)
        ids = g["vec_id"].to_numpy()
        vecs = np.stack(g["embedding"].to_numpy())
        return bucket_pairs_kernel(ids, vecs, tau)

    pairs = buckets.groupby("tb").map_groups(bucket_pairs,
                                             batch_format="pandas")
    # same pair found in several tables → one row (sim identical everywhere)
    return pair_grouped(pairs, "sim", "max", "sim",
                        n_rows_hint=n_tables * n_total)


def embedding_dedup_corpus(sf_dir: str, tau: float = 0.95,
                           num_partitions: int = 8):
    """Embedding-modality dedup endgame: cosine ≥ tau pairs (LSH-bucketed)
    → connected components → keep min vec_id per duplicate group → filter
    the replicated corpus to the keep set.  Mirrors near_dedup_corpus on
    the text side; rows-only check (cosine pairs are float-approx by
    design)."""
    import ray.data as rd

    from jimmy_ray.functions.dedup import min_label_components

    pairs = embedding_dup_pairs(sf_dir, tau).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    )
    labels = min_label_components(pairs, num_partitions=num_partitions)

    def replicate_ids(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        return pa.table({"vec_id": pa.array(
            np.concatenate([ids, ids + REPLICA_OFFSET]), pa.int64())})

    corpus = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(replicate_ids, batch_format="pyarrow")

    joined = corpus.join(
        labels, join_type="left_outer", num_partitions=num_partitions,
        on=("vec_id",), right_on=("node",),
    )

    def survivors(batch: pa.Table) -> pa.Table:
        rep = batch["cluster_rep"].to_numpy(zero_copy_only=False)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = pa.array(np.isnan(rep.astype(np.float64)) | (rep == vid))
        return batch.select(["vec_id"]).filter(keep)

    return joined.map_batches(survivors, batch_format="pyarrow")
