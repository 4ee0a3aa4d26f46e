"""Near-dup + similarity operators: recall vs exact references."""

import numpy as np
import pytest

from jimmy_ray.functions import dedup, simsearch

SF = "/root/testdata/sf0.001"


def test_shingles_deterministic():
    s = dedup.shingles("a b c d")
    assert s == ["a b c", "b c d"]
    assert dedup.shingles("a b") == []


def test_minhash_estimates_jaccard():
    a = dedup.minhash_sig(dedup.shingles("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))
    b = dedup.minhash_sig(dedup.shingles("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 zz zz2"))
    est = (a == b).mean()
    assert 0.3 < est < 1.0  # true J = 8/12 over 3-gram sets, noisy estimate


def test_simhash_close_for_similar_text():
    h1 = dedup.simhash64("the quick brown fox jumps over the lazy dog again")
    h2 = dedup.simhash64("the quick brown fox jumps over the lazy dog")
    h3 = dedup.simhash64("completely different words entirely unrelated content here")
    def ham(x, y):
        return bin(x ^ y).count("1")
    assert ham(h1, h2) < ham(h1, h3)


@pytest.fixture(scope="module")
def exact_pairs(ray_session):
    df = dedup.ngram_jaccard_pairs(SF).to_pandas()
    return set(zip(df["a"], df["b"]))


def test_exact_pairs_contain_mutations(exact_pairs):
    # every doc pairs with its mutated replica at J >= 0.8
    import pyarrow.parquet as pq

    doc_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    long_enough = 0
    for d in doc_ids:
        if (d, d + dedup.MUTATION_OFFSET) in exact_pairs:
            long_enough += 1
    # docs are >= 47 chars (~8+ tokens), suffix adds 3 tokens: J >= ~0.6 for
    # the shortest docs; require the clear majority to pair up
    assert long_enough > len(doc_ids) * 0.8


def test_minhash_recall_vs_exact(exact_pairs, ray_session):
    df = dedup.minhash_dedup_pairs(SF).to_pandas()
    got = set(zip(df["a"], df["b"]))
    # minhash verifies exact jaccard, so no false positives
    assert got <= exact_pairs
    # 16 bands x 4 rows at J>=0.8: detection prob ~ 1-(1-J^4)^16 > 0.999
    assert len(got) >= 0.95 * len(exact_pairs)


def test_simhash_pairs_pigeonhole_guarantee(ray_session):
    """Every replica pair with true hamming <= 3 MUST be found (the 4x16-bit
    segment scheme guarantees recall=1 for hamming <= 3)."""
    df = dedup.simhash_dedup_pairs(SF, max_hamming=3).to_pandas()
    got = set(zip(df["a"], df["b"]))
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expected = set()
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        h1 = dedup.simhash64(text)
        h2 = dedup.simhash64(text + dedup.MUTATION_SUFFIX)
        if bin(h1 ^ h2).count("1") <= 3:
            expected.add((doc_id, doc_id + dedup.MUTATION_OFFSET))
    assert expected, "fixture should contain some hamming<=3 replicas"
    assert expected <= got
    assert (df["hamming"] <= 3).all()


def test_lsh_ann_recall_vs_bruteforce(ray_session):
    import pyarrow.parquet as pq

    exact = simsearch.ann_topk(SF).to_pandas()
    approx = simsearch.ann_topk_lsh(SF).to_pandas()
    exact_sets = exact.groupby("qid")["vec_id"].apply(set)
    approx_sets = approx.groupby("qid")["vec_id"].apply(set)
    recalls = []
    for qid, es in exact_sets.items():
        as_ = approx_sets.get(qid, set())
        recalls.append(len(es & as_) / len(es))
    # candidate fraction scanned by the bucket filter (offline mirror)
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    qids, qmat = simsearch._load_queries(SF, 10)
    planes = simsearch._planes(qmat.shape[1])
    probe = set()
    for b in simsearch.lsh_bucket(qmat, planes):
        probe.add(int(b))
        for bit in range(simsearch.N_PLANES):
            probe.add(int(b) ^ (1 << bit))
    kept = np.mean([int(b) in probe for b in simsearch.lsh_bucket(vecs, planes)])
    # on uniform random vectors absolute recall is bounded; the LSH value
    # is *enrichment*: recall per unit of data scanned beats random sampling
    assert kept < 0.15
    assert np.mean(recalls) >= 2.0 * kept
    # rank 1 must be the query vector itself in the exact path
    assert (exact[exact["rank"] == 1]["vec_id"].to_numpy()
            == exact[exact["rank"] == 1]["qid"].to_numpy()).all()


def test_embedding_dup_pairs_finds_replicas(ray_session):
    df = simsearch.embedding_dup_pairs(SF).to_pandas()
    got = set(zip(df["a"], df["b"]))
    import pyarrow.parquet as pq

    vec_ids = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])["vec_id"].to_pylist()
    expected = {(v, v + simsearch.REPLICA_OFFSET) for v in vec_ids}
    assert expected <= got            # every replica found (cos ~ 0.999)
    assert (df["sim"] >= 0.95).all()


def test_dup_scaling_parameters_bound_bucket_population():
    """r3 scale caveat: plane count must grow with corpus size so the
    expected in-bucket population (and hence the all-pairs scan) stays
    bounded by a constant at any scale; table count must compensate so the
    tau-boundary miss rate stays pinned."""
    for n in (1_000, 100_000, 10_000_000, 1_000_000_000, 10**12):
        b = simsearch.dup_plane_count(n)
        assert n / (1 << b) <= simsearch.DUP_TARGET_BUCKET
    # more planes -> more tables, miss rate <= eps at every plane count
    p = 1 - np.arccos(0.95) / np.pi
    for b in (8, 12, 16, 24):
        t = simsearch.dup_table_count(b, 0.95)
        assert (1 - p**b) ** t <= simsearch.DUP_MISS_EPS
    # reproduces the round-3 fixed topology at small corpus sizes
    assert simsearch.dup_plane_count(1000) == simsearch.DUP_PLANES == 8
    assert simsearch.dup_table_count(8, 0.95) == 6


def test_bucket_pairs_kernel_tiled_equals_dense_and_bounded():
    """The tiled in-bucket scan is exact (same pairs as one dense matmul)
    and its peak sim-matrix allocation is <= tile^2 regardless of bucket
    size — the memory bound that holds under LSH bucket skew."""
    rng = np.random.default_rng(7)
    n, d = 700, 16
    vecs = rng.standard_normal((n, d))
    vecs[n // 2:] = vecs[: n - n // 2] + rng.normal(0, 0.01, (n - n // 2, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int64)
    dense = simsearch.bucket_pairs_kernel(ids, vecs, 0.95, tile=10**9)
    stats: dict = {}
    tiled = simsearch.bucket_pairs_kernel(ids, vecs, 0.95, tile=128,
                                          stats=stats)
    assert set(zip(dense["a"], dense["b"])) == set(zip(tiled["a"], tiled["b"]))
    assert len(dense) > 0
    assert stats["peak_pair_matrix"] <= 128 * 128


def test_embedding_dup_pairs_recall_unchanged_at_scaled_topology(
        ray_session, monkeypatch):
    """Drive the operator through the scaling regime: shrink the target
    bucket so the same corpus derives a different (planes, tables)
    topology — as a 60x larger corpus would — and assert the replica
    pairing is still fully recovered."""
    import pyarrow.parquet as pq

    monkeypatch.setattr(simsearch, "DUP_TARGET_BUCKET", 16)
    monkeypatch.setattr(simsearch, "DUP_PLANES", 4)
    assert simsearch.dup_plane_count(1000) == 6          # vs 8 at default
    assert simsearch.dup_table_count(6, 0.95) == 4       # vs 6 at default
    df = simsearch.embedding_dup_pairs(SF).to_pandas()
    got = set(zip(df["a"], df["b"]))
    vec_ids = pq.read_table(f"{SF}/embeddings.parquet",
                            columns=["vec_id"])["vec_id"].to_pylist()
    expected = {(v, v + simsearch.REPLICA_OFFSET) for v in vec_ids}
    assert expected <= got
    assert (df["sim"] >= 0.95).all()


def test_multimodal_features(ray_session):
    from jimmy_ray.stages import multimodal

    df = multimodal.media_features(SF).to_pandas()
    assert len(df) == 500
    assert (~df["decoded"]).all()  # codec stubbed in this environment
    assert (df["n_bytes"] > len(multimodal.MAGIC)).all()
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"FAKEIMGxxx")


def test_min_label_components_local_equals_distributed(ray_session):
    """The driver union-find fast path and the distributed min-label
    propagation (pointer-jumping) loop must produce identical labels."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from jimmy_ray.functions.dedup import min_label_components

    # two chains, a ring, a singleton self-edge, and a bridge
    edges = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3, 10, 11, 20, 21, 22, 30, 3], pa.int64()),
        "b": pa.array([2, 3, 4, 11, 12, 21, 22, 20, 30, 10], pa.int64()),
    }))
    local = min_label_components(edges).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = min_label_components(edges, local_threshold=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(local, dist)
    rep = dict(zip(local["node"], local["cluster_rep"]))
    assert rep[4] == 1 and rep[12] == 1 and rep[10] == 1  # bridged chains
    assert rep[22] == 20 and rep[30] == 30


def test_embedding_dedup_corpus_keeps_one_per_replica_pair(ray_session):
    """Every vector pairs with its noisy replica at tau=0.95, so the
    surviving set is exactly the original vec_ids (min of each pair)."""
    from jimmy_ray.functions.simsearch import (
        REPLICA_OFFSET, embedding_dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    kept = set(embedding_dedup_corpus(sf).to_pandas()["vec_id"])
    assert kept, "no survivors"
    assert all(v < REPLICA_OFFSET for v in kept)
    import pyarrow.parquet as pq

    orig = set(pq.read_table(f"{sf}/embeddings.parquet",
                             columns=["vec_id"])["vec_id"].to_pylist())
    assert kept == orig
