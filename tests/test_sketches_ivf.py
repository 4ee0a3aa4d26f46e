"""Sketches (HLL, Misra-Gries) + IVF ANN: accuracy vs exact references."""

import numpy as np
import pytest

from jimmy_ray.functions import sketches


def test_hll_accuracy():
    for n in (100, 5_000, 50_000):
        tokens = [f"tok{i}" for i in range(n)]
        est = sketches.hll_estimate(sketches.hll_from_tokens(tokens))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_is_union():
    a = [f"a{i}" for i in range(2000)]
    b = [f"b{i}" for i in range(3000)]
    overlap = [f"a{i}" for i in range(1000)]  # subset of a
    sa = sketches.hll_from_tokens(a)
    sb = sketches.hll_from_tokens(b + overlap)
    merged = sketches.hll_merge([sa, sb])
    est = sketches.hll_estimate(merged)
    assert abs(est - 5000) / 5000 < 0.05
    # merge is idempotent and commutative
    assert (sketches.hll_merge([sb, sa]) == merged).all()
    assert (sketches.hll_merge([merged, sa]) == merged).all()


def test_hll_duplicates_dont_inflate():
    tokens = ["same"] * 10_000 + [f"t{i}" for i in range(100)]
    est = sketches.hll_estimate(sketches.hll_from_tokens(tokens))
    assert abs(est - 101) / 101 < 0.2


def test_misra_gries_guarantee():
    # frequency > n/k items must survive summarize+merge
    rng = np.random.default_rng(1)
    heavy = ["big"] * 500 + ["big2"] * 300
    light = [f"x{i}" for i in rng.integers(0, 400, 700)]
    tokens = heavy + light
    rng.shuffle(tokens)
    k = 10
    halves = [tokens[:750], tokens[750:]]
    merged = sketches.mg_merge(
        [sketches.mg_summarize(h, k) for h in halves], k
    )
    assert "big" in merged and "big2" in merged


def test_sketch_queries_run(ray_session):
    df = sketches.approx_distinct_tokens("/root/testdata/sf0.001")
    # exact distinct tokens in the corpus (small): compare
    import re

    import pyarrow.parquet as pq

    from jimmy_ray.functions.textstats import TOKEN_RE

    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    exact = len({t for x in texts for t in re.findall(TOKEN_RE, x.lower())})
    est = int(df["approx_distinct_tokens"].iloc[0])
    assert abs(est - exact) / exact < 0.1, (est, exact)

    # the corpus vocabulary (~30 tokens) is near-uniform, so no token has
    # freq > n/16 and MG at k=16 may keep any subset; with k > |vocab| the
    # summary is exact and the true top token is guaranteed present.
    hh = sketches.heavy_hitter_tokens("/root/testdata/sf0.001", k=64)
    assert len(hh) > 0
    from collections import Counter

    counts = Counter(t for x in texts for t in re.findall(TOKEN_RE, x.lower()))
    top_true = counts.most_common(1)[0][0]
    assert top_true in set(hh["token"])


def test_ivf_recall_vs_bruteforce(ray_session):
    from jimmy_ray.functions import simsearch

    exact = simsearch.ann_topk("/root/testdata/sf0.001").to_pandas()
    ivf = simsearch.ann_topk_ivf("/root/testdata/sf0.001").to_pandas()
    es = exact.groupby("qid")["vec_id"].apply(set)
    vs = ivf.groupby("qid")["vec_id"].apply(set)
    recalls = [len(es[q] & vs.get(q, set())) / len(es[q]) for q in es.index]
    # nprobe=4/16 centroids on weakly-clustered data: meaningful recall,
    # scanning only ~nprobe/ncentroids of the table
    assert np.mean(recalls) > 0.5
    # rank-1 self hit must always survive (query's own bucket is probed)
    r1 = ivf[ivf["rank"] == 1]
    assert (r1["vec_id"].to_numpy() == r1["qid"].to_numpy()).all()


def test_kmeans_deterministic():
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((500, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    c1 = sketches_train = __import__(
        "jimmy_ray.functions.simsearch", fromlist=["x"]
    ).train_centroids(vecs)
    c2 = __import__(
        "jimmy_ray.functions.simsearch", fromlist=["x"]
    ).train_centroids(vecs)
    np.testing.assert_array_equal(c1, c2)


def test_ivf_training_sample_bounded_and_deterministic(ray_session, monkeypatch):
    """The quantizer never trains on O(n) driver state: the hash-threshold
    sample stays near TRAIN_SAMPLE_TARGET rows and is identical across
    runs/partitionings (pure function of vec_id)."""
    from jimmy_ray.functions import simsearch

    monkeypatch.setattr(simsearch, "TRAIN_SAMPLE_TARGET", 64)
    vecs = simsearch._training_sample("/root/testdata/sf0.001")
    # Bernoulli(64/500) over 500 ids: far below the table, above zero
    assert 16 <= len(vecs) <= 3 * 64
    again = simsearch._training_sample("/root/testdata/sf0.001")
    assert np.array_equal(vecs, again)


def test_doc_length_quantiles_accuracy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from jimmy_ray.functions import sketches

    df = sketches.doc_length_quantiles("/root/testdata/sf0.001")
    exact = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["n_chars"])["n_chars"].to_numpy()
    for p, got in zip(df["p"], df["n_chars_quantile"]):
        want = float(np.quantile(exact, p))
        spread = exact.max() - exact.min()
        assert abs(got - want) <= max(0.05 * spread, 2), (p, got, want)


def test_quantile_recompress_bounds_points_and_keeps_accuracy():
    from jimmy_ray.functions import sketches

    rng = np.random.default_rng(5)
    data = rng.integers(0, 10_000, 80_000).astype(np.float64)
    # simulate many per-batch partials, then one recompress level
    pts, wts = [], []
    for chunk in np.array_split(data, 200):
        p, w = sketches.quantile_compress(chunk)
        pts.append(p)
        wts.append(np.full(p.size, w))
    allp, allw = np.concatenate(pts), np.concatenate(wts)
    rp, rw = sketches.quantile_recompress(allp, allw)
    assert rp.size <= sketches.QS_K          # bounded regardless of blocks
    assert abs(rw.sum() - allw.sum()) < 1e-6  # total weight preserved
    got = sketches.weighted_quantiles(rp, rw, [0.5, 0.9])
    assert abs(got[0] - np.quantile(data, 0.5)) < 300
    assert abs(got[1] - np.quantile(data, 0.9)) < 300
    # passthrough when already small
    sp, sw = sketches.quantile_recompress(allp[:10], allw[:10])
    assert np.array_equal(sp, allp[:10]) and np.array_equal(sw, allw[:10])


def test_sketch_driver_fold_is_block_count_independent(ray_session, monkeypatch):
    """The r3 scale caveat: take_all() must receive O(TREE_FANIN) rows, not
    O(blocks).  Run the HLL + quantile sketches over a deliberately
    over-split input (tiny batch size → many partials) and assert the
    tree-merged row count and unchanged estimates."""
    import pyarrow.parquet as pq

    from jimmy_ray.functions import sketches

    baseline = sketches.approx_distinct_tokens("/root/testdata/sf0.001")
    base_q = sketches.doc_length_quantiles("/root/testdata/sf0.001")

    taken = {}
    import ray.data

    orig = ray.data.Dataset.take_all

    def spy(self, *a, **kw):
        rows = orig(self, *a, **kw)
        taken["n"] = len(rows)
        return rows

    monkeypatch.setattr(ray.data.Dataset, "take_all", spy)
    est = sketches.approx_distinct_tokens("/root/testdata/sf0.001")
    assert taken["n"] <= sketches.TREE_FANIN
    qdf = sketches.doc_length_quantiles("/root/testdata/sf0.001")
    assert taken["n"] <= sketches.TREE_FANIN * sketches.QS_K
    # estimates bit-identical to the un-spied run (merge is associative)
    assert est["approx_distinct_tokens"].iloc[0] == \
        baseline["approx_distinct_tokens"].iloc[0]
    assert qdf["n_chars_quantile"].tolist() == \
        base_q["n_chars_quantile"].tolist()


def test_quantile_sketch_merges_weighted_batches():
    import numpy as np

    from jimmy_ray.functions import sketches

    rng = np.random.default_rng(3)
    data = rng.integers(0, 10_000, 50_000)
    pts, wts = [], []
    for chunk in np.array_split(data, 37):
        p, w = sketches.quantile_compress(chunk)
        pts.append(p)
        wts.append(np.full(p.size, w))
    got = sketches.weighted_quantiles(
        np.concatenate(pts), np.concatenate(wts), [0.5, 0.9])
    assert abs(got[0] - np.quantile(data, 0.5)) < 200
    assert abs(got[1] - np.quantile(data, 0.9)) < 200
