"""Size-derived coarse-fold buckets (VERDICT r4 #3).

Two properties: the bucket count grows with the input row count (so
per-bucket fold population stays bounded at scale), and fold RESULTS are
bit-identical under any bucket count (the bucket column is run-internal).
"""

import jimmy_ray.functions.folds as folds

SF = "/root/testdata/sf0.001"


def test_fold_bucket_count_grows_with_input():
    assert folds.n_fold_buckets(1) == folds.MIN_BUCKETS
    assert folds.n_fold_buckets(10**4) == folds.MIN_BUCKETS
    assert folds.n_fold_buckets(10**7) > folds.MIN_BUCKETS
    assert folds.n_fold_buckets(10**9) > folds.n_fold_buckets(10**7)
    # expected per-bucket population stays ≈ target in the growth regime
    nb = folds.n_fold_buckets(10**9)
    assert 10**9 / nb <= folds.TARGET_ROWS_PER_BUCKET
    # capped so map_groups call overhead stays amortized
    assert folds.n_fold_buckets(10**15) == folds.MAX_BUCKETS


def _sorted(df, keys):
    return (df.sort_values(keys, kind="mergesort")
            .reset_index(drop=True))


def test_fold_results_invariant_under_bucket_count(ray_session, monkeypatch):
    """url_template_mining / anchor_text_agg return identical rows whether
    the fold uses the derived bucket count or a forced tiny one."""
    from jimmy_ray.functions import webgraph, webtext

    base_t = _sorted(webtext.url_template_mining(SF).to_pandas(),
                     ["domain", "template"])
    base_a = _sorted(webgraph.anchor_text_agg(SF).to_pandas(), ["target"])

    monkeypatch.setattr(folds, "n_fold_buckets", lambda *a, **k: 7)
    alt_t = _sorted(webtext.url_template_mining(SF).to_pandas(),
                    ["domain", "template"])
    alt_a = _sorted(webgraph.anchor_text_agg(SF).to_pandas(), ["target"])

    assert base_t.equals(alt_t)
    assert base_a.equals(alt_a)
