"""Every queries() entry vs its oracle_sql() at sf0.001 (driver emulation).

This is the same comparison the driver runs at sf0.01 for
CORRECTNESS_r{N}.json — run here at the smoke scale so regressions are
caught before the round gate.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import __ray_entry__ as entrymod  # noqa: E402
from oracle_harness import compare, oracle_connection  # noqa: E402

SF = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = oracle_connection(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con, ray_session):
    result = QUERIES[name](SF)
    compare(name, result, ORACLES[name], con)


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops are allowed to omit oracles (driver does a
    # rows-only check); keep the list explicit so it stays intentional.
    allowed_without_oracle = {
        "hexcell_index", "s2_cells", "knn_hex_pruned", "minhash_dedup",
        "simhash_dedup", "embedding_ann_lsh", "embedding_ann_ivf",
        "embedding_dedup_corpus", "fuzzy_title_match",
        "approx_distinct_tokens", "heavy_hitter_tokens",
        "doc_length_quantiles",  # mergeable sketch: approximate by design
        # LSH over noisy replicas: per-pair miss ~1.3e-4, so an exact
        # pair-set mirror is a seeded coin flip — recall accuracy tests
        # in test_dedup_simsearch.py pin it instead (CLAUDE.md rule:
        # float-cosine ops stay rows-only)
        "embedding_dup_pairs",
    }
    assert missing <= allowed_without_oracle, f"queries missing oracles: {missing}"


def test_entry_smoke(ray_session):
    result = entrymod.entry()
    df = result.to_pandas()
    assert len(df) >= 0
    assert set(df.columns) == {"polygon_id", "n_pages"}


def test_driver_window_is_the_first_50_queries():
    """The correctness driver samples the FIRST 50 queries() entries; the
    window self-rotates from the CORRECTNESS_r*.json ledger, leading with
    queries that have never had a driver row."""
    import glob
    import json
    import os

    window = entrymod._driver_window()
    names = list(QUERIES)
    assert len(window) == 50
    assert names[:50] == window
    assert set(window) <= set(QUERIES)

    sampled: set[str] = set()
    for path in glob.glob(os.path.join(os.path.dirname(entrymod.__file__),
                                       "CORRECTNESS_r*.json")):
        with open(path) as fh:
            sampled.update(json.load(fh).keys())
    never = [n for n in entrymod._all_queries() if n not in sampled]
    in_window = [n for n in never if n in window]
    # every never-sampled query is in the window, up to capacity; any
    # overflow must come from the explicit demote list
    overflow = [n for n in never if n not in window]
    assert len(in_window) == min(len(never), 50)
    assert set(overflow) <= set(entrymod._WINDOW_DEMOTE)
