"""Search-index materialization over the REAL text column.

Unlike the fixture-template operators, these two run on
``documents.text`` as-is — the oracle tokenizes the same real data
independently in DuckDB, so there is no synthesis↔oracle
co-derivation at all:

- ``inverted_index``: term → (document frequency, total term
  frequency, sorted posting list) — the classic index-build exchange:
  per-batch (term, doc, tf) partials, ONE coarse term-hash bucket
  exchange, local fold per bucket.  Postings ship as a comma-joined
  string here; at 100 TB a posting list is a parquet row-group per
  term shard, not a string — same partitioning, different sink.
- ``top_terms_per_doc``: per-document characteristic terms — tf-idf's
  deterministic integer cousin: rank terms by (tf desc, df asc, term
  asc) and keep the top K.  Shape: the df side is the index fold,
  hash-joined back to the (doc, term, tf) rows (partitions clamped to
  row count), then a per-doc-bucket top-K fold.

Tokenization is ``[a-z]+`` over lowercased text, verified identical
between Python re and DuckDB's RE2 (tests/test_webtext.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"[a-z]+")
TOP_K = 3


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def _doc_term_tf(batch: pa.Table) -> pd.DataFrame:
    rows: dict[tuple[int, str], int] = {}
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        for term in tokenize(t):
            rows[(d, term)] = rows.get((d, term), 0) + 1
    out = pd.DataFrame(
        [(d, term, n) for (d, term), n in rows.items()],
        columns=["doc_id", "term", "tf"],
    )
    return out


def _with_term_bucket(df: pd.DataFrame, nb: int = 64) -> pd.DataFrame:
    df["__b"] = (pd.util.hash_array(df["term"].to_numpy(dtype=object))
                 % nb).astype("int64")
    return df


# rough expansion factors from corpus rows to fold-input rows, for the
# size-derived bucket counts (folds.n_fold_buckets)
TERMS_PER_DOC_EST = 32


def _term_fold_buckets(sf_dir: str) -> int:
    from jimmy_ray.functions.folds import n_fold_buckets, parquet_rows

    return n_fold_buckets(
        parquet_rows(f"{sf_dir}/documents.parquet") * TERMS_PER_DOC_EST)


def inverted_index(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    nb = _term_fold_buckets(sf_dir)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        agg = g.groupby("term").agg(
            n_docs=("doc_id", "size"), total_tf=("tf", "sum"),
            postings=("doc_id",
                      lambda s: ",".join(str(x) for x in s)),
        ).reset_index()
        return agg

    return (docs.map_batches(_doc_term_tf, batch_format="pyarrow",
                             batch_size=4096)
            .map_batches(lambda d: _with_term_bucket(d, nb),
                         batch_format="pandas")
            .groupby("__b")
            .map_groups(fold, batch_format="pandas"))


def sql_inverted_index() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
), d AS (
  SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
)
SELECT term, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         AS postings
FROM d GROUP BY term
"""


def top_terms_per_doc(sf_dir: str, k: int = TOP_K,
                      num_partitions: int = 8):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    doc_tf = docs.map_batches(_doc_term_tf, batch_format="pyarrow",
                              batch_size=4096)
    nb = _term_fold_buckets(sf_dir)

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)["doc_id"].size()
        out.columns = ["term", "df"]
        return out

    term_df = (doc_tf.map_batches(lambda d: _with_term_bucket(d, nb),
                                  batch_format="pandas")
               .groupby("__b")
               .map_groups(df_fold, batch_format="pandas")
               .select_columns(["term", "df"]))

    joined = doc_tf.join(term_df, join_type="inner",
                         num_partitions=num_partitions, on=("term",))

    def add_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["__d"] = (df["doc_id"].to_numpy() % nb).astype("int64")
        return df

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tf", "df", "term"],
                          ascending=[True, False, True, True],
                          kind="mergesort")
        g = g.assign(rank=(g.groupby("doc_id").cumcount() + 1)
                     .astype("int64"))
        g = g[g["rank"] <= k]
        return g[["doc_id", "rank", "term", "tf", "df"]]

    return (joined.map_batches(add_doc_bucket, batch_format="pandas")
            .groupby("__d")
            .map_groups(topk, batch_format="pandas"))


def sql_top_terms_per_doc(k: int = TOP_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
), d AS (
  SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM d GROUP BY term
), ranked AS (
  SELECT d.doc_id, d.term, CAST(d.tf AS BIGINT) AS tf, f.df,
         row_number() OVER (PARTITION BY d.doc_id
                            ORDER BY d.tf DESC, f.df, d.term) AS rank
  FROM d JOIN dfreq f ON f.term = d.term
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df
FROM ranked WHERE rank <= {k}
"""


# --- term search (top-k retrieval against the index) ---------------------------

# fixed query term sets (the knn-style broadcast query side); scoring
# works identically for terms absent from the corpus (they add 0)
SEARCH_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("data", "query"),
    1: ("batch", "scan"),
    2: ("slow", "key", "column"),
    3: ("missing", "zzzunseen"),
}
SEARCH_K = 5


def search_weight(n_docs_total: int, df: int) -> int:
    """Integer idf flavor: rarer terms weigh more, floor-divided so the
    Ray path and the SQL mirror are bit-identical (no float log)."""
    return n_docs_total // df


def term_search_topk(sf_dir: str, k: int = SEARCH_K):
    """score(q, doc) = Σ_{t∈q} tf(t, doc) × (N // df(t)); top-k docs
    per query, ties broken by doc_id.  Shape: the df table folds as in
    the index build, broadcast-joins the per-doc tf rows (query terms
    prune map-side — only matching rows enter the exchange), then one
    tiny per-query top-k fold: the text twin of the kNN plan."""
    import pyarrow.parquet as pq
    import ray.data as rd

    n_total = pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    all_terms = sorted({t for ts in SEARCH_QUERIES.values() for t in ts})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    doc_tf = docs.map_batches(_doc_term_tf, batch_format="pyarrow",
                              batch_size=4096)

    def keep_query_terms(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["term"].isin(all_terms)]

    matches = doc_tf.map_batches(keep_query_terms, batch_format="pandas")

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)["doc_id"].size()
        out.columns = ["term", "df"]
        return out

    # query terms are a handful — the df table is tiny, collect+broadcast
    # (the knn query-side pattern), never a shuffle join
    df_map = dict(
        matches.map_batches(_with_term_bucket, batch_format="pandas")
        .groupby("__b").map_groups(df_fold, batch_format="pandas")
        .select_columns(["term", "df"]).to_pandas().itertuples(
            index=False, name=None))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        # MERGEABLE partials: one (qid, doc_id, score-contribution) row per
        # matching tf row; the top-k fold re-sums per (qid, doc_id), so a
        # document's term rows may split across batches/blocks freely.
        weight = batch["term"].map(
            lambda t: search_weight(n_total, df_map[t]) if t in df_map else 0
        ).to_numpy()
        contrib = batch["tf"].to_numpy().astype("int64") * weight
        doc = batch["doc_id"].to_numpy()
        parts = []
        for qid, terms in SEARCH_QUERIES.items():
            m = batch["term"].isin(terms).to_numpy() & (contrib > 0)
            parts.append(pd.DataFrame({
                "qid": np.full(int(m.sum()), qid, dtype="int64"),
                "doc_id": doc[m],
                "score": contrib[m],
            }))
        out = pd.concat(parts, ignore_index=True)
        return out.groupby(["qid", "doc_id"], as_index=False)["score"].sum()

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["qid", "doc_id"], as_index=False)["score"].sum()
        g = g.sort_values(["qid", "score", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.assign(rank=(g.groupby("qid").cumcount() + 1).astype("int64"))
        return g[g["rank"] <= k][["qid", "rank", "doc_id", "score"]]

    return (matches.map_batches(score, batch_format="pandas")
            .repartition(1)
            .groupby("qid")
            .map_groups(topk, batch_format="pandas"))


def sql_term_search_topk(k: int = SEARCH_K) -> str:
    q_values = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in sorted(SEARCH_QUERIES.items()) for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
), d AS (
  SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM d GROUP BY term
), q(qid, term) AS (VALUES {q_values}),
scores AS (
  SELECT q.qid, d.doc_id,
         sum(d.tf * ((SELECT count(*) FROM documents) // f.df)) AS score
  FROM q JOIN d ON d.term = q.term JOIN dfreq f ON f.term = q.term
  GROUP BY q.qid, d.doc_id
  HAVING sum(d.tf * ((SELECT count(*) FROM documents) // f.df)) > 0
), ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rank
  FROM scores
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
       doc_id, CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= {k}
"""


# --- collocation mining (top bigrams by integer lift) --------------------------

COLLOC_MIN_COUNT = 3
COLLOC_K = 50


def _bigram_partial(batch: pa.Table) -> pd.DataFrame:
    counts: dict[str, int] = {}
    for t in batch["text"].to_pylist():
        toks = tokenize(t)
        for a, b in zip(toks, toks[1:]):
            bg = f"{a} {b}"
            counts[bg] = counts.get(bg, 0) + 1
    return pd.DataFrame(counts.items(), columns=["bigram", "n"])


def _unigram_partial(batch: pa.Table) -> pd.DataFrame:
    counts: dict[str, int] = {}
    for t in batch["text"].to_pylist():
        for w in tokenize(t):
            counts[w] = counts.get(w, 0) + 1
    return pd.DataFrame(counts.items(), columns=["word", "n"])


def collocations(sf_dir: str, min_count: int = COLLOC_MIN_COUNT,
                 k: int = COLLOC_K, num_partitions: int = 8):
    """Phrase mining over the REAL text: bigrams ranked by integer
    lift, ``lift_milli = n_ab × N_tokens × 1000 // (n_a × n_b)`` —
    PMI's float-free cousin (monotone in PMI for fixed N).

    Shape: per-batch bigram/unigram pre-counts → one bucket fold each
    → min-count filter (kills the long tail BEFORE the joins) → two
    hash joins shipping the unigram counts to the bigram rows (the
    n-gram-Jaccard set-size pattern, partitions clamped) → distributed
    sort + limit for the global top-k.  N_tokens is the only driver
    scalar."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    nb = _term_fold_buckets(sf_dir)

    def word_bucket(df: pd.DataFrame, col: str) -> pd.DataFrame:
        df["__b"] = (pd.util.hash_array(df[col].to_numpy(dtype=object))
                     % nb).astype("int64")
        return df

    def fold(col):
        def _f(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(col, as_index=False)["n"].sum()
            return out
        return _f

    uni = (docs.map_batches(_unigram_partial, batch_format="pyarrow",
                            batch_size=4096)
           .map_batches(lambda d: word_bucket(d, "word"),
                        batch_format="pandas")
           .groupby("__b").map_groups(fold("word"), batch_format="pandas")
           .select_columns(["word", "n"]))

    n_tokens = int(uni.aggregate(Sum("n", alias_name="t"))["t"])

    bi = (docs.map_batches(_bigram_partial, batch_format="pyarrow",
                           batch_size=4096)
          .map_batches(lambda d: word_bucket(d, "bigram"),
                       batch_format="pandas")
          .groupby("__b").map_groups(fold("bigram"), batch_format="pandas")
          .map_batches(lambda d: d[d["n"] >= min_count],
                       batch_format="pandas")
          .select_columns(["bigram", "n"]))

    num_partitions = max(1, min(num_partitions,
                                bi.count() // 4096 + 1))

    def split_words(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["bigram"].str.split(" ", n=1, expand=True)
        df = df.rename(columns={"n": "n_ab"})
        df["wa"] = parts[0]
        df["wb"] = parts[1]
        return df

    bi2 = bi.map_batches(split_words, batch_format="pandas")
    with_a = bi2.join(
        uni.map_batches(
            lambda t: pa.table({"a_key": t["word"], "n_a": t["n"]}),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("wa",), right_on=("a_key",))
    with_b = with_a.join(
        uni.map_batches(
            lambda t: pa.table({"b_key": t["word"], "n_b": t["n"]}),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=("wb",), right_on=("b_key",))

    def lift(batch: pd.DataFrame) -> pa.Table:
        n_ab = batch["n_ab"].to_numpy()
        n_a = batch["n_a"].to_numpy()
        n_b = batch["n_b"].to_numpy()
        lm = (n_ab.astype(object) * n_tokens * 1000) // (n_a * n_b)
        return pa.table({
            "bigram": pa.array(batch["bigram"], pa.string()),
            "n_ab": pa.array(n_ab, pa.int64()),
            "n_a": pa.array(n_a, pa.int64()),
            "n_b": pa.array(n_b, pa.int64()),
            "lift_milli": pa.array([int(x) for x in lm], pa.int64()),
        })

    return (with_b.map_batches(lift, batch_format="pandas")
            .sort(["lift_milli", "bigram"], descending=[True, False])
            .limit(k))


def sql_collocations(min_count: int = COLLOC_MIN_COUNT,
                     k: int = COLLOC_K) -> str:
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[a-z]+') AS l FROM documents
), uni AS (
  SELECT unnest(l) AS w FROM toks
), un AS (
  SELECT w, count(*) AS n FROM uni GROUP BY w
), total AS (
  SELECT count(*) AS t FROM uni
), big AS (
  SELECT unnest([l[i] || ' ' || l[i+1]
                 for i in generate_series(1, len(l) - 1)]) AS bg
  FROM toks
), bn AS (
  SELECT bg, count(*) AS n_ab FROM big GROUP BY bg
  HAVING count(*) >= {min_count}
)
SELECT bg AS bigram, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ua.n AS BIGINT) AS n_a, CAST(ub.n AS BIGINT) AS n_b,
       CAST((n_ab * t.t * 1000) // (ua.n * ub.n) AS BIGINT)
         AS lift_milli
FROM bn
JOIN un ua ON ua.w = split_part(bg, ' ', 1)
JOIN un ub ON ub.w = split_part(bg, ' ', 2)
CROSS JOIN total t
ORDER BY lift_milli DESC, bigram
LIMIT {k}
"""
