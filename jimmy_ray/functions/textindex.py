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


def _with_term_bucket(df: pd.DataFrame) -> pd.DataFrame:
    df["__b"] = (pd.util.hash_array(df["term"].to_numpy(dtype=object))
                 % 64).astype("int64")
    return df


def inverted_index(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

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
            .map_batches(_with_term_bucket, batch_format="pandas")
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

    def df_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)["doc_id"].size()
        out.columns = ["term", "df"]
        return out

    term_df = (doc_tf.map_batches(_with_term_bucket, batch_format="pandas")
               .groupby("__b")
               .map_groups(df_fold, batch_format="pandas")
               .select_columns(["term", "df"]))

    joined = doc_tf.join(term_df, join_type="inner",
                         num_partitions=num_partitions, on=("term",))

    def add_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["__d"] = (df["doc_id"].to_numpy() % 64).astype("int64")
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
