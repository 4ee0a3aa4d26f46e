"""C4-style corpus cleaning: line/page quality rules + span dedup.

The published C4 cleaning recipe (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) — the rules a web-scale
training-data pipeline applies between main-content extraction and
near-dedup.  Documented subset implemented here:

line rules (a line is kept iff ALL hold):
- ends in a terminal punctuation mark (``. ! ? "``),
- has at least 5 words,
- does not contain the word "javascript" (case-insensitive);

page rules (a page is dropped iff ANY holds):
- fewer than 3 kept lines survive,
- the raw page mentions "lorem ipsum" (case-insensitive),
- the raw page contains a curly brace;

three-sentence-span dedup (``span_dedup``): any 3-sentence window
occurring more than once corpus-wide keeps only its FIRST occurrence
(lexicographic min ``(doc_id, pos)``); every other occurrence has
those three sentences removed from its page.

Scale shape: the filters are a stateless per-page map.  Span dedup is
two exchanges — explode windows → coarse span-hash bucket + local
first-occurrence fold (the high-cardinality-key pattern from
functions/dedup.py), then one hash join of the removal marks back to
the pages (pages without removals pass through the left-outer join
untouched).  Peak state = one span bucket; no driver-side map.  The
window key ships as the literal 3-sentence string at sandbox scale —
at 100 TB hash it map-side (same topology, 8-byte keys).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

TERMINAL = (".", "!", "?", '"')
MIN_WORDS = 5
MIN_SENTENCES = 3
SPAN = 3


def c4_line_keep(line: str) -> bool:
    s = line.strip()
    return (s.endswith(TERMINAL)
            and len(s.split()) >= MIN_WORDS
            and "javascript" not in s.lower())


def c4_page_keep(raw_text: str, kept_lines: list[str]) -> bool:
    low = raw_text.lower()
    return ("lorem ipsum" not in low
            and "{" not in raw_text
            and len(kept_lines) >= MIN_SENTENCES)


def c4_clean_page(raw_text: str) -> str | None:
    """Kept lines joined by newline, or None when the page is dropped."""
    kept = [ln for ln in raw_text.split("\n") if c4_line_keep(ln)]
    return "\n".join(kept) if c4_page_keep(raw_text, kept) else None


# --- fixtures ----------------------------------------------------------------

def synth_noisy_page(doc_id: int, text: str) -> str:
    """Six lines exercising every line rule, plus page-level poison
    markers on fixed doc_id residue classes."""
    i = doc_id
    lines = [
        f"Doc {i}: {text} end of line one.",
        f"Second sentence for doc {i} with plenty of words.",
    ]
    if i % 13 != 0:  # %13 pages end up under MIN_SENTENCES -> dropped
        lines.append(f"Third sentence for doc {i} also long enough to keep.")
    lines += [
        "Too short.",
        f"no terminal punctuation on this line {i}",
        "Please enable javascript to view the content here.",
    ]
    if i % 17 == 0:
        lines.append("Lorem ipsum dolor sit amet consectetur adipiscing"
                     " elit.")
    if i % 23 == 0:
        lines.append("Config is if (x) { render(); } else nothing today.")
    return "\n".join(lines)


def c4_filters(sf_dir: str):
    """documents → noisy pages → line+page rules → cleaned corpus."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, texts = [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            cleaned = c4_clean_page(synth_noisy_page(d, t))
            if cleaned is not None:
                ids.append(d)
                texts.append(cleaned)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def sql_c4_filters() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} || ': ' || text || ' end of line one.' || chr(10) ||
  'Second sentence for doc ' || {i} || ' with plenty of words.'
    || chr(10) ||
  'Third sentence for doc ' || {i} || ' also long enough to keep.'
    AS text
FROM documents
WHERE doc_id % 13 <> 0 AND doc_id % 17 <> 0 AND doc_id % 23 <> 0
"""


# --- three-sentence-span dedup ------------------------------------------------

N_SENT_GROUPS = 40
_SEP = "\x1f"


def synth_sentences(doc_id: int) -> list[str]:
    """Three per-doc body sentences + a 3-sentence intro shared by the
    doc's group (doc_id % N_SENT_GROUPS) — so exactly one window (the
    trailing triple) repeats corpus-wide."""
    i, g = doc_id, doc_id % N_SENT_GROUPS
    return [
        f"Alpha body sentence {i} stands alone.",
        f"Beta body sentence {i} stands alone.",
        f"Gamma body sentence {i} stands alone.",
        f"Shared intro for group {g} part one.",
        f"Shared intro for group {g} part two.",
        f"Shared intro for group {g} part three.",
    ]


def span_dedup(sf_dir: str, num_partitions: int = 8):
    import numpy as np
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def span_rows(batch: pa.Table) -> pa.Table:
        spans, ids, pos = [], [], []
        for d in batch["doc_id"].to_pylist():
            sents = synth_sentences(d)
            for p in range(len(sents) - SPAN + 1):
                spans.append(_SEP.join(sents[p:p + SPAN]))
                ids.append(d)
                pos.append(p)
        return pa.table({"span": pa.array(spans, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    spans = docs.map_batches(span_rows, batch_format="pyarrow",
                             batch_size=4096)

    from jimmy_ray.functions.folds import n_fold_buckets, parquet_rows

    # ≤ 8 sentence-window spans per doc (synth_sentences length bound)
    nb = n_fold_buckets(8 * parquet_rows(f"{sf_dir}/documents.parquet"))

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__b"] = (
            pd.util.hash_array(batch["span"].to_numpy(dtype=object)) % nb
        ).astype(np.int64)
        return batch

    def removals(g: pd.DataFrame) -> pd.DataFrame:
        # per span: first occurrence by (doc_id, pos) survives; mark the rest
        g = g.sort_values(["span", "doc_id", "pos"], kind="mergesort")
        dup = g.duplicated("span", keep="first")
        out = g.loc[dup, ["doc_id", "pos"]].copy()
        return out

    marks = (spans.map_batches(add_bucket, batch_format="pandas")
             .groupby("__b")
             .map_groups(removals, batch_format="pandas"))

    def fold_marks(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__d"] = (batch["doc_id"].to_numpy() % nb).astype(np.int64)
        return batch

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id")["pos"].apply(
            lambda s: json.dumps(sorted(s))).reset_index()
        agg.columns = ["doc_id", "pos_json"]
        return agg

    marks_per_doc = (marks.map_batches(fold_marks, batch_format="pandas")
                     .groupby("__d")
                     .map_groups(per_doc, batch_format="pandas")
                     .select_columns(["doc_id", "pos_json"]))

    joined = docs.join(marks_per_doc, join_type="left_outer",
                       num_partitions=num_partitions, on=("doc_id",))

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        ids, texts = [], []
        for d, pj in zip(batch["doc_id"], batch["pos_json"]):
            sents = synth_sentences(int(d))
            removed: set[int] = set()
            if not pd.isna(pj):
                for p in json.loads(pj):
                    removed.update(range(p, p + SPAN))
            ids.append(int(d))
            texts.append("\n".join(
                s for j, s in enumerate(sents) if j not in removed))
        return pd.DataFrame({"doc_id": ids, "text": texts})

    return joined.map_batches(apply, batch_format="pandas")


def sql_span_dedup() -> str:
    i = "CAST(d.doc_id AS VARCHAR)"
    g = f"CAST(d.doc_id % {N_SENT_GROUPS} AS VARCHAR)"
    return f"""
WITH owners AS (
  SELECT doc_id % {N_SENT_GROUPS} AS grp, min(doc_id) AS owner
  FROM documents GROUP BY doc_id % {N_SENT_GROUPS}
)
SELECT d.doc_id,
  'Alpha body sentence ' || {i} || ' stands alone.' || chr(10) ||
  'Beta body sentence ' || {i} || ' stands alone.' || chr(10) ||
  'Gamma body sentence ' || {i} || ' stands alone.' ||
  CASE WHEN d.doc_id = o.owner THEN chr(10) ||
    'Shared intro for group ' || {g} || ' part one.' || chr(10) ||
    'Shared intro for group ' || {g} || ' part two.' || chr(10) ||
    'Shared intro for group ' || {g} || ' part three.'
  ELSE '' END AS text
FROM documents d JOIN owners o ON d.doc_id % {N_SENT_GROUPS} = o.grp
"""


def c4_clean_batch(batch: pa.Table) -> pa.Table:
    """Pages-schema stage: keep surviving pages, text cleaned."""
    urls, texts = [], []
    for u, t in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        cleaned = c4_clean_page(t)
        if cleaned is not None:
            urls.append(u)
            texts.append(cleaned)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "text": pa.array(texts, pa.string())})
