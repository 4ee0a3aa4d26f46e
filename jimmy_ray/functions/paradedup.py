"""Paragraph-level boilerplate removal (training-data tier).

The classic web-corpus cleanup: a paragraph that repeats across ≥ K
documents (nav chrome, cookie banners, copyright footers) is boilerplate
and is dropped from every document.  Two passes, both streaming:

1. paragraph fingerprint histogram — per-batch combiner emits one
   (fp, n) row per distinct paragraph per batch, coalesced into a small
   groupby; the boilerplate set (count ≥ K) is collected to the driver.
   Driver state is O(|boilerplate|), bounded above by corpus_rows / K —
   the standard broadcast assumption for boilerplate sets.
2. re-scan documents, drop paragraphs whose fingerprint is in the
   broadcast set, emit (doc_id, clean_text, n_dropped).

Fixture: each document contributes its text plus a per-source footer
paragraph, so footers of any source with ≥ K docs are boilerplate — the
DuckDB mirror recomputes this from source counts alone.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

BOILERPLATE_K = 2


def _footer(source: str) -> str:
    return f"copyright footer {source}"


def _paragraphs(doc_id: int, text: str, source: str) -> list[str]:
    return [text, _footer(source)]


def _fp(paragraph: str) -> str:
    return hashlib.md5(paragraph.encode()).hexdigest()


def paragraph_boilerplate_fps(docs_ds, k: int = BOILERPLATE_K) -> set[str]:
    """Pass 1: fingerprints of paragraphs appearing in ≥ k documents."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for doc_id, text, source in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
            batch["source"].to_pylist(),
        ):
            for para in _paragraphs(doc_id, text, source):
                fp = _fp(para)
                counts[fp] = counts.get(fp, 0) + 1
        return pa.table({
            "fp": pa.array(list(counts), pa.string()),
            "p_n": pa.array(list(counts.values()), pa.int64()),
        })

    hist = (
        docs_ds.map_batches(partial, batch_format="pyarrow", batch_size=1024)
        .repartition(8)
        .groupby("fp")
        .aggregate(Sum("p_n", alias_name="n"))
    )

    def survivors(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(batch["n"].to_numpy() >= k))

    # filter count>=k BEFORE anything reaches the driver: only the
    # boilerplate survivors (bounded above by corpus_rows / k) stream back
    fps: set[str] = set()
    for b in hist.map_batches(survivors, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        fps.update(b["fp"].to_pylist())
    return fps


def paragraph_dedup(sf_dir: str, k: int = BOILERPLATE_K):
    """(doc_id, clean_text, n_dropped) after boilerplate removal."""
    import ray.data as rd

    def load():
        return rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])

    boiler = paragraph_boilerplate_fps(load(), k)

    def clean(batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        dropped: list[int] = []
        for doc_id, text, source in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
            batch["source"].to_pylist(),
        ):
            kept = []
            n_drop = 0
            for para in _paragraphs(doc_id, text, source):
                if _fp(para) in boiler:
                    n_drop += 1
                else:
                    kept.append(para)
            texts.append("\n\n".join(kept))
            dropped.append(n_drop)
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(texts, pa.string()),
            "n_dropped": pa.array(dropped, pa.int64()),
        })

    return load().map_batches(clean, batch_format="pyarrow", batch_size=1024)


def sql_paragraph_dedup(k: int = BOILERPLATE_K) -> str:
    """Mirror: a footer is boilerplate iff its source has ≥ k docs; the
    body paragraph is boilerplate iff its exact text repeats ≥ k times."""
    return f"""
WITH sc AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
tc AS (SELECT text, COUNT(*) AS n FROM documents GROUP BY text)
SELECT d.doc_id AS doc_id,
  CASE
    WHEN tc.n >= {k} AND sc.n >= {k} THEN ''
    WHEN tc.n >= {k} THEN 'copyright footer ' || d.source
    WHEN sc.n >= {k} THEN d.text
    ELSE d.text || chr(10) || chr(10) || 'copyright footer ' || d.source
  END AS clean_text,
  CAST((CASE WHEN sc.n >= {k} THEN 1 ELSE 0 END)
       + (CASE WHEN tc.n >= {k} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM documents d
JOIN sc USING (source) JOIN tc ON tc.text = d.text
"""
