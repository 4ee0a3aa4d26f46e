"""Training-data mixture construction + hygiene ops (training-data tier).

Three verbs every LLM corpus pipeline runs before tokenization:

- :func:`stratified_sample` — per-language sampling rates applied with a
  deterministic multiplicative-hash threshold (no RNG), so the sample is
  identical at any partitioning/cluster size and exactly SQL-mirrorable.
- :func:`pii_scrub` — email/phone redaction with RE2-compatible patterns
  (identical semantics in Python re and DuckDB regexp_replace).
- :func:`decontaminate` — benchmark-overlap flagging: the eval set's
  n-gram shingles are a bounded broadcast set; any corpus doc sharing a
  shingle is flagged (the replica corpus makes overlap transitive, so
  flagged ⊋ the eval docs themselves).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from jimmy_ray.functions.dedup import (
    MUTATION_OFFSET, mutated_corpus_batch, shingles,
)

_SAMPLE_MOD = 1 << 32
DEFAULT_RATES = {"en": 0.5, "de": 1.0, "fr": 0.75, "es": 0.25, "zh": 0.1}

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2} \([0-9]{3}\) [0-9]{3}-[0-9]{4}"
EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 -> benchmark ("eval") document


def stratified_sample(sf_dir: str, rates: dict[str, float] | None = None):
    """(doc_id, lang) rows that survive per-language sampling."""
    import ray.data as rd

    rates = DEFAULT_RATES if rates is None else rates

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        h = (ids * np.uint64(2654435761)) % np.uint64(_SAMPLE_MOD)
        thresholds = np.array(
            [int(rates.get(lg, 0.0) * _SAMPLE_MOD) for lg in langs],
            dtype=np.uint64,
        )
        return batch.filter(pa.array(h < thresholds))

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(keep, batch_format="pyarrow", batch_size=8192)


def sql_stratified_sample(rates: dict[str, float] | None = None) -> str:
    rates = DEFAULT_RATES if rates is None else rates
    cases = " ".join(
        f"WHEN '{lg}' THEN {int(r * _SAMPLE_MOD)}" for lg, r in rates.items()
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE (doc_id * 2654435761) % {_SAMPLE_MOD}
      < (CASE lang {cases} ELSE 0 END)
"""


def _inject_pii(doc_id: int, text: str) -> str:
    return (
        f"{text} contact user{doc_id}@ex{doc_id % 7}.com "
        f"or +1 (555) 123-{doc_id % 10000:04d}"
    )


def pii_scrub(sf_dir: str):
    """(doc_id, clean_text, n_emails, n_phones) after redaction."""
    import ray.data as rd

    email = re.compile(EMAIL_RE)
    phone = re.compile(PHONE_RE)

    def scrub(batch: pa.Table) -> pa.Table:
        texts, n_em, n_ph = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            raw = _inject_pii(doc_id, text)
            out, k_em = email.subn("[EMAIL]", raw)
            out, k_ph = phone.subn("[PHONE]", out)
            texts.append(out)
            n_em.append(k_em)
            n_ph.append(k_ph)
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(texts, pa.string()),
            "n_emails": pa.array(n_em, pa.int64()),
            "n_phones": pa.array(n_ph, pa.int64()),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scrub, batch_format="pyarrow", batch_size=4096)


def sql_pii_scrub() -> str:
    # counts computed from the same strings the scrub runs over (emails
    # counted on the raw text, phones on the email-scrubbed text — the
    # exact subn order), so document text containing real PII stays in
    # parity (ADVICE r2 low #1)
    return f"""
WITH raw AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@ex'
      || CAST(doc_id % 7 AS VARCHAR) || '.com or +1 (555) 123-'
      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
),
em AS (
  SELECT doc_id, regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g') AS t1,
    CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails
  FROM raw
)
SELECT doc_id,
  regexp_replace(t1, '{PHONE_RE}', '[PHONE]', 'g') AS clean_text,
  n_emails,
  CAST(len(regexp_extract_all(t1, '{PHONE_RE}')) AS BIGINT) AS n_phones
FROM em
"""


def benchmark_shingles(sf_dir: str) -> set[str]:
    """Shingle set of the eval documents — the bounded broadcast side
    (|eval| = corpus/EVAL_MOD by construction).  Extraction is a
    distributed filter + per-batch shingle explode; only the eval-set
    shingle rows ever reach the driver, never the corpus."""
    import ray.data as rd

    def eval_shingles(batch: pa.Table) -> pa.Table:
        out: list[str] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            if doc_id % EVAL_MOD == 0:
                out.extend(shingles(text))
        return pa.table({"s": pa.array(out, pa.string())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    result: set[str] = set()
    for b in ds.map_batches(eval_shingles, batch_format="pyarrow",
                            batch_size=2048).iter_batches(
                                batch_format="pyarrow"):
        result.update(b["s"].to_pylist())
    return result


def decontaminate(sf_dir: str):
    """(doc_id, contaminated, n_hits) over the replicated corpus: docs
    sharing any eval-set shingle are flagged (eval docs AND their
    near-dup replicas — the transitive leak decontamination must catch)."""
    import ray.data as rd

    bench = benchmark_shingles(sf_dir)

    def flag(batch: pa.Table) -> pa.Table:
        hits = []
        for text in batch["text"].to_pylist():
            hits.append(sum(1 for s in shingles(text) if s in bench))
        n = np.array(hits, dtype=np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "contaminated": pa.array(n > 0),
            "n_hits": pa.array(n, pa.int64()),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(mutated_corpus_batch, batch_format="pyarrow") \
     .map_batches(flag, batch_format="pyarrow", batch_size=2048)


def sql_decontaminate() -> str:
    from jimmy_ray.functions.dedup import SQL_CORPUS_CTE

    return f"""
WITH {SQL_CORPUS_CTE},
sh AS (
  SELECT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
        FROM corpus),
       unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
bench AS (
  SELECT DISTINCT s FROM dsh WHERE doc_id % {EVAL_MOD} = 0
    AND doc_id < {MUTATION_OFFSET}
),
hits AS (
  SELECT d.doc_id, COUNT(*) AS n
  FROM dsh d JOIN bench b ON b.s = d.s GROUP BY d.doc_id
)
SELECT c.doc_id AS doc_id,
  coalesce(h.n, 0) > 0 AS contaminated,
  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits
FROM (SELECT DISTINCT doc_id FROM corpus) c
LEFT JOIN hits h USING (doc_id)
"""


# --- fixed-window chunking (pre-tokenization splitter) ---------------------

CHUNK_W = 16   # tokens per chunk
CHUNK_S = 12   # stride (CHUNK_W - CHUNK_S = 4 tokens of overlap)


def chunk_documents(sf_dir: str, window: int = CHUNK_W, stride: int = CHUNK_S):
    """1:N explode into overlapping fixed-token windows — the
    pre-tokenization chunker: chunk i covers tokens [i·stride,
    i·stride+window); the final partial window is kept iff it starts
    inside the document (standard sliding-window chunking)."""
    import ray.data as rd

    tok_re = re.compile("[A-Za-z0-9_]+")

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, chunks, counts = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            toks = tok_re.findall(text)
            i = 0
            start = 0
            while start < len(toks):
                piece = toks[start : start + window]
                ids.append(doc_id)
                idxs.append(i)
                chunks.append(" ".join(piece))
                counts.append(len(piece))
                if start + window >= len(toks):
                    break
                i += 1
                start += stride
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk": pa.array(chunks, pa.string()),
            "n_tokens": pa.array(counts, pa.int64()),
        })

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(explode, batch_format="pyarrow", batch_size=4096)


def sql_chunk_documents(window: int = CHUNK_W, stride: int = CHUNK_S) -> str:
    # chunk i exists iff i == 0 or i*stride < n_tokens and the PREVIOUS
    # chunk did not already reach the end (start+window >= n ends the walk)
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS t,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n
  FROM documents
),
idx AS (
  SELECT doc_id, t, n, i
  FROM toks, unnest(range(0, 1 + greatest(n - 1, 0) // {stride})) AS u(i)
  WHERE n > 0 AND (i = 0 OR (i * {stride} < n AND (i - 1) * {stride} + {window} < n))
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
  array_to_string(t[i * {stride} + 1 : i * {stride} + {window}], ' ') AS chunk,
  CAST(least(n - i * {stride}, {window}) AS BIGINT) AS n_tokens
FROM idx
"""
