"""Text analysis operators over the documents corpus (training-data tier).

Language-ID (stopword n-gram heuristic), quality scoring, token counting
and document fingerprinting — each as a vectorized ``map_batches`` body
with an exact DuckDB SQL mirror (all scores are ratios of integer counts,
so Python and SQL produce identical doubles).

The reference's analogous scalar layer is its string/tag word scans
(/root/reference/src/jimmy/md_lib/tags.py:4-27,
/root/reference/src/jimmy/common.py:276-343); these re-express that kind
of per-document scan as Arrow-column kernels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ASCII-explicit token regex: identical semantics in Python re, pandas and
# DuckDB RE2 (\w would be unicode in Python but ASCII in RE2).
TOKEN_RE = "[A-Za-z0-9_]+"

# fixed language marker sets (checked as whole words, lowercase)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # deterministic argmax tie-break

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> per-doc stats columns.

    n_tokens, n_stopwords, stop_ratio (=n_stop/n_tok), quality flag and
    the deterministic fingerprint (md5 of lowercased space-collapsed
    text, mirroring DuckDB's md5()).  Counting runs on Arrow's RE2
    kernels — the same engine DuckDB's regexp_* use, so the mirror is
    byte-identical by construction (and ~3x faster than pandas
    str.count for the alternation patterns)."""
    import pyarrow.compute as pc

    text = batch["text"]
    low = pc.utf8_lower(text)
    n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)
    n_tokens = pc.count_substring_regex(text, TOKEN_RE).to_numpy()
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = pc.count_substring_regex(low, stop_pat).to_numpy()
    denom = np.maximum(n_tokens, 1)
    stop_ratio = n_stop.astype(np.float64) / denom.astype(np.float64)
    mean_tok_len = n_chars.astype(np.float64) / denom.astype(np.float64)
    # quality: enough tokens, plausible mean token length, some stopwords
    quality_ok = (n_tokens >= 5) & (mean_tok_len <= 12.0) & (stop_ratio >= 0.0)
    # the exact SQL-mirror normalization: trim(' ') -> \s+ -> lower
    norm = pc.utf8_lower(pc.replace_substring_regex(
        pc.ascii_trim(text, " "), r"\s+", " "))
    fingerprints = [
        hashlib.md5(x).hexdigest()
        for x in norm.cast(pa.binary()).to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "quality_ok": pa.array(quality_ok, pa.bool_()),
            "fingerprint": pa.array(fingerprints, pa.string()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-marker language ID with a fixed tie-break order (RE2
    marker counts, same engine as the DuckDB mirror)."""
    import pyarrow.compute as pc

    low = pc.utf8_lower(batch["text"])
    counts = {}
    for lang in LANG_ORDER:
        pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        counts[lang] = pc.count_substring_regex(low, pat).to_numpy()
    n = len(low)
    pred = np.full(n, "und", dtype=object)
    best = np.zeros(n, dtype=np.int64)
    # iterate in LANG_ORDER; strict > keeps the earlier language on ties
    for lang in LANG_ORDER:
        better = counts[lang] > best
        pred[better] = lang
        best = np.maximum(best, counts[lang])
    pred[best == 0] = "und"
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(pred.tolist(), pa.string()),
            "marker_hits": pa.array(best, pa.int64()),
        }
    )


def word_count(sf_dir: str):
    """Corpus vocabulary counts (the canonical partial-agg wordcount):
    per-batch token histograms -> groupby(token) sum."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import re as _re

        counts: dict[str, int] = {}
        pat = _re.compile(TOKEN_RE)
        for text in batch["text"].to_pylist():
            for tok in pat.findall(text.lower()):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"token": pa.array(list(counts), pa.string()),
                         "p_n": pa.array(list(counts.values()), pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=4096).groupby(
        "token"
    ).aggregate(Sum("p_n", alias_name="n"))


def sql_word_count() -> str:
    return (
        "SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE.lower()}')) AS t "
        "FROM documents) GROUP BY t"
    )


def label_centroids(sf_dir: str):
    """Per-label embedding centroids (groupby + vector mean), rounded to
    6 decimals on both engines (float sums: see module determinism note)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch["label"].to_pylist())
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        rows = []
        for lbl in np.unique(labels):
            sel = vecs[labels == lbl]
            rows.append((int(lbl), sel.sum(axis=0), len(sel)))
        return pa.table({
            "label": pa.array([r[0] for r in rows], pa.int64()),
            "vec_sum": pa.array([list(r[1]) for r in rows],
                                pa.list_(pa.float64())),
            "p_n": pa.array([r[2] for r in rows], pa.int64()),
        })

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        total = np.sum(np.stack(group["vec_sum"].to_numpy()), axis=0)
        n = int(group["p_n"].sum())
        centroid = np.round(total / n, 6)
        out = pd.DataFrame({
            "label": [int(group["label"].iloc[0])],
            "n_vectors": [n],
        })
        for d, v in enumerate(centroid):
            out[f"c{d:02d}"] = v
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("label")
        .map_groups(merge, batch_format="pandas")
    )


def sql_label_centroids(dim: int = 64) -> str:
    cols = ", ".join(
        f"round(AVG(CAST(embedding[{d + 1}] AS DOUBLE)), 6) AS c{d:02d}"
        for d in range(dim)
    )
    return (
        f"SELECT CAST(label AS BIGINT) AS label, "
        f"CAST(COUNT(*) AS BIGINT) AS n_vectors, {cols} "
        "FROM embeddings GROUP BY label"
    )


# --- winnowing fingerprints (document fingerprinting, scale path) ----------

WINNOW_K = 5  # k-gram length (characters)
WINNOW_W = 8  # winnowing window


def winnow_fingerprints(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public
    algorithm): k-gram rolling hashes, one minimum per window, rightmost
    min on ties.  Guarantees: any shared substring of length >= w + k - 1
    yields at least one shared fingerprint."""
    norm = " ".join(text.lower().split())
    if len(norm) < k:
        return []
    base = 257
    mod = (1 << 61) - 1
    basek = pow(base, k - 1, mod)
    h = 0
    hashes = []
    for i, ch in enumerate(norm):
        o = ord(ch)
        if i < k:
            h = (h * base + o) % mod
            if i == k - 1:
                hashes.append(h)
        else:
            h = ((h - ord(norm[i - k]) * basek) * base + o) % mod
            hashes.append(h)
    if len(hashes) <= w:
        return sorted(set(hashes))
    fps = set()
    for start in range(len(hashes) - w + 1):
        window = hashes[start : start + w]
        m = min(window)
        # rightmost minimum
        idx = len(window) - 1 - window[::-1].index(m)
        fps.add(hashes[start + idx])
    return sorted(fps)


def winnow_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> exploded (doc_id, fingerprint) rows."""
    ids: list[int] = []
    fps: list[int] = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        for fp in winnow_fingerprints(text):
            ids.append(doc_id)
            fps.append(fp)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "fingerprint": pa.array(fps, pa.int64())})


# --- SQL mirrors -----------------------------------------------------------

def sql_text_stats() -> str:
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_tok = f"len(regexp_extract_all(text, '{TOKEN_RE}'))"
    n_stop = f"len(regexp_extract_all(lower(text), '{stop_pat}'))"
    return (
        "SELECT doc_id, "
        "CAST(length(text) AS BIGINT) AS n_chars, "
        f"CAST({n_tok} AS BIGINT) AS n_tokens, "
        f"CAST({n_stop} AS BIGINT) AS n_stopwords, "
        f"CAST({n_stop} AS DOUBLE) / CAST(greatest({n_tok}, 1) AS DOUBLE) AS stop_ratio, "
        f"(({n_tok}) >= 5 AND "
        f" CAST(length(text) AS DOUBLE) / CAST(greatest({n_tok}, 1) AS DOUBLE) <= 12.0) "
        "AS quality_ok, "
        "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint "
        "FROM documents"
    )


def sql_lang_id() -> str:
    count_exprs = {}
    for lang in LANG_ORDER:
        pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        count_exprs[lang] = f"len(regexp_extract_all(lower(text), '{pat}'))"
    c = count_exprs
    best = f"greatest({c['en']}, {c['de']}, {c['fr']}, {c['es']})"
    pred = (
        f"CASE WHEN {best} = 0 THEN 'und' "
        f"WHEN {c['en']} = {best} THEN 'en' "
        f"WHEN {c['de']} = {best} THEN 'de' "
        f"WHEN {c['fr']} = {best} THEN 'fr' "
        f"ELSE 'es' END"
    )
    return (
        f"SELECT doc_id, {pred} AS pred_lang, "
        f"CAST({best} AS BIGINT) AS marker_hits FROM documents"
    )


# --- composed curation pipeline (quality -> lang -> exact dedup) -----------

def curate_corpus(sf_dir: str, lang: str = "en"):
    """The canonical training-data curation chain as ONE streaming
    pipeline: per-doc stats -> quality gate -> language gate -> exact
    dedup (representative = min doc_id per fingerprint).  The dedup uses
    the coarse-bucket + local-groupby shape (high-cardinality groups
    degrade Ray's groupby().aggregate(); see jimmy_ray.functions.dedup
    .pair_grouped rationale) — one 256-way shuffle regardless of corpus
    size."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        stats = text_stats_batch(batch)
        langs = lang_id_batch(batch)
        keep = pa.array(
            stats["quality_ok"].to_numpy(zero_copy_only=False)
            & (langs["pred_lang"].to_numpy(zero_copy_only=False) == lang)
        )
        kept = pa.table({
            "doc_id": batch["doc_id"],
            "fingerprint": stats["fingerprint"],
            "n_tokens": stats["n_tokens"],
        }).filter(keep)
        return kept.append_column(
            "bucket",
            pa.array(
                [int(fp[:2], 16) for fp in kept["fingerprint"].to_pylist()],
                pa.int64(),
            ),
        )

    def local_dedup(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pd.DataFrame({
                "fingerprint": pd.Series([], dtype=str),
                "keep_doc_id": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "n_dups": pd.Series([], dtype=np.int64),
            })
        g = group.sort_values("doc_id", kind="mergesort")
        agg = g.groupby("fingerprint", as_index=False).agg(
            keep_doc_id=("doc_id", "min"),
            n_tokens=("n_tokens", "first"),
            n_dups=("doc_id", "size"),
        )
        agg["n_dups"] = agg["n_dups"].astype(np.int64)
        return agg[["fingerprint", "keep_doc_id", "n_tokens", "n_dups"]]

    return (
        ds.map_batches(gate, batch_format="pyarrow", batch_size=1024)
        .groupby("bucket")
        .map_groups(local_dedup, batch_format="pandas")
    )


def sql_curate_corpus(lang: str = "en") -> str:
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_tok = f"len(regexp_extract_all(text, '{TOKEN_RE}'))"
    quality = (
        f"(({n_tok}) >= 5 AND CAST(length(text) AS DOUBLE) / "
        f"CAST(greatest({n_tok}, 1) AS DOUBLE) <= 12.0)"
    )
    count_exprs = {}
    for lg in LANG_ORDER:
        pat = r"\b(" + "|".join(LANG_MARKERS[lg]) + r")\b"
        count_exprs[lg] = f"len(regexp_extract_all(lower(text), '{pat}'))"
    c = count_exprs
    best = f"greatest({c['en']}, {c['de']}, {c['fr']}, {c['es']})"
    pred = (
        f"CASE WHEN {best} = 0 THEN 'und' "
        f"WHEN {c['en']} = {best} THEN 'en' "
        f"WHEN {c['de']} = {best} THEN 'de' "
        f"WHEN {c['fr']} = {best} THEN 'fr' "
        f"ELSE 'es' END"
    )
    return f"""
WITH gated AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
         CAST({n_tok} AS BIGINT) AS n_tokens
  FROM documents
  WHERE {quality} AND ({pred}) = '{lang}'
)
SELECT fingerprint, MIN(doc_id) AS keep_doc_id,
       arg_min(n_tokens, doc_id) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM gated GROUP BY fingerprint
"""


# --- repetition stats (Gopher-style quality signals) -----------------------

def repetition_stats(sf_dir: str):
    """Per-doc repetition signals: most-frequent-token share and
    duplicate-line share — the classic web-text quality gates that catch
    keyword-stuffed / template pages.  Pure per-doc map (no shuffle)."""
    import collections

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tok_re = __import__("re").compile(TOKEN_RE)

    def stats(batch: pa.Table) -> pa.Table:
        top_n, tot_n, dup_lines, n_lines = [], [], [], []
        for text in batch["text"].to_pylist():
            toks = tok_re.findall(text.lower())
            counts = collections.Counter(toks)
            top_n.append(max(counts.values()) if counts else 0)
            tot_n.append(len(toks))
            lines = text.split("\n")
            n_lines.append(len(lines))
            dup_lines.append(len(lines) - len(set(lines)))
        top = np.array(top_n, dtype=np.int64)
        tot = np.array(tot_n, dtype=np.int64)
        ratio = top.astype(np.float64) / np.maximum(tot, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "top_token_n": pa.array(top, pa.int64()),
            "n_tokens": pa.array(tot, pa.int64()),
            "top_token_ratio": pa.array(ratio, pa.float64()),
            "n_dup_lines": pa.array(np.array(dup_lines, np.int64), pa.int64()),
            "n_lines": pa.array(np.array(n_lines, np.int64), pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=2048)


def sql_repetition_stats() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS t
  FROM documents
),
cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
agg AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM cnt GROUP BY 1),
lines AS (
  SELECT doc_id,
         len(string_split(text, chr(10))) AS n_lines,
         len(string_split(text, chr(10)))
           - len(list_distinct(string_split(text, chr(10)))) AS n_dup
  FROM documents
)
SELECT d.doc_id AS doc_id,
  CAST(coalesce(a.mx, 0) AS BIGINT) AS top_token_n,
  CAST(coalesce(a.tot, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(a.mx, 0) AS DOUBLE)
    / CAST(greatest(coalesce(a.tot, 0), 1) AS DOUBLE) AS top_token_ratio,
  CAST(l.n_dup AS BIGINT) AS n_dup_lines,
  CAST(l.n_lines AS BIGINT) AS n_lines
FROM documents d
LEFT JOIN agg a USING (doc_id) JOIN lines l ON l.doc_id = d.doc_id
"""


# --- BPE-ish token counting ------------------------------------------------

# GPT-2-style pre-tokenizer, ASCII-restricted so Python re and DuckDB RE2
# agree byte-for-byte (\p{L} classes differ between the engines).
BPE_RE = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n]+|[ \\t\\n]+"
)


def bpe_token_count(sf_dir: str):
    """Per-doc pre-tokenizer counts (the training-data cost metric):
    n_bpe_tokens plus the whitespace-word count for comparison."""
    import re as _re

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pat = _re.compile(BPE_RE)

    def counts(batch: pa.Table) -> pa.Table:
        n_bpe, n_ws = [], []
        for text in batch["text"].to_pylist():
            n_bpe.append(len(pat.findall(text)))
            n_ws.append(len(text.split()))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            "n_ws_tokens": pa.array(n_ws, pa.int64()),
        })

    return ds.map_batches(counts, batch_format="pyarrow", batch_size=4096)


def sql_bpe_token_count() -> str:
    pat = BPE_RE.replace("\\t", "\\t").replace("'", "''")
    return f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, '[^ \\t\\n]+')) AS BIGINT) AS n_ws_tokens
FROM documents
"""
