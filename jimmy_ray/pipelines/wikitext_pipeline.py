"""Wiki-markup corpus pipeline: format-dispatch over heterogeneous rows.

Synthesizes a mixed-format markup corpus from `documents` (one format per
doc, round-robin over the M5-M9 converter family) and routes it through
FormatDispatchStage — the Ray analogue of the reference's per-extension
converter dispatch (/root/reference/src/jimmy/converter.py:239-316).
Golden outputs are simple enough to mirror in oracle SQL, giving the
grammar converters a driver-checked end-to-end path on top of their
doctest-corpus unit tests.
"""

from __future__ import annotations

import pyarrow as pa

KINDS = ("tiddlywiki", "zim", "zettelkasten", "roam", "colornote")

# (source template, golden markdown template) per kind
TEMPLATES = (
    ("''doc {id}'' {text}", "**doc {id}** {text}"),
    ("== doc {id} ==\n{text}", "##### doc {id}\n{text}"),
    ("[f]doc {id}[/f][br]{text}", "**doc {id}**\n{text}"),
    ("^^doc {id}^^ {text}", "==doc {id}== {text}"),
    ("[V] doc {id}\n[ ] {text}", "- [x] doc {id}\n- [ ] {text}"),
)


def wikitext_corpus_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    fmts, payloads, paths = [], [], []
    for doc_id, text in zip(ids, texts):
        kind = doc_id % len(KINDS)
        src = TEMPLATES[kind][0].replace("{id}", str(doc_id)).replace("{text}", text)
        fmts.append(KINDS[kind])
        payloads.append(src.encode("utf-8"))
        paths.append(f"doc_{doc_id:08d}.{KINDS[kind]}")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "path": pa.array(paths, pa.string()),
            "format": pa.array(fmts, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def wikitext_extract(sf_dir: str):
    import ray.data as rd

    from jimmy_ray.sources.readers import FormatDispatchStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    corpus = ds.map_batches(wikitext_corpus_batch, batch_format="pyarrow")
    converted = corpus.map_batches(
        FormatDispatchStage, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4),
    )
    return converted.select_columns(["doc_id", "format", "text"])


def lexical_corpus_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> Lexical/Super JSON payloads (M10 fixtures)."""
    import json

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    payloads = []
    for doc_id, text in zip(ids, texts):
        d = {"root": {"type": "root", "children": [
            {"type": "heading", "tag": "h1",
             "children": [{"type": "text", "text": f"Doc {doc_id}", "format": 0}]},
            {"type": "paragraph", "children": [
                {"type": "text", "text": "intro ", "format": 1},
                {"type": "text", "text": text, "format": 0},
            ]},
            {"type": "list", "listType": "check", "children": [
                {"type": "listitem", "checked": True,
                 "children": [{"type": "text", "text": f"done {doc_id}",
                               "format": 0}]},
                {"type": "listitem", "checked": False,
                 "children": [{"type": "text", "text": f"todo {doc_id}",
                               "format": 0}]},
            ]},
        ]}}
        payloads.append(json.dumps(d))
    return pa.table({"doc_id": batch["doc_id"],
                     "super_json": pa.array(payloads, pa.string())})


def lexical_extract(sf_dir: str):
    import ray.data as rd

    from jimmy_ray.md.lexical import super_to_markdown

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    corpus = ds.map_batches(lexical_corpus_batch, batch_format="pyarrow")

    def convert(batch: pa.Table) -> pa.Table:
        mds = [super_to_markdown(j) for j in batch["super_json"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(mds, pa.string())})

    return corpus.map_batches(convert, batch_format="pyarrow", batch_size=512)


def sql_lexical_extract() -> str:
    return (
        "SELECT doc_id, "
        "'# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || "
        "'**intro **' || text || chr(10) || chr(10) || "
        "'- [x] done ' || CAST(doc_id AS VARCHAR) || chr(10) || "
        "'- [ ] todo ' || CAST(doc_id AS VARCHAR) AS text "
        "FROM documents"
    )


def sql_wikitext_extract() -> str:
    fmt_case = "CASE doc_id % 5 " + " ".join(
        f"WHEN {i} THEN '{k}'" for i, k in enumerate(KINDS[:-1])
    ) + f" ELSE '{KINDS[-1]}' END"
    md_cases = []
    for i, (_, golden) in enumerate(TEMPLATES):
        expr = "'" + golden.replace("{id}", "' || CAST(doc_id AS VARCHAR) || '").replace(
            "{text}", "' || text || '"
        ) + "'"
        md_cases.append(f"WHEN {i} THEN {expr}")
    md_case = "CASE doc_id % 5 " + " ".join(md_cases) + " END"
    return (
        f"SELECT doc_id, {fmt_case} AS format, {md_case} AS text FROM documents"
    )
