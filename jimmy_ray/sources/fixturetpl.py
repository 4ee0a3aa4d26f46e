"""Shared fixture/oracle plumbing for golden-template readers.

Every format module follows the enex.py recipe — synth fixture +
golden markdown template + SQL mirror generated from the SAME template
— so the template→SQL transform and the documents→synth→parse query
shape live here once.  A quoting or placeholder change lands in one
place instead of silently diverging across modules.
"""

from __future__ import annotations

import io
import zipfile

import pyarrow as pa

# fixtures must be byte-stable across runs; zipfile stamps wall-clock
# DOS times into member headers unless given an explicit ZipInfo
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def zip_bytes(members: list[tuple[str, bytes | str]]) -> bytes:
    """Deterministic zip: fixed member timestamps, stored order."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            zf.writestr(zipfile.ZipInfo(name, _ZIP_EPOCH), data)
    return buf.getvalue()


def sql_golden(template: str) -> str:
    """Golden markdown template → the DuckDB string expression the
    oracle concatenates ({id} = doc_id, {text} = documents.text)."""
    return ("'" + template.replace("'", "''")
            .replace("{id}", "' || CAST(doc_id AS VARCHAR) || '")
            .replace("{text}", "' || text || '")
            .replace("\n", "' || chr(10) || '") + "'")


def sql_golden_query(template: str) -> str:
    return f"SELECT doc_id, {sql_golden(template)} AS text FROM documents"


def extract_query(synth_fn, parse_fn, batch_size: int = 256):
    """documents → per-doc synth fixture → parse → (doc_id, text)."""

    def query(sf_dir: str):
        import ray.data as rd

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

        def fn(batch: pa.Table) -> pa.Table:
            texts = [parse_fn(synth_fn(d, t))
                     for d, t in zip(batch["doc_id"].to_pylist(),
                                     batch["text"].to_pylist())]
            return pa.table({"doc_id": batch["doc_id"],
                             "text": pa.array(texts, pa.string())})

        return docs.map_batches(fn, batch_format="pyarrow",
                                batch_size=batch_size)

    return query
