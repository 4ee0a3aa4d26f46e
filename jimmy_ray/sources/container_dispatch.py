"""Container sniff + member dispatch: the default-walker archive layer.

The reference's default converter walks an input tree and opens archive
containers before per-file conversion — zip exports
(/root/reference/src/jimmy/formats/notion.py:20-47), tar ``.jex``
(formats/joplin.py), password-protected 7z fixture prep
(test/test_convert.py:262-298) — then routes each extracted file by
extension (converter.py:239-316).  In the engine, rows carry opaque
binary payloads, so routing keys off MAGIC BYTES (extensions lie on a
web crawl), the explode is a 1:N map_batches, and member text flows
through the same per-format parsers as FormatDispatchStage.

Pipeline shape: binary payload column → sniff container kind → explode
members → detect_format per member name → parse → one row per member
with dead-letter ``error`` semantics (SURVEY.md §2.9).  Unknown or
corrupt containers become a single error row, never a lost payload.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from collections.abc import Callable

import pyarrow as pa

from jimmy_ray.sources import sevenzip
from jimmy_ray.sources.readers import FormatDispatchStage, detect_format

_ZIP_MAGIC = b"PK\x03\x04"
_TAR_USTAR_OFF = 257


def sniff_container(payload: bytes) -> str | None:
    """zip / sevenzip / tar by magic bytes; None when not a container."""
    if payload[:4] == _ZIP_MAGIC:
        return "zip"
    if payload[:6] == sevenzip.SIGNATURE:
        return "sevenzip"
    if payload[_TAR_USTAR_OFF:_TAR_USTAR_OFF + 5] == b"ustar":
        return "tar"
    return None


def explode_container(payload: bytes,
                      password: str | None = None
                      ) -> list[tuple[str, bytes]]:
    """(member_name, member_bytes) rows; directories and __MACOSX
    resource-fork droppings dropped (notion.py:20-47 semantics)."""
    kind = sniff_container(payload)
    if kind == "zip":
        out = []
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for member in zf.namelist():
                if member.endswith("/") or member.startswith("__MACOSX/"):
                    continue
                out.append((member, zf.read(member)))
        return out
    if kind == "sevenzip":
        return sevenzip.parse_7z(payload, password)
    if kind == "tar":
        out = []
        with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
            for info in tf.getmembers():
                if not info.isfile():
                    continue
                out.append((info.name, tf.extractfile(info).read()))
        return out
    raise ValueError("payload is not a recognized container")


class ContainerDispatchStage:
    """map_batches stage: explode each row's container payload and parse
    every member through the per-format registry.

    Input columns: an id column (default ``doc_id``) + ``payload``
    (binary).  Output: one row per member — id, ``container`` (sniffed
    kind), ``member``, ``fmt``, ``text``, ``error``.  Parser state
    (compiled grammars, the format registry) builds once per actor in
    ``__init__``; ``__call__`` does per-batch work only.
    """

    def __init__(self, password: str | None = None,
                 id_column: str = "doc_id",
                 parsers: dict[str, Callable[[bytes], str]] | None = None):
        self.password = password
        self.id_column = id_column
        self.parsers = FormatDispatchStage(parsers).parsers

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, members, fmts, texts, errors = [], [], [], [], [], []

        def emit(i, kind, member, fmt, text, error):
            ids.append(i)
            kinds.append(kind)
            members.append(member)
            fmts.append(fmt)
            texts.append(text)
            errors.append(error)

        for row_id, payload in zip(batch[self.id_column].to_pylist(),
                                   batch["payload"].to_pylist()):
            kind = sniff_container(payload)
            if kind is None:
                emit(row_id, "", "", "", "", "unrecognized container magic")
                continue
            try:
                exploded = explode_container(payload, self.password)
            except Exception as exc:  # noqa: BLE001 dead-letter semantics
                emit(row_id, kind, "", "", "",
                     f"{type(exc).__name__}: {exc}")
                continue
            for member, data in exploded:
                fmt = detect_format(member)
                parser = self.parsers.get(fmt)
                if parser is None:
                    emit(row_id, kind, member, fmt, "",
                         f"no parser for format {fmt!r}")
                    continue
                try:
                    emit(row_id, kind, member, fmt, parser(data), None)
                except Exception as exc:  # noqa: BLE001
                    emit(row_id, kind, member, fmt, "",
                         f"{type(exc).__name__}: {exc}")

        return pa.table({
            self.id_column: pa.array(ids, batch[self.id_column].type),
            "container": pa.array(kinds, pa.string()),
            "member": pa.array(members, pa.string()),
            "fmt": pa.array(fmts, pa.string()),
            "text": pa.array(texts, pa.string()),
            "error": pa.array(errors, pa.string()),
        })


# --- fixture + pipeline + oracle (one module, one template) -----------------

def _tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _zip_bytes(members: list[tuple[str, bytes]]) -> bytes:
    from jimmy_ray.sources.fixturetpl import zip_bytes

    return zip_bytes(members)


def synth_container(doc_id: int, text: str) -> bytes:
    """One container per document, cycling zip → encrypted 7z → tar by
    doc_id%3, with markdown + html + plain-text members so the member
    parse exercises three registry formats.  7z archives alternate
    solid/per-member folder layouts (doc_id%2)."""
    members = [
        (f"Doc {doc_id}.md", f"# Doc {doc_id}\n\n{text}".encode()),
        ("notes/body.html",
         f"<h1>Doc {doc_id}</h1><p>{text}</p>".encode()),
        ("meta/source.txt", f"export {doc_id}".encode()),
    ]
    kind = doc_id % 3
    if kind == 0:
        return _zip_bytes(members + [("__MACOSX/._junk", b"fork noise")])
    if kind == 1:
        return sevenzip.build_7z(members, password=sevenzip.PASSWORD,
                                 cycles_power=10, solid=doc_id % 2 == 0)
    return _tar_bytes(members)


def container_dispatch(sf_dir: str):
    """documents → per-doc container (zip|7z|tar) → sniff + explode +
    per-format member parse — the archive layer of the default walker
    as one streaming pipeline."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def build(batch: pa.Table) -> pa.Table:
        payloads = [synth_container(d, t)
                    for d, t in zip(batch["doc_id"].to_pylist(),
                                    batch["text"].to_pylist())]
        return pa.table({
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
        })

    return docs.map_batches(
        build, batch_format="pyarrow", batch_size=128,
    ).map_batches(
        ContainerDispatchStage,
        fn_constructor_kwargs={"password": sevenzip.PASSWORD},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 8),
    )


def sql_container_dispatch() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    kind = "CASE doc_id % 3 WHEN 0 THEN 'zip' WHEN 1 THEN 'sevenzip' ELSE 'tar' END"
    return f"""
SELECT doc_id, {kind} AS container, member, fmt, text,
       CAST(NULL AS VARCHAR) AS error
FROM (
  SELECT doc_id, 'Doc ' || {i} || '.md' AS member, 'markdown' AS fmt,
         '# Doc ' || {i} || chr(10) || chr(10) || text AS text
  FROM documents
  UNION ALL
  SELECT doc_id, 'notes/body.html', 'html',
         '# Doc ' || {i} || chr(10) || chr(10) || text
  FROM documents
  UNION ALL
  SELECT doc_id, 'meta/source.txt', 'text', 'export ' || {i}
  FROM documents
)
"""
