"""Filename-recovery lookup (SURVEY.md §2.4 J7).

The reference resolves referenced-but-renamed resource files with a
recursive filesystem probe ladder: exact (url-unquoted) match with
sorted-first tie-break, unique alternative-suffix retry
(common.py:205-219 find_file_recursively), then same-stem any-suffix
case-sensitive / case-insensitive (common.py:505-519 try_other_suffixes).

Ray-shaped: the file inventory is the *small side* (like the J2 dim
table), loaded once per actor in ``__init__`` into three hash indexes
(basename → sorted paths, stem → paths, lower-stem → paths); probes are
per-batch dictionary lookups — no filesystem walks, no per-batch index
rebuilds, and the fact table streams.
"""

from __future__ import annotations

from urllib.parse import unquote

import pyarrow as pa

TRY_SUFFIXES = (".png",)


def _stem_suffix(name: str) -> tuple[str, str]:
    dot = name.rfind(".")
    if dot <= 0:
        return name, ""
    return name[:dot], name[dot:]


class FilenameRecoveryStage:
    """Actor-pool stage: basename→path index built once per actor."""

    def __init__(self, inventory: list[str]):
        self.by_name: dict[str, str] = {}
        self.by_stem: dict[str, str] = {}
        self.by_stem_lower: dict[str, str] = {}
        self.count_by_name: dict[str, int] = {}
        for path in sorted(inventory):
            name = path.rsplit("/", 1)[-1]
            self.by_name.setdefault(name, path)  # sorted-first tie-break
            self.count_by_name[name] = self.count_by_name.get(name, 0) + 1
            stem, _ = _stem_suffix(name)
            self.by_stem.setdefault(stem, path)
            self.by_stem_lower.setdefault(stem.lower(), path)

    def resolve(self, url: str) -> str | None:
        name = unquote(url).rsplit("/", 1)[-1]
        if (hit := self.by_name.get(name)) is not None:
            return hit
        stem, _ = _stem_suffix(name)
        # unique alternative-suffix retry (find_file_recursively)
        for suffix in TRY_SUFFIXES:
            candidate = stem + suffix
            if self.count_by_name.get(candidate, 0) == 1:
                return self.by_name[candidate]
        # same stem, any suffix (try_other_suffixes)
        if (hit := self.by_stem.get(stem)) is not None:
            return hit
        return self.by_stem_lower.get(stem.lower())

    def __call__(self, batch: pa.Table) -> pa.Table:
        resolved = [self.resolve(u) for u in batch["probe_url"].to_pylist()]
        return batch.append_column(
            "resolved", pa.array(resolved, pa.string())
        )


# --- oracle-checked fixture pipeline ---------------------------------------

def _inventory_from_documents(sf_dir: str) -> list[str]:
    """Fixture inventory: per doc an exact file + a case-variant file, plus
    one shared name per source (exercises the sorted-first tie-break)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    paths: list[str] = []
    sources: set[str] = set()
    for doc_id, source in zip(t["doc_id"].to_pylist(), t["source"].to_pylist()):
        paths.append(f"res/{source}/img_{doc_id}.png")
        paths.append(f"res/{source}/PIC_{doc_id}.JPG")
        sources.add(source)
    paths.extend(f"res/{s}/shared.png" for s in sources)
    return paths


def filename_recovery(sf_dir: str):
    """Probe ladder over the fixture inventory: exact-unquoted, suffix
    retry, case-insensitive stem, shared-name tie-break, miss → NULL."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def probes(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        kinds: list[str] = []
        urls: list[str] = []
        for i in batch["doc_id"].to_pylist():
            for kind, url in (
                ("exact", f"img%5F{i}.png"),          # %5F == _ (unquote)
                ("suffix", f"img_{i}.jpg"),           # retry as .png
                ("stem", f"pic_{i}.gif"),             # ci-stem -> PIC_i.JPG
                ("shared", "shared.png"),             # sorted-first path
                ("miss", f"gone_{i}.xyz"),            # NULL
            ):
                ids.append(i)
                kinds.append(kind)
                urls.append(url)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "probe": pa.array(kinds, pa.string()),
            "probe_url": pa.array(urls, pa.string()),
        })

    probe_ds = docs.map_batches(probes, batch_format="pyarrow", batch_size=512)
    return probe_ds.map_batches(
        FilenameRecoveryStage,
        fn_constructor_kwargs={"inventory": _inventory_from_documents(sf_dir)},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )


def sql_filename_recovery() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
WITH shared AS (
  SELECT MIN('res/' || source || '/shared.png') AS p FROM documents
),
probes(kind, n) AS (VALUES ('exact', 0), ('suffix', 1), ('stem', 2),
                           ('shared', 3), ('miss', 4))
SELECT doc_id, kind AS probe,
  CASE kind
    WHEN 'exact'  THEN 'img%5F' || {i} || '.png'
    WHEN 'suffix' THEN 'img_' || {i} || '.jpg'
    WHEN 'stem'   THEN 'pic_' || {i} || '.gif'
    WHEN 'shared' THEN 'shared.png'
    ELSE 'gone_' || {i} || '.xyz' END AS probe_url,
  CASE kind
    WHEN 'exact'  THEN 'res/' || source || '/img_' || {i} || '.png'
    WHEN 'suffix' THEN 'res/' || source || '/img_' || {i} || '.png'
    WHEN 'stem'   THEN 'res/' || source || '/PIC_' || {i} || '.JPG'
    WHEN 'shared' THEN (SELECT p FROM shared)
    ELSE NULL END AS resolved
FROM documents, probes
"""
