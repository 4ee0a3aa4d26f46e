"""Standard Notes export reader: references-invert join (S8).

The reference does two passes over the backup's ``items`` array
(/root/reference/src/jimmy/formats/standard_notes.py:265-304): Tag items
carry references TO notes, so it first builds note_uuid → tags, then
emits notes with their inverted tag set; ``super`` notes route through
the Lexical walker (standard_notes.py:228-239 → SuperToMarkdown, here
jimmy_ray.md.lexical).

Ray-shaped: the invert is a real m:n exchange — tag items flat_map to
(note_uuid, tag) pairs, a groupby(note_uuid) folds them to a sorted tag
list, and a hash join attaches them to the note rows.  Deleted items are
dropped on both passes.  Fixture items derive from ``documents`` (tag
``t{doc_id%5}`` shard-wise, mirroring a sharded export) with a DuckDB
SQL mirror.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa


def synth_items_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> Standard-Notes-style items rows (JSON strings).

    Per doc: one Note item (uuid u{id}; noteType super for id%4==0 else
    plain-text; starred for id%6==0; a deleted twin for id%9==0 that must
    be skipped).  Per batch: one Tag item per tag bucket referencing this
    batch's notes (sharded export shape)."""
    from jimmy_ray.pipelines.wikitext_pipeline import lexical_corpus_batch

    supers = lexical_corpus_batch(batch)["super_json"].to_pylist()
    items: list[str] = []
    refs: dict[int, list[str]] = {}
    for doc_id, text, super_json in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist(), supers
    ):
        uuid = f"u{doc_id}"
        note_type = "super" if doc_id % 4 == 0 else "plain-text"
        body = super_json if note_type == "super" else text
        items.append(json.dumps({
            "content_type": "Note",
            "uuid": uuid,
            "content": {"title": f"Doc {doc_id}", "noteType": note_type,
                        "text": body, "starred": doc_id % 6 == 0},
        }))
        if doc_id % 9 == 0:  # deleted twin: must not surface
            items.append(json.dumps({
                "content_type": "Note", "uuid": f"del-{uuid}",
                "deleted": True,
                "content": {"title": "DELETED", "noteType": "plain-text",
                            "text": "gone"},
            }))
        refs.setdefault(doc_id % 5, []).append(uuid)
    for bucket, uuids in sorted(refs.items()):
        items.append(json.dumps({
            "content_type": "Tag",
            "uuid": f"tag-{bucket}",
            "content": {"title": f"t{bucket}",
                        "references": [{"uuid": u} for u in uuids]},
        }))
    return pa.table({"item": pa.array(items, pa.string())})


def _tag_pairs(batch: pa.Table) -> pa.Table:
    uuids: list[str] = []
    tags: list[str] = []
    for raw in batch["item"].to_pylist():
        item = json.loads(raw)
        if item["content_type"] != "Tag" or item.get("deleted", False):
            continue
        title = item["content"]["title"]
        for ref in item["content"]["references"]:
            if uuid := ref.get("uuid"):
                uuids.append(uuid)
                tags.append(title)
    return pa.table({"uuid": pa.array(uuids, pa.string()),
                     "tag": pa.array(tags, pa.string())})


def _note_rows(batch: pa.Table) -> pa.Table:
    from jimmy_ray.md.lexical import super_to_markdown

    uuids, titles, bodies, starred = [], [], [], []
    for raw in batch["item"].to_pylist():
        item = json.loads(raw)
        if item["content_type"] != "Note" or item.get("deleted", False):
            continue
        content = item["content"]
        note_type = content.get("noteType", "plain-text")
        text = content.get("text", "")
        body = super_to_markdown(text) if note_type == "super" and text else text
        uuids.append(item["uuid"])
        titles.append(content.get("title", ""))
        bodies.append(body)
        starred.append(bool(content.get("starred", False)))
    return pa.table({
        "uuid": pa.array(uuids, pa.string()),
        "title": pa.array(titles, pa.string()),
        "body": pa.array(bodies, pa.string()),
        "starred": pa.array(starred, pa.bool_()),
    })


def standard_notes_extract(sf_dir: str, num_partitions: int = 8):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    items = docs.map_batches(synth_items_batch, batch_format="pyarrow",
                             batch_size=512)
    pairs = items.map_batches(_tag_pairs, batch_format="pyarrow")

    # coarse-bucket fold: one map_groups call per hash bucket, the
    # per-uuid fold runs vectorized inside (one group per note would pay
    # Ray's per-group dispatch cost at high cardinality — see
    # jimmy_ray.functions.dedup.pair_grouped for the measured rationale)
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        # process-stable hash: rows of one uuid may be bucketed in
        # different workers, so python's randomized hash() would split them
        batch["__b"] = pd.util.hash_array(
            batch["uuid"].to_numpy(dtype=object)) % 64
        return batch

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pd.DataFrame({"uuid": pd.Series([], dtype=str),
                                 "tags": pd.Series([], dtype=str)})
        out = (
            group.groupby("uuid")["tag"]
            .apply(lambda s: ",".join(sorted(s)))
            .reset_index()
        )
        out.columns = ["uuid", "tags"]
        return out

    tag_map = (
        pairs.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )
    notes = items.map_batches(_note_rows, batch_format="pyarrow")
    joined = notes.join(tag_map, join_type="left_outer",
                        num_partitions=num_partitions, on=("uuid",))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tags = pc.fill_null(batch["tags"], "")
        star = pc.if_else(
            batch["starred"],
            pc.binary_join_element_wise(tags, "standard_notes-starred", ","),
            tags,
        )
        # a starred note with no other tags keeps just the pseudo-tag
        star = pc.if_else(
            pc.and_(batch["starred"], pc.equal(tags, "")),
            pa.array(["standard_notes-starred"] * batch.num_rows),
            star,
        )
        return pa.table({
            "uuid": batch["uuid"],
            "title": batch["title"],
            "body": batch["body"],
            "tags": star,
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def sql_standard_notes_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    super_body = (
        "'# Doc ' || {i} || chr(10) || chr(10) || '**intro **' || text || "
        "chr(10) || chr(10) || '- [x] done ' || {i} || chr(10) || "
        "'- [ ] todo ' || {i}"
    ).replace("{i}", i)
    return f"""
SELECT 'u' || {i} AS uuid,
  'Doc ' || {i} AS title,
  CASE WHEN doc_id % 4 = 0 THEN {super_body} ELSE text END AS body,
  't' || CAST(doc_id % 5 AS VARCHAR)
    || (CASE WHEN doc_id % 6 = 0 THEN ',standard_notes-starred' ELSE '' END)
    AS tags
FROM documents
"""
