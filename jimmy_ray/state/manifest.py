"""Resumable partitioned parquet sink with per-partition lineage records.

North rule: "every partition emits lineage records and counters so the
pipeline resumes from per-partition checkpoints after failure."

Layout:

    out_dir/
      part=00017/data.parquet       (written atomically: tmp + rename)
      _manifest/00017.json          (lineage record, written after data)

A partition is *complete* iff its manifest record exists; crashed/partial
writes leave a tmp file and no manifest, so a rerun redoes exactly the
missing partitions (``resume=True`` skips completed ones before any work
happens on them).  Partition assignment is a deterministic hash of the
key column (FNV-1a — stable across processes, unlike ``hash()``), so a
rerun reproduces identical partition contents (the reference's
determinism invariant re-keyed to stable columns, SURVEY.md §4; its
only "resume" was content-identical file skipping,
/root/reference/src/jimmy/common.py:171-185 — this generalizes it to
partition granularity).

The lineage record carries the counters the reference logs as Stats
(/root/reference/src/jimmy/common.py:408-451): row count, byte size,
content checksum, key range, plus the input fingerprint.
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _fnv64_bytes(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def assign_partition(key: str, n_partitions: int) -> int:
    return _fnv64_bytes(key.encode("utf-8")) % n_partitions


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    return {
        int(name.split(".")[0])
        for name in os.listdir(mdir)
        if name.endswith(".json")
    }


def read_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifest")
    records = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as fh:
                    records.append(json.load(fh))
    return records


def write_partitioned(ds, out_dir: str, key_column: str = "url",
                      n_partitions: int = 16, resume: bool = True) -> dict:
    """Write ``ds`` to a resumable partitioned layout; returns run stats.

    One groupby(part) exchange; each group writes its own partition file
    atomically and emits a lineage record.  On resume, completed
    partitions are filtered out *before* the shuffle, so finished work is
    skipped entirely (anti-join against the manifest).
    """
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    done = completed_partitions(out_dir) if resume else set()

    def add_part(batch: pa.Table) -> pa.Table:
        parts = [assign_partition(k, n_partitions)
                 for k in batch[key_column].to_pylist()]
        batch = batch.append_column("__part", pa.array(parts, pa.int64()))
        if done:
            keep = [p not in done for p in parts]
            batch = batch.filter(pa.array(keep))
        return batch

    keyed = ds.map_batches(add_part, batch_format="pyarrow")

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["__part"].iloc[0])
        g = group.drop(columns="__part").sort_values(key_column, kind="mergesort")
        part_dir = os.path.join(out_dir, f"part={part:05d}")
        os.makedirs(part_dir, exist_ok=True)
        final = os.path.join(part_dir, "data.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        table = pa.Table.from_pandas(g.reset_index(drop=True), preserve_index=False)
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic publish
        with open(final, "rb") as fh:
            content = fh.read()
        record = {
            "partition": part,
            "n_rows": int(len(g)),
            "n_bytes": len(content),
            "checksum": hashlib.md5(content).hexdigest(),
            "key_min": str(g[key_column].iloc[0]),
            "key_max": str(g[key_column].iloc[-1]),
            "key_column": key_column,
        }
        mtmp = os.path.join(out_dir, "_manifest", f"{part:05d}.json.tmp.{os.getpid()}")
        mfinal = os.path.join(out_dir, "_manifest", f"{part:05d}.json")
        with open(mtmp, "w") as fh:
            json.dump(record, fh)
        os.replace(mtmp, mfinal)  # manifest publish marks completion
        return pd.DataFrame([record])

    stats = keyed.groupby("__part").map_groups(
        write_group, batch_format="pandas"
    ).to_pandas()

    return {
        "partitions_written": int(len(stats)),
        "partitions_skipped": len(done),
        "rows_written": int(stats["n_rows"].sum()) if len(stats) else 0,
    }


def read_partitioned(out_dir: str):
    """Read back only manifest-complete partitions."""
    import ray.data as rd

    paths = [
        os.path.join(out_dir, f"part={p:05d}", "data.parquet")
        for p in sorted(completed_partitions(out_dir))
    ]
    return rd.read_parquet(paths)


def verify_manifest(out_dir: str) -> list[str]:
    """Integrity check: every manifest record's checksum matches its file."""
    problems = []
    for rec in read_manifest(out_dir):
        path = os.path.join(out_dir, f"part={rec['partition']:05d}", "data.parquet")
        if not os.path.exists(path):
            problems.append(f"partition {rec['partition']}: data file missing")
            continue
        with open(path, "rb") as fh:
            digest = hashlib.md5(fh.read()).hexdigest()
        if digest != rec["checksum"]:
            problems.append(f"partition {rec['partition']}: checksum mismatch")
    return problems
