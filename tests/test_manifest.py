"""Resumable partitioned sink: lineage records, resume semantics, integrity."""

import json
import os
import shutil

import pandas as pd

from jimmy_ray.state import manifest


def _tiles(sf="/root/testdata/sf0.001"):
    from jimmy_ray.pipelines import flagship

    return flagship.tile_assignments(sf)


def test_write_resume_and_integrity(ray_session, tmp_path):
    out = str(tmp_path / "tiles")
    stats = manifest.write_partitioned(_tiles(), out, n_partitions=8)
    assert stats["partitions_written"] == 8
    assert stats["partitions_skipped"] == 0
    full = manifest.read_partitioned(out).to_pandas()
    assert stats["rows_written"] == len(full)
    assert manifest.verify_manifest(out) == []

    records = manifest.read_manifest(out)
    assert len(records) == 8
    assert all(r["n_rows"] > 0 and r["checksum"] for r in records)
    assert all(r["key_min"] <= r["key_max"] for r in records)

    # simulate failure: drop two partitions (data + manifest)
    for p in (2, 5):
        shutil.rmtree(os.path.join(out, f"part={p:05d}"))
        os.remove(os.path.join(out, "_manifest", f"{p:05d}.json"))
    assert manifest.completed_partitions(out) == {0, 1, 3, 4, 6, 7}

    # resume: only the missing partitions are rewritten
    stats2 = manifest.write_partitioned(_tiles(), out, n_partitions=8)
    assert stats2["partitions_written"] == 2
    assert stats2["partitions_skipped"] == 6
    assert manifest.verify_manifest(out) == []

    resumed = manifest.read_partitioned(out).to_pandas()
    a = full.sort_values("url").reset_index(drop=True)
    b = resumed.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_partition_assignment_stable():
    # FNV-based assignment must be stable across processes/runs
    assert manifest.assign_partition("https://x/1", 16) == \
        manifest.assign_partition("https://x/1", 16)
    spread = {manifest.assign_partition(f"u{i}", 16) for i in range(200)}
    assert len(spread) == 16  # all partitions hit


def test_partial_write_is_invisible(ray_session, tmp_path):
    out = str(tmp_path / "t2")
    manifest.write_partitioned(_tiles(), out, n_partitions=4)
    # a stray tmp file (crashed writer) must not affect reads or resume
    stray = os.path.join(out, "part=00001", "data.parquet.tmp.999")
    with open(stray, "wb") as fh:
        fh.write(b"garbage")
    assert manifest.verify_manifest(out) == []
    assert len(manifest.completed_partitions(out)) == 4
    manifest.read_partitioned(out).to_pandas()  # still reads cleanly


def test_run_flagship_end_to_end_resumable(ray_session, tmp_path):
    import os
    import shutil

    from jimmy_ray.pipelines import flagship
    from jimmy_ray.state import manifest as mf

    out = str(tmp_path / "flagship")
    stats = flagship.run_flagship("/root/testdata/sf0.001", out, n_partitions=4)
    assert stats["extracted"]["partitions_written"] == 4
    assert stats["join"]["rows_written"] > 0
    assert stats["counters"]["n_pages"] == 4500
    assert stats["counters"]["n_errors"] == 0
    for product in ("extracted", "tiles", "join"):
        assert mf.verify_manifest(f"{out}/{product}") == []

    # kill one partition of one product; rerun resumes just that work
    shutil.rmtree(os.path.join(out, "join", "part=00001"))
    os.remove(os.path.join(out, "join", "_manifest", "00001.json"))
    stats2 = flagship.run_flagship("/root/testdata/sf0.001", out, n_partitions=4)
    assert stats2["extracted"]["partitions_written"] == 0
    assert stats2["join"]["partitions_written"] == 1
    assert mf.verify_manifest(f"{out}/join") == []
