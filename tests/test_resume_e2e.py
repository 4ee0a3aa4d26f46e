"""End-to-end kill-and-resume on the flagship pipeline (VERDICT r3 #6).

Launches jobs/flagship_job.py as a real subprocess, SIGKILLs the whole
process group once the first partition manifests land, resumes the same
output directory, and asserts (a) completed partitions were skipped via
the manifest anti-join — not redone, (b) the resumed output is
byte-identical to an uninterrupted fresh run (deterministic FNV
partitioning + in-partition sort), (c) every manifest checksum matches
its data file.  This is the north rule's per-partition checkpoint
evidence, exercised through a real crash rather than unit-level resume
flags (tests/test_manifest.py covers those).

The subprocesses own their Ray sessions; this test needs no fixture.
"""


def test_kill_and_resume_flagship_is_lossless():
    import bench

    res = bench.run_resume_check()
    assert res["killed_mid_run"], "job finished before the kill landed"
    assert sum(res["partitions_done_at_kill"].values()) >= 1
    assert res["resume_skip_counts_ok"]
    assert res["byte_identical_to_fresh"]
    assert res["manifest_problems"] == []
