"""CLI surface (subprocess, the real entry point) + winnowing guarantees."""

import json
import subprocess
import sys

import numpy as np
import pytest

from jimmy_ray.functions.textstats import WINNOW_K, WINNOW_W, winnow_fingerprints


def test_winnow_shared_substring_guarantee():
    a = "the quick brown fox jumps over the lazy dog while rain falls"
    b = "unrelated prefix words here the quick brown fox jumps over the lazy dog"
    fa = set(winnow_fingerprints(a))
    fb = set(winnow_fingerprints(b))
    # shared substring length far exceeds w + k - 1 -> overlap guaranteed
    assert fa & fb
    c = "zzqx vvkm ppgg bbnn zzzz qqqq vvvv kkkk mmmm xxxx yyyy wwww"
    assert not (fa & set(winnow_fingerprints(c)))


def test_winnow_deterministic_and_normalized():
    assert winnow_fingerprints("A  B   c") == winnow_fingerprints("a b C")
    assert winnow_fingerprints("ab") == []  # shorter than k
    long = "x" * 100
    assert winnow_fingerprints(long)  # degenerate repeats still fingerprint


def test_winnow_density():
    # winnowing picks ~2/(w+1) of positions; sanity band
    text = " ".join(f"w{i}" for i in range(200))
    n_grams = len(" ".join(text.split())) - WINNOW_K + 1
    fps = winnow_fingerprints(text)
    assert 0 < len(fps) < n_grams


def test_cli_end_to_end(tmp_path):
    out = tmp_path / "cli_out"
    cmd = [
        sys.executable, "-m", "jimmy_ray.cli",
        "--sf-dir", "/root/testdata/sf0.001",
        "--output", str(out),
        "--stage", "geocode_points",
        "--stage", "tile_assign",
        "--partitions", "4",
        "--num-cpus", "4",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo",
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["partitions_written"] == 4
    assert stats["rows_written"] > 0
    # resume run in a second process: everything skipped
    proc2 = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo",
                           timeout=300)
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    stats2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert stats2["partitions_written"] == 0
    assert stats2["partitions_skipped"] == 4


def test_cli_list_stages():
    proc = subprocess.run(
        [sys.executable, "-m", "jimmy_ray.cli", "--list-stages",
         "--sf-dir", "x", "--output", "y"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert proc.returncode == 0
    assert "extract_markdown" in proc.stdout


def test_cli_no_stages_error():
    proc = subprocess.run(
        [sys.executable, "-m", "jimmy_ray.cli",
         "--sf-dir", "x", "--output", "y"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert proc.returncode == 2
    assert "no stages" in proc.stderr
