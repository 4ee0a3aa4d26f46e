#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR at $RAY_GRAFT_CPUS.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "pages": P, "rows_per_s": {...}}

--scaling: runs the same job in fresh subprocesses at 8 and 32 CPUs on the
same input and reports both throughputs + efficiency (the sandbox evidence
for the N→4N cluster criterion, BASELINE.md).

The pages input is synthesized once (untimed) to /tmp and re-read by every
run, so both parallelism levels stream identical parquet and the first-read
page-cache warmup is shared.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "40"))


def prepare_pages(sf_dir: str, repeat: int) -> str:
    """Synthesize the pages table once (shared across bench processes)."""
    from jimmy_ray.data import synth as _synth

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/jimmy_ray_bench/pages_{sf_tag}_x{repeat}_v{_synth.N_VARIANTS}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    from jimmy_ray.data import synth

    ds = synth.pages_dataset(sf_dir, repeat=repeat)
    # pin the output layout: downstream read parallelism is bounded by file
    # count, so the corpus must look identical no matter which parallelism
    # level happened to synthesize it first
    ds.repartition(64).write_parquet(out)
    with open(done, "w") as fh:
        fh.write("ok")
    return out


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # ReservationOpResourceAllocator reserves CPU slots per operator; on
    # 3-4-op pipelines at low CPU counts it caps every op near one
    # in-flight task (measured here: read+geocode 25.4s -> 9.6s at 4
    # CPUs, tile_assign 6.4s -> 3.7s at 16 CPUs when disabled).  These
    # stages emit tiny partial blocks, so the allocator's memory
    # protection buys nothing; disable it for BOTH scaling levels.
    ctx.op_resource_reservation_enabled = False

    from ray.data.aggregate import Count

    from jimmy_ray.stages import extract as ex
    from jimmy_ray.stages import spatial as sp
    from jimmy_ray.pipelines import flagship
    from jimmy_ray.data import synth

    pages_dir = prepare_pages(SF_DIR, REPEAT)

    # warm the page cache (untimed), and grab the page count
    n_pages = rd.read_parquet(pages_dir).count()

    # warm the worker pool (untimed): the first execution of each stage
    # pays per-worker process spawn + numpy/pandas/jimmy_ray imports;
    # production pipelines amortize this over hours, so exclude it here.
    warm = rd.read_parquet(pages_dir).map_batches(
        ex.geocode_points_batch, batch_format="pyarrow", batch_size=8192
    )
    warm.map_batches(sp.tile_count_partial_batch, batch_format="pyarrow",
                     batch_size=32768).count()
    warm.map_batches(sp.spatial_join_batch, batch_format="pyarrow",
                     batch_size=32768).count()
    rd.read_parquet(pages_dir).limit(20000).map_batches(
        ex.extract_markdown_batch, batch_format="pyarrow", batch_size=512
    ).count()

    from jimmy_ray.functions.c4 import c4_clean_page
    from jimmy_ray.html.maincontent import main_content_markdown

    def _warm_mc(batch):
        import pyarrow as _pa

        for h in batch["html"].to_pylist():
            c4_clean_page(main_content_markdown(h))
        return _pa.table({"n": _pa.array([batch.num_rows])})

    rd.read_parquet(pages_dir).limit(20000).map_batches(
        _warm_mc, batch_format="pyarrow", batch_size=512).count()

    timings: dict[str, float] = {}

    def timed(name: str, fn, reruns: int = 0):
        # reruns=1 runs the stage once untimed first: heavy upstream
        # stages (extract's 512-row DOM parses) grow the Ray worker pool
        # beyond the warmed set, and a later cheap stage would otherwise
        # pay those fresh workers' numpy/jimmy_ray import cost inside its
        # timed window (measured: tile_assign 2.8 s steady vs 7-10 s
        # first-run-after-extract at 16 CPUs).  Production amortizes
        # worker spin-up over hours, as the warm-up note above says.
        for _ in range(reruns):
            fn()
        t0 = time.perf_counter()
        result = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return result

    def pages_ds():
        return rd.read_parquet(pages_dir)

    from ray.data.aggregate import Sum

    def points_ds():
        return pages_ds().map_batches(
            ex.geocode_points_batch, batch_format="pyarrow", batch_size=32768
        )

    # q1: extraction map_batches (the jimmy-parity stage)
    timed("extract", lambda: pages_ds().map_batches(
        ex.extract_markdown_batch, batch_format="pyarrow", batch_size=512
    ).count())

    # q2: geocode + cell/tile assignment + partial-agg tile counts.
    # repartition(8) before the sort-groupby: the partials are a few
    # thousand tiny rows over ~256 blocks, and Ray launches two shuffle
    # tasks per input block (CLAUDE.md coalesce lesson; measured
    # 4.7s -> 3.4s at 16 CPUs, 9.0s -> 8.4s at 4)
    timed("tile_assign", lambda: points_ds().map_batches(
        sp.tile_count_partial_batch, batch_format="pyarrow", batch_size=32768
    ).repartition(8).groupby("tile_z10")
     .aggregate(Sum("p_n", alias_name="n_pages")).count(), reruns=1)

    # q3: broadcast cell-indexed point-in-polygon join (headline) —
    # task path with per-worker cached index (no actor pool spin-up);
    # map-side per-polygon partial counts so the exchange ships polygons,
    # not pages (un-combined, the 16.2M-row coalesce capped this stage at
    # 1.6x for 4x cores), then the same tiny-partial coalesce + groupby
    timed("spatial_join", lambda: points_ds().map_batches(
        sp.polygon_count_partial_batch, batch_format="pyarrow",
        batch_size=32768
    ).repartition(8).groupby("polygon_id")
     .aggregate(Sum("p_n", alias_name="n_pages")).count(), reruns=1)

    # q4: salted shuffle join variant (the all-to-all exchange path)
    timed("spatial_join_shuffle", lambda: sp.spatial_join_shuffle(points_ds()).count())

    # q5: kNN (bounded top-k + merge), task path
    qpoints = synth.query_points(50)
    timed("knn", lambda: sp.knn_finalize(
        points_ds().map_batches(
            sp.knn_candidates_batch, batch_format="pyarrow", batch_size=32768
        ),
        {q["qid"]: q["k"] for q in qpoints},
    ).count())

    # q6: LLM-tier exact dedup over the full pages text column — md5 per
    # row inside map_batches, bucketed partial counts, tiny groupby
    import hashlib as _hl

    import pyarrow as _pa

    def md5_partial(batch: _pa.Table) -> _pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            d = _hl.md5(t.encode()).hexdigest()
            counts[d] = counts.get(d, 0) + 1
        return _pa.table({
            "md5": _pa.array(list(counts)),
            "p_n": _pa.array(list(counts.values())),
        })

    timed("dedup_exact", lambda: pages_ds().map_batches(
        md5_partial, batch_format="pyarrow", batch_size=8192
    ).repartition(8).groupby("md5").aggregate(
        Sum("p_n", alias_name="n")
    ).count())

    # q8: zonal polygon statistics (geo aggregate tier) — times the
    # shipped plan (shared builder), not a rebuilt subset (ADVICE r3)
    from jimmy_ray.stages import geoagg

    timed("polygon_stats", lambda: geoagg.polygon_stats_from_points(
        points_ds(), batch_size=32768).count())

    # q9: density grid clustering over the full point set (shared core:
    # cell counts → core cells → adjacency join → connected components)
    timed("grid_cluster", lambda: geoagg.grid_cluster_from_points(
        points_ds(), batch_size=32768).count())

    # q7: LLM-tier quality stats over the full pages text column
    from jimmy_ray.functions import textstats as ts

    def stats_over_pages(batch: _pa.Table) -> _pa.Table:
        t = _pa.table({"doc_id": _pa.array(range(batch.num_rows),
                                           _pa.int64()),
                       "text": batch["text"]})
        return ts.text_stats_batch(t)

    timed("text_stats", lambda: pages_ds().map_batches(
        stats_over_pages, batch_format="pyarrow", batch_size=8192
    ).count())

    # q10: webtext curation chain over the real html column — main-content
    # extraction (DOM parse + link-density) then the C4 line/page rules;
    # the round-4 per-page cleaning path at corpus scale
    from jimmy_ray.functions.c4 import c4_clean_page
    from jimmy_ray.html.maincontent import main_content_markdown

    def mc_c4(batch: _pa.Table) -> _pa.Table:
        kept = 0
        for h in batch["html"].to_pylist():
            if c4_clean_page(main_content_markdown(h)) is not None:
                kept += 1
        return _pa.table({"kept": _pa.array([kept], _pa.int64())})

    timed("main_content_c4", lambda: pages_ds().map_batches(
        mc_c4, batch_format="pyarrow", batch_size=512
    ).count())

    ray.shutdown()

    headline_sec = timings["spatial_join"] + timings["tile_assign"]
    # total keeps the round-1 definition (the original five geo stages) so
    # cross-round values stay comparable; the LLM-tier stages are reported
    # alongside in `queries`/`rows_per_s`
    core = ("extract", "tile_assign", "spatial_join",
            "spatial_join_shuffle", "knn")
    total = round(sum(timings[k] for k in core), 3)
    return {
        "metric": "spatial-join + tile-assignment sec over synthesized CC-style pages",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "rows_per_s": {
            "extract": round(n_pages / timings["extract"], 1),
            "spatial_tile_headline": round(n_pages / headline_sec, 1),
            "dedup_exact": round(n_pages / timings["dedup_exact"], 1),
            "text_stats": round(n_pages / timings["text_stats"], 1),
            "main_content_c4": round(
                n_pages / timings["main_content_c4"], 1),
        },
    }


def run_scaling() -> None:
    # the N-vs-4N evidence run uses a larger corpus than the plain bench
    # so per-stage fixed costs don't mask the compute scaling being
    # measured.  On the round-5 VM class the per-stage session floor is
    # ~2-3 s (vs ~0.5 s on earlier rounds' machines), so the multiple is
    # 9x (16.2M pages): at 120 the floor alone capped the cheap geo
    # stages at ~0.5 efficiency while every compute-bound stage measured
    # 0.79-0.86 — exactly the hardware's sustained 4->16-core clock
    # ratio (BASELINE.md round-5 section).
    scaling_repeat = os.environ.get("GRAFT_SCALING_REPEAT", "360")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_REPEAT=scaling_repeat)
        # ray.init(num_cpus=N) only caps Ray task slots — pyarrow thread
        # pools and the raylet would otherwise use every core, flattering
        # the low-parallelism run.  Pin to N worker cores + 2 system
        # cores: on a real N-node vs 4N-node cluster every node carries
        # its own raylet/object-store, so system services get the same
        # per-level allowance instead of stealing worker cores.
        cmd = ["taskset", "-c", f"0-{ncpu + 1}",
               sys.executable, os.path.abspath(__file__)]
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_lo = int(os.environ.get("GRAFT_SCALING_N", "4"))
    n_hi = 4 * n_lo
    lo, hi = run(n_lo), run(n_hi)
    r_lo = lo["rows_per_s"]["spatial_tile_headline"]
    r_hi = hi["rows_per_s"]["spatial_tile_headline"]
    eff = (r_hi / r_lo) / (n_hi / n_lo)
    print(json.dumps({
        "n_cpus_lo": n_lo,
        "n_cpus_hi": n_hi,
        f"headline_rows_per_s_{n_lo}": r_lo,
        f"headline_rows_per_s_{n_hi}": r_hi,
        "scaling_efficiency": round(eff, 3),
        f"extract_rows_per_s_{n_lo}": lo["rows_per_s"]["extract"],
        f"extract_rows_per_s_{n_hi}": hi["rows_per_s"]["extract"],
        f"dedup_rows_per_s_{n_lo}": lo["rows_per_s"]["dedup_exact"],
        f"dedup_rows_per_s_{n_hi}": hi["rows_per_s"]["dedup_exact"],
        "queries_lo": lo["queries"],
        "queries_hi": hi["queries"],
        "pages": hi["pages"],
    }))


def run_resume_check(sf_dir: str | None = None, n_partitions: int = 8,
                     cpus: int = 4, work_dir: str | None = None) -> dict:
    """Kill-and-resume evidence for the manifest sinks (north rule):

    1. launch the flagship job as a subprocess and SIGKILL the whole
       process group as soon as the first partition manifests land,
    2. resume the same output directory to completion and check the
       already-complete partitions were skipped (anti-join, not redone),
    3. run fresh into a second directory and check every partition file
       is byte-identical to the resumed run (deterministic partitioning +
       in-partition sort ⇒ crash/resume never changes the output),
    4. verify every manifest checksum against its data file.
    """
    import shutil
    import signal
    import tempfile

    sf_dir = sf_dir or "/root/testdata/sf0.001"
    work_dir = work_dir or tempfile.mkdtemp(prefix="jimmy_ray_resume_")
    out_a = os.path.join(work_dir, "killed_then_resumed")
    out_b = os.path.join(work_dir, "fresh")
    job = [sys.executable, "jobs/flagship_job.py", "--sf-dir", sf_dir,
           "--partitions", str(n_partitions), "--local-cpus", str(cpus)]
    here = os.path.dirname(os.path.abspath(__file__))

    def manifests(out: str) -> int:
        from jimmy_ray.state import manifest

        return sum(len(manifest.completed_partitions(os.path.join(out, s)))
                   for s in ("extracted", "tiles", "join"))

    # 1. launch and SIGKILL mid-write
    proc = subprocess.Popen(job + ["--output", out_a], cwd=here,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        if manifests(out_a) >= 1 or proc.poll() is not None:
            break
        time.sleep(0.02)
    killed_mid_run = proc.poll() is None
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    from jimmy_ray.state import manifest

    done_at_kill = {
        s: manifest.completed_partitions(os.path.join(out_a, s))
        for s in ("extracted", "tiles", "join")
    }

    def run_to_completion(out: str) -> dict:
        res = subprocess.run(job + ["--output", out], cwd=here,
                             capture_output=True, text=True, timeout=600)
        return json.loads(res.stdout.strip().splitlines()[-1])

    # 2. resume the killed directory
    resumed = run_to_completion(out_a)
    skip_ok = all(
        resumed[s]["partitions_skipped"] == len(done_at_kill[s])
        and resumed[s]["partitions_written"]
        == n_partitions - len(done_at_kill[s])
        for s in ("extracted", "tiles", "join")
    )

    # 3. fresh run, byte-compare all partitions
    run_to_completion(out_b)
    import hashlib

    def checksums(out: str) -> dict[str, str]:
        sums = {}
        for sink in ("extracted", "tiles", "join"):
            for p in range(n_partitions):
                path = os.path.join(out, sink, f"part={p:05d}", "data.parquet")
                with open(path, "rb") as fh:
                    sums[f"{sink}/{p}"] = hashlib.md5(fh.read()).hexdigest()
        return sums

    identical = checksums(out_a) == checksums(out_b)

    # 4. manifest integrity
    problems = [
        p for s in ("extracted", "tiles", "join")
        for p in manifest.verify_manifest(os.path.join(out_a, s))
    ]
    result = {
        "killed_mid_run": killed_mid_run,
        "partitions_done_at_kill": {k: len(v) for k, v in done_at_kill.items()},
        "resume_skip_counts_ok": skip_ok,
        "byte_identical_to_fresh": identical,
        "manifest_problems": problems,
        "n_partitions": n_partitions,
    }
    if os.environ.get("GRAFT_KEEP_RESUME_DIR") != "1":
        shutil.rmtree(work_dir, ignore_errors=True)
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--resume-check" in sys.argv:
        print(json.dumps(run_resume_check()))
    else:
        print(json.dumps(run_bench()))
