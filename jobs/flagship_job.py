#!/usr/bin/env python
"""Cluster entrypoint for the flagship pipeline (the north rule's
``ray job submit`` path).

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/flagship_job.py \
        --sf-dir s3://bucket/pages-parquet --output s3://bucket/out

The job connects to the running cluster (``address="auto"``), streams the
full lifecycle — extract → geocode → cell index → spatial join → tiles —
through the resumable manifest sinks (jimmy_ray.state.manifest:
partition-granular resume, per-partition lineage rows + counters), and
prints the run's counters as one JSON line.  Re-submitting after a
failure skips finished partitions via the manifest anti-join.

In this sandbox the same entrypoint runs single-node
(``--local-cpus N`` falls back to a local session); the two-cluster-size
scaling evidence lives in ``bench.py --scaling`` (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sf-dir", required=True,
                        help="input directory with documents.parquet")
    parser.add_argument("--output", required=True,
                        help="output root for the manifest sinks")
    parser.add_argument("--partitions", type=int, default=64,
                        help="output partition count (resume granularity)")
    parser.add_argument("--no-resume", action="store_true",
                        help="ignore existing manifests and rewrite")
    parser.add_argument("--local-cpus", type=int, default=None,
                        help="run a local session instead of address=auto")
    args = parser.parse_args()

    import ray

    if args.local_cpus is not None:
        ray.init(address="local", num_cpus=args.local_cpus,
                 include_dashboard=False)
    elif not ray.is_initialized():
        ray.init(address="auto")

    from ray.data import DataContext

    # per-op CPU reservation starves short pipelines (see bench.py)
    DataContext.get_current().op_resource_reservation_enabled = False

    from jimmy_ray.pipelines import flagship

    stats = flagship.run_flagship(
        args.sf_dir, args.output,
        n_partitions=args.partitions, resume=not args.no_resume,
    )
    print(json.dumps(stats, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
