"""CLI entry point (SURVEY.md §3.1 — the run_conversion analogue).

The reference's CLI builds a Config and runs the 5-phase conversion
(/root/reference/src/jimmy/jimmy_cli.py:53-200, main.py:112-188).  Here
the same lifecycle is: read pages → compile a plain-data pipeline spec →
resumable partitioned sink with lineage manifest.

    python -m jimmy_ray.cli --sf-dir /root/testdata/sf0.001 \
        --output /tmp/out \
        --stage geocode_points --stage tile_assign

Owns its Ray session (guarded: the driver contract in __ray_entry__.py
never calls ray.init; scripts do).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="jimmy_ray")
    parser.add_argument("--sf-dir", required=True,
                        help="directory with documents.parquet etc.")
    parser.add_argument("--output", required=True,
                        help="output directory (resumable partitioned parquet)")
    parser.add_argument("--stage", action="append", default=[],
                        help="stage name from the registry (repeatable); "
                             "JSON object for parameterized stages")
    parser.add_argument("--pipeline-json", default=None,
                        help="path to a JSON pipeline spec (overrides --stage)")
    parser.add_argument("--key-column", default="url")
    parser.add_argument("--partitions", type=int, default=16)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--num-cpus", type=int, default=None)
    parser.add_argument("--list-stages", action="store_true")
    return parser


def parse_spec(args) -> list[dict]:
    if args.pipeline_json:
        with open(args.pipeline_json) as fh:
            return json.load(fh)
    spec = []
    for item in args.stage:
        if item.strip().startswith("{"):
            spec.append(json.loads(item))
        else:
            spec.append({"stage": item})
    return spec


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from jimmy_ray import api

    if args.list_stages:
        for name in sorted(api.STAGE_REGISTRY):
            print(name)
        return 0

    spec = parse_spec(args)
    if not spec:
        print("error: no stages given (use --stage or --pipeline-json)",
              file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        # per-op CPU reservation starves short pipelines (see bench.py)
        DataContext.get_current().op_resource_reservation_enabled = False

        from jimmy_ray.data import synth
        from jimmy_ray.state import manifest

        pages = synth.pages_dataset(args.sf_dir)
        result = api.compile_pipeline(pages, spec)
        stats = manifest.write_partitioned(
            result, args.output, key_column=args.key_column,
            n_partitions=args.partitions, resume=not args.no_resume,
        )
        print(json.dumps(stats))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
