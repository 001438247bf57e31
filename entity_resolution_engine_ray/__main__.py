"""``ray job submit``-able CLI for the flagship pages-ER pipeline.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m entity_resolution_engine_ray \
        --pages s3://bucket/pages/ --out s3://bucket/er_run_42 \
        --num-partitions 4096

The job driver connects to the cluster Ray was started with (``ray job
submit`` sets RAY_ADDRESS; locally it falls back to a fresh local session),
streams the pipeline (every stage checkpoints to ``--out`` so a killed job
resumes from the last completed stage), and prints one JSON line of
run metrics — the same shape bench.py and the checkpoint manifests use.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="entity_resolution_engine_ray")
    ap.add_argument("--pages", required=True, help="pages table path (dir or file)")
    ap.add_argument("--out", required=True, help="checkpoint/output directory")
    ap.add_argument(
        "--format", default="parquet", choices=["parquet", "jsonl", "csv"],
        help="pages input format",
    )
    ap.add_argument(
        "--num-partitions", type=int, default=None,
        help="shuffle partition count (default: scales with cluster CPUs)",
    )
    ap.add_argument(
        "--no-resume", action="store_true",
        help="ignore existing checkpoints instead of resuming",
    )
    ap.add_argument(
        "--validate-gray-zone", action="store_true",
        help="run the gray-zone validation actor pool (LLM client if configured)",
    )
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; standalone
        # this starts a local session. Never called when a driver (tests,
        # __ray_entry__) already owns the session.
        ray.init(include_dashboard=False)

    from entity_resolution_engine_ray.pipelines.pages_er import PagesERConfig, run_pages_er

    cfg = PagesERConfig()
    if args.validate_gray_zone:
        cfg = PagesERConfig(enable_llm_validation=True)
    result = run_pages_er(
        args.pages,
        args.out,
        cfg=cfg,
        resume=not args.no_resume,
        num_partitions=args.num_partitions,
        pages_format=args.format,
    )
    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
