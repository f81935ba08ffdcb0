"""spark-submit entry for the flagship ETL (SURVEY.md §2.L4).

BASELINE.json:6,14 — "launched via spark-submit --py-files on
multi-executor clusters".  Usage:

    python -m jobs.build_zip                       # build engine.zip
    spark-submit --py-files engine.zip jobs/pipeline.py \
        --root /tmp/geotile_run --n 200000 [--resume] [--level 8] [--z 12]

On a real cluster no code change is needed: the same script runs with
`--master yarn/k8s` and the icelite root on a shared filesystem.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="icelite pipeline root dir")
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--level", type=int, default=8)
    ap.add_argument("--z", type=int, default=12)
    ap.add_argument("--parts", type=int, default=None)
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    ap.add_argument("--fail-after", default=None)
    args = ap.parse_args(argv)

    from engine.session import get_spark
    from engine.flagship import flagship_config, flagship_stages, DEFAULT_BBOX
    from engine.geo.layer import PolygonLayer
    from engine.pipeline import run_pipeline, stage_output

    spark = get_spark(app="geotile-pipeline")
    layer = PolygonLayer.from_json()
    stages = flagship_stages(layer, args.n, seed=args.seed, level=args.level,
                             z=args.z, parts=args.parts)
    cfg = flagship_config(args.n, args.seed, DEFAULT_BBOX, args.level, args.z)
    res = run_pipeline(spark, stages, args.root, cfg, resume=args.resume,
                       fail_after=args.fail_after)
    counts = stage_output(spark, args.root, "tile_counts").count()
    print(json.dumps({
        "run_id": res.run_id, "executed": res.executed,
        "resumed": res.resumed, "tile_count_rows": counts,
    }))


if __name__ == "__main__":
    main()
