"""CLI: flatten nested JSON/JSONL files to tabular output.

    python -m transmog_ray INPUT OUTPUT_DIR [--name rec] [--format parquet]
        [--array-mode smart] [--id hash|random|natural|f1,f2] [--ray]

``--ray`` streams JSONL through the Ray Dataset pipeline (parallel,
constant memory); default is the pure-Python streaming path (no Ray
session needed).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="transmog_ray", description=__doc__)
    ap.add_argument("input", help="JSON/JSONL file (or .json5/.hjson with extras)")
    ap.add_argument("output", help="output directory")
    ap.add_argument("--name", default="record", help="entity/table name")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "csv", "json", "orc"])
    ap.add_argument("--array-mode", default="smart",
                    choices=["smart", "separate", "inline", "skip"])
    ap.add_argument("--id", default="hash",
                    help="hash | random | natural | comma-separated field list")
    ap.add_argument("--include-nulls", action="store_true")
    ap.add_argument("--stringify", action="store_true")
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--ray", action="store_true",
                    help="run as a Ray Dataset pipeline (JSONL input)")
    args = ap.parse_args(argv)

    from .core.config import FlattenConfig

    if args.id in ("hash", "random", "natural"):
        id_gen = args.id
    elif "," in args.id:
        id_gen = tuple(f for f in args.id.split(",") if f)
    else:
        ap.error(
            f"--id must be hash/random/natural or a comma-separated field "
            f"list (got {args.id!r}; a single field is 'field,' )"
        )
    config = FlattenConfig(
        array_mode=args.array_mode,
        id_generation=id_gen,
        include_nulls=args.include_nulls,
        stringify_values=args.stringify,
    )

    if args.ray:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        from .runtime import configure_context
        from .stages.flatten import flatten_json_file

        configure_context()
        out = flatten_json_file(args.input, args.output, entity=args.name,
                                config=config)
        print(json.dumps({"tables": out}))
        ray.shutdown()
    else:
        from .api import flatten_stream

        files = flatten_stream(
            args.input, args.output, name=args.name,
            output_format=args.format, config=config,
            batch_size=args.batch_size,
        )
        print(json.dumps({"files": [str(f) for f in files]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
