"""Flagship pipeline as a ``ray job submit`` entry point.

On a real cluster (north_rule: fixed-size multi-node, N and 4N nodes):

    ray job submit --working-dir /root/repo -- \
        python scripts/run_job.py --pages <parquet_dir> --out <dir>

In this sandbox there is no cluster: the script falls back to a local
session (``RAY_ADDRESS=local`` is preset) so the exact same entry point
is testable end-to-end. The run is checkpointed per partition — rerun
with the same --out and it resumes, skipping completed partitions.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None,
                    help="pages parquet dir (default: synthesize under /tmp)")
    ap.add_argument("--out", required=True, help="checkpointed output dir")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--shards", type=int, default=8,
                    help="synthetic shards when --pages is omitted")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from transmog_ray.runtime import configure_context

    configure_context()
    import ray.data as rd

    from transmog_ray.pipelines.features import checkpointed_page_features
    from transmog_ray.sources.pages import write_pages
    from transmog_ray.state.checkpoint import fingerprint, input_lineage

    pages_dir = args.pages or write_pages(
        "/tmp/transmog_ray_pages/job", n_shards=args.shards
    )
    files = sorted(glob.glob(f"{pages_dir}/*.parquet"))
    run_fp = fingerprint({
        "inputs": input_lineage(files),
        "num_buckets": args.num_buckets,
        "pipeline": "page_features/v1",
    })
    ds = rd.read_parquet(pages_dir, columns=["url", "warc_ts", "text", "lang", "meta"])
    t0 = time.time()
    meta = checkpointed_page_features(
        ds, args.out, run_fp, num_buckets=args.num_buckets
    )
    meta["wall_seconds"] = round(time.time() - t0, 2)
    meta["pages_per_sec"] = round(meta["rows_out"] / meta["wall_seconds"], 1)
    print(json.dumps(meta))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
