"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "pages_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes
(num_cpus=8 and 32) on the same input and reports both throughputs plus
scaling efficiency (the sandbox stand-in for N vs 4N nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline set: flagship pages pipeline + one per operator family
BENCH_QUERIES = [
    "pages_features",
    "flatten_events",
    "asof_purchase",
    "lag_lead_events",
    "sessionize_events",
    "rolling_events",
    "pricing_summary",
    "revenue_by_nation",
    "dedup_user_type",
    "minhash_dedup",
    "ann_topk",
    "token_stats",
]


def consume(result) -> int:
    """Materialize a result enough to count rows (stream-friendly)."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    return result.count()


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as e

    qs = e.queries()
    # warm the page cache + synthetic pages fixture outside the timed region
    from transmog_ray.pipelines.queries import read_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        read_table(SF_DIR, t).count()
    rows_by_q: dict[str, int] = {}
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        if name == "pages_features":
            fn(SF_DIR)  # first call generates + caches the synthetic pages
        t0 = time.time()
        rows_by_q[name] = consume(fn(SF_DIR))
        times[name] = round(time.time() - t0, 3)
    total = round(sum(times.values()), 3)
    pages_sec = (
        round(rows_by_q["pages_features"] / times["pages_features"], 1)
        if times.get("pages_features") else None
    )
    out = {
        "metric": "headline pipeline suite wall-time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages_per_sec": pages_sec,
        "rows": rows_by_q,
    }
    ray.shutdown()
    return out


def run_flagship_only() -> dict:
    """Flagship pages pipeline on the SCALING fixture (bigger than the
    per-round suite fixture so 32 CPUs have real work — the north-rule
    metric is pages/sec of this pipeline, not the tiny-query suite)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from transmog_ray.runtime import configure_context

    configure_context()
    import ray.data as rd

    from transmog_ray.pipelines.features import page_features_pushdown
    from transmog_ray.sources.pages import write_pages

    shards = int(os.environ.get("GRAFT_SCALING_SHARDS", "192"))
    urls = int(os.environ.get("GRAFT_SCALING_URLS", "1500"))
    # shard count in the path: a directory is read whole, so reusing one
    # dir across different fixture sizes would silently mix them
    pages_dir = write_pages(
        f"/tmp/transmog_ray_pages/scaling-{shards}x{urls}",
        n_shards=shards, n_urls_per_shard=urls,
    )

    def run_once() -> tuple[int, float]:
        ds = rd.read_parquet(
            pages_dir, columns=["url", "warc_ts", "text", "lang", "meta"],
            # measured sweet spot on this box: ~2 blocks per cpu for the
            # flatten stage, ~32 shuffle buckets (more buckets inflate
            # sort-coordination; fewer leave hot-domain stragglers)
            override_num_blocks=max(32, 2 * NUM_CPUS),
        )
        t0 = time.time()
        n = page_features_pushdown(ds, num_buckets=32).count()
        return n, time.time() - t0

    run_once()  # warm page cache + workers, untimed
    n, dt1 = run_once()
    _, dt2 = run_once()
    dt = min(dt1, dt2)  # best-of-2: object-store/OS noise is one-sided
    ray.shutdown()
    return {"rows": n, "sec": round(dt, 3),
            "pages_per_sec": round(n / dt, 1), "num_cpus": NUM_CPUS}


def run_scaling() -> dict:
    """Each level runs in FRESH processes (the driver-contract stand-in
    for separate cluster sizes), best-of-2 processes per level with a
    settle gap — back-to-back Ray sessions interfere (teardown of the
    previous raylet overlaps the next session's timed region)."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flagship"],
            env=env, capture_output=True, text=True, check=True,
        )
        time.sleep(8)  # let the session tear down fully
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def best(ncpu: int) -> dict:
        a, b = one(ncpu), one(ncpu)
        return a if a["sec"] <= b["sec"] else b

    lo, hi = 8, 32
    r_lo, r_hi = best(lo), best(hi)
    eff = (r_hi["pages_per_sec"] / r_lo["pages_per_sec"]) / (hi / lo)
    return {
        "metric": "flagship pages/sec scaling (num_cpus 8 -> 32, same input)",
        "rows": r_lo["rows"],
        "sec_8": r_lo["sec"],
        "sec_32": r_hi["sec"],
        "pages_per_sec_8": r_lo["pages_per_sec"],
        "pages_per_sec_32": r_hi["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--flagship" in sys.argv:
        print(json.dumps(run_flagship_only()))
    else:
        print(json.dumps(run_bench()))
