"""Zero-communication scaling ceiling of this machine.

Runs the flatten kernel (the flagship's dominant CPU cost) in N fully
independent processes — no Ray, no object store, no shared state — and
reports aggregate throughput per level. Whatever efficiency THIS loses
between two levels is a property of the box (host contention, memory
bandwidth, scheduler), not of any engine: no distributed design can
scale embarrassingly parallel work better than embarrassingly parallel
processes. Scaling numbers for the engine should be read against this
ceiling.

Usage: python scripts/measure_cpu_ceiling.py [levels...]   (default 8 32)
Prints one JSON line; also importable (``measure(levels)``).
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Process, Queue

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHARD_DIR = os.environ.get(
    "GRAFT_CEILING_FIXTURE", "/tmp/transmog_ray_pages/ceiling-4x400"
)
COLS = ["url", "warc_ts", "text", "lang", "meta"]


def _ensure_fixture() -> str:
    sys.path.insert(0, REPO)
    from transmog_ray.sources.pages import write_pages

    write_pages(SHARD_DIR, n_shards=4, n_urls_per_shard=400)
    return os.path.join(SHARD_DIR, "pages-00000.parquet")


def _worker(q: Queue, shard: str, dur: float) -> None:
    sys.path.insert(0, REPO)
    import pyarrow.parquet as pq

    from transmog_ray.pipelines.features import PAGE_SPEC_PUSHDOWN
    from transmog_ray.stages.flatten import FlattenStage, compile_plan

    block = pq.read_table(shard, columns=COLS)
    plan = compile_plan(block.slice(0, 2000), PAGE_SPEC_PUSHDOWN)
    stage = FlattenStage(plan, emit="main")
    stage(block)  # warm
    n = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        stage(block)
        n += block.num_rows
    q.put(n / (time.time() - t0))


def measure(levels=(8, 32), dur: float = 6.0) -> dict:
    shard = _ensure_fixture()
    agg = {}
    for nproc in levels:
        q: Queue = Queue()
        ps = [Process(target=_worker, args=(q, shard, dur)) for _ in range(nproc)]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        agg[nproc] = round(sum(rates))
    out = {"agg_rows_per_s": agg,
           "per_proc": {n: round(v / n) for n, v in agg.items()}}
    levels = sorted(agg)
    for lo, hi in zip(levels, levels[1:]):
        out[f"ceiling_eff_{lo}_to_{hi}"] = round(
            (agg[hi] / agg[lo]) / (hi / lo), 3
        )
    return out


if __name__ == "__main__":
    lv = tuple(int(x) for x in sys.argv[1:]) or (8, 32)
    print(json.dumps(measure(lv)))
