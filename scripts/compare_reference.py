"""Direct single-process throughput comparison vs the reference on the
reference's own benchmark record shape (BASELINE.md fixture:
{id, name, data:{value,category,active}, tags:[2 str], items:[3 objects]}).

Both engines run single-threaded over identical records — the
"matches-or-beats single-node throughput at the same data scale"
evidence, before Ray parallelism multiplies ours.

    PYTHONPATH=/root/repo python scripts/compare_reference.py [n]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/reference/src")


def make_records(n: int) -> list[dict]:
    return [
        {
            "id": i,
            "name": f"record_{i}",
            "data": {"value": i * 1.5, "category": f"cat_{i % 7}", "active": i % 2 == 0},
            "tags": [f"tag{i % 5}", f"tag{i % 11}"],
            "items": [
                {"sku": f"s{i}-{j}", "qty": j + 1, "price": 9.99 + j} for j in range(3)
            ],
        }
        for i in range(n)
    ]


def run_ours(records, mode: str, id_generation) -> float:
    from transmog_ray.core.config import FlattenConfig
    from transmog_ray.core.flatten import Flattener

    f = Flattener(FlattenConfig(array_mode=mode, id_generation=id_generation), "bench")
    t0 = time.time()
    rows, children = f.flatten_batch(records, extract_time="T")
    dt = time.time() - t0
    assert len(rows) == len(records)
    return len(records) / dt


def run_reference(records, mode: str, id_generation) -> float:
    import transmog as ref
    from transmog.types import ArrayMode

    cfg = ref.TransmogConfig(array_mode=ArrayMode(mode), id_generation=id_generation)
    t0 = time.time()
    result = ref.flatten(records, name="bench", config=cfg)
    dt = time.time() - t0
    assert len(result.main) == len(records)
    return len(records) / dt


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    records = make_records(n)
    out = {"n": n, "configs": {}}
    for label, mode, idg in [
        ("smart+random", "smart", "random"),
        ("separate+hash", "separate", "hash"),
        ("inline", "inline", "random"),
    ]:
        ours = run_ours(records, mode, idg)
        theirs = run_reference(records, mode, idg)
        out["configs"][label] = {
            "ours_rec_s": round(ours),
            "reference_rec_s": round(theirs),
            "speedup_single_core": round(ours / theirs, 2),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
