"""Scale-shape tests for the raw-task bucket exchange: the tree reduce
must bound per-task fan-in at ANY shard count (VERDICT r2 item 1 — at
10^5 shards a flat reduce would take 10^5 arguments)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_tree_concat_bounds_fanin_at_1000_shards(ray_session):
    """1,000 tiny shard refs → ≤ max_fanin refs into the final reduce,
    with the concatenated content identical to a flat concat."""
    import pyarrow as pa
    import ray

    from transmog_ray.stages.partition import _tree_concat

    shards = [
        pa.table({"k": pa.array([i], pa.int64())}) for i in range(1000)
    ]
    refs = [ray.put(t) for t in shards]
    out_refs = _tree_concat(list(refs), max_fanin=8)
    # the bound the reduce task relies on:
    assert len(out_refs) <= 8
    merged = pa.concat_tables(
        [t for t in ray.get(out_refs) if t.num_rows]
    )
    assert sorted(merged["k"].to_pylist()) == list(range(1000))


def test_tree_concat_all_empty_keeps_schema(ray_session):
    import pyarrow as pa
    import ray

    from transmog_ray.stages.partition import _tree_concat

    schemaless = pa.table({})
    typed = pa.table({"k": pa.array([], pa.int64())})
    refs = [ray.put(schemaless)] * 5 + [ray.put(typed)] + [ray.put(schemaless)] * 4
    out_refs = _tree_concat(refs, max_fanin=4)
    tables = ray.get(out_refs)
    # the schema-bearing empty survives the tree
    assert any(t.num_columns == 1 for t in tables)


def test_bucket_exchange_1000_blocks_matches_local(ray_session):
    """End-to-end: 1,000 upstream blocks through the exchange with a tiny
    fan-in cap — result equals the single-process computation."""
    import ray.data as rd

    from transmog_ray.stages.partition import bucket_exchange

    n = 3000
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64) % 97,
        "v": np.arange(n, dtype=np.float64),
    })
    ds = rd.from_pandas(df, override_num_blocks=1000)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("k", sort=False)["v"].sum().rename("s").reset_index()
        )

    out = bucket_exchange(ds, ["k"], agg, num_buckets=4, max_fanin=8).to_pandas()
    expect = df.groupby("k")["v"].sum().rename("s").reset_index()
    got = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, expect.sort_values("k").reset_index(drop=True), check_dtype=False
    )


def test_fused_flagship_empty_files(ray_session):
    """ADVICE r2: an empty pages_files list must not launch zero-part
    reduce tasks (IndexError) — it returns an empty dataset."""
    from transmog_ray.pipelines.features import page_features_pushdown_fused

    out = page_features_pushdown_fused([])
    assert out.count() == 0


def test_checkpoint_empty_upstream_stats(ray_session, tmp_path):
    """ADVICE r2: fully-empty upstream + no completed manifests must not
    KeyError on the stats columns in run_meta aggregation."""
    import ray.data as rd

    from transmog_ray.state.checkpoint import checkpointed_sorted_run

    ds = rd.from_items([])
    meta = checkpointed_sorted_run(
        ds, ["k"], "ts", lambda df: df, str(tmp_path / "out"), "fp0",
        num_buckets=4, exchange="tasks",
    )
    assert meta["rows_in"] == 0 and meta["rows_out"] == 0
