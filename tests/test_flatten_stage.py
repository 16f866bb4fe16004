"""Ray flatten stage: schema plan, tagged multi-table output, passthrough
byte-identity, determinism across runs."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from transmog_ray.core.config import FlattenConfig
from transmog_ray.sources.pages import write_pages, generate_pages_shard
from transmog_ray.stages.flatten import (
    FlattenSpec,
    FlattenStage,
    compile_plan,
    flatten_dataset,
    plan_from_dataset,
    split_tagged,
)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("pages")
    return write_pages(str(out), n_shards=2, n_urls_per_shard=40)


@pytest.fixture(scope="module")
def spec():
    return FlattenSpec(
        entity="pages",
        config=FlattenConfig(id_generation=("url", "warc_ts")),
        json_col="meta",
        record_cols=("url", "warc_ts"),
        passthrough=("url", "warc_ts", "html", "text", "lang"),
        extract_time="2026-01-01 00:00:00.000000",
    )


def read_all(pages_dir) -> pa.Table:
    return pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(f"{pages_dir}/*.parquet"))
    )


def test_generator_deterministic():
    a = generate_pages_shard(3, 20, seed=7)
    b = generate_pages_shard(3, 20, seed=7)
    assert a.equals(b)
    c = generate_pages_shard(4, 20, seed=7)
    assert not a.equals(c)


def test_plan_discovers_child_tables(pages_dir, spec):
    plan = compile_plan(read_all(pages_dir), spec)
    assert set(plan.child_names) == {"pages_meta_links", "pages_meta_scripts"}
    assert "meta_title" in plan.main_flat_schema.names
    assert "_id" in plan.main_flat_schema.names


def test_stage_main_rowcount_and_passthrough(pages_dir, spec):
    tbl = read_all(pages_dir)
    plan = compile_plan(tbl, spec)
    out = FlattenStage(plan, emit="main")(tbl)
    assert out.num_rows == tbl.num_rows  # url/warc_ts always present → no drops
    # byte-identity: text and html ride the batch untouched
    assert out["text"].combine_chunks().equals(tbl["text"].combine_chunks())
    assert out["html"].combine_chunks().equals(tbl["html"].combine_chunks())
    # deterministic composite ids: rerun → same ids
    out2 = FlattenStage(plan, emit="main")(tbl)
    assert out["_id"].equals(out2["_id"])


def test_stage_child_parent_linkage(pages_dir, spec):
    tbl = read_all(pages_dir)
    plan = compile_plan(tbl, spec)
    main = FlattenStage(plan, emit="main")(tbl)
    links = FlattenStage(plan, emit="pages_meta_links")(tbl)
    main_ids = set(main["_id"].to_pylist())
    parent_ids = set(links["_parent_id"].to_pylist())
    assert parent_ids <= main_ids
    assert links.num_rows > 0


def test_tagged_union_splits(ray_session, pages_dir, spec):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir)
    tagged, plan = flatten_dataset(ds, spec, emit="tagged")
    tables = {k: v.to_pandas() for k, v in split_tagged(tagged, plan).items()}
    n_input = read_all(pages_dir).num_rows
    assert len(tables["pages"]) == n_input
    assert set(tables) == {"pages", "pages_meta_links", "pages_meta_scripts"}
    # child columns match frozen plan schemas
    assert list(tables["pages_meta_links"].columns) == list(
        plan.child_schemas["pages_meta_links"].names
    )


def test_stage_empty_batch(pages_dir, spec):
    tbl = read_all(pages_dir)
    plan = compile_plan(tbl, spec)
    empty = tbl.slice(0, 0)
    out = FlattenStage(plan, emit="main")(empty)
    assert out.num_rows == 0
    tag = FlattenStage(plan, emit="tagged")(empty)
    assert tag.num_rows == 0


def test_conform_fills_missing_columns(spec):
    # a batch whose meta lacks keys seen at plan time → null-filled columns
    base = generate_pages_shard(0, 30)
    plan = compile_plan(base, spec)
    minimal = pa.table(
        {
            "url": ["https://x/1"],
            "warc_ts": pa.array([1_600_000_000_000_000], pa.timestamp("us")),
            "html": pa.array([b"<html/>"], pa.binary()),
            "text": ["t"],
            "lang": ["en"],
            "meta": ['{"headers": {"content_type": "text/html", "server": "nginx"}}'],
        }
    )
    out = FlattenStage(plan, emit="main")(minimal)
    assert out.num_rows == 1
    assert out["meta_title"][0].as_py() is None


def test_actor_pool_flatten(ray_session, pages_dir, spec):
    """Explicit concurrency → true actor pool (compiled plan in actor
    state); results identical to the stateless-task path."""
    import ray.data as rd

    ds = rd.read_parquet(pages_dir)
    stateless, plan = flatten_dataset(ds, spec, emit="main")
    pooled, _ = flatten_dataset(ds, spec, plan=plan, emit="main", concurrency=2)
    a = stateless.to_pandas().sort_values(["url", "warc_ts", "text"]).reset_index(drop=True)
    b = pooled.to_pandas().sort_values(["url", "warc_ts", "text"]).reset_index(drop=True)
    assert a["_id"].equals(b["_id"])
    assert len(a) == len(b) == ds.count()
