"""Flagship pages pipeline: invariants (leakage, uniqueness, byte-identity),
determinism across runs, and checkpointed-run equivalence."""

from __future__ import annotations

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest

from transmog_ray.pipelines.features import (
    checkpointed_page_features,
    page_features,
)
from transmog_ray.sources.pages import write_pages
from transmog_ray.state.checkpoint import fingerprint


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    return write_pages(str(tmp_path_factory.mktemp("pages")), n_shards=2,
                       n_urls_per_shard=40)


def load(pages_dir):
    import ray.data as rd

    return rd.read_parquet(pages_dir, columns=["url", "warc_ts", "text", "lang", "meta"])


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[sorted(df.columns)]
        .sort_values(["url", "warc_ts"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_invariants_and_determinism(ray_session, pages_dir):
    a = canon(page_features(load(pages_dir), num_buckets=8).to_pandas())
    b = canon(page_features(load(pages_dir), num_buckets=16).to_pandas())

    # unique snapshots, zero leakage, features attach backward only
    assert not a.duplicated(subset=["url", "warc_ts"]).any()
    got = a.dropna(subset=["feature_ts"])
    assert (got["feature_ts"] <= got["warc_ts"]).all()

    # deterministic across runs AND across partition counts
    drop = ["meta_tags"]  # list column, compare separately
    pd.testing.assert_frame_equal(a.drop(columns=drop), b.drop(columns=drop))
    assert [list(x) if x is not None else None for x in a["meta_tags"]] == [
        list(x) if x is not None else None for x in b["meta_tags"]
    ]

    # byte-identical text per surviving (url, warc_ts)
    inp = (
        pq.read_table(glob.glob(f"{pages_dir}/*.parquet")[0])
        .to_pandas()
    )
    import pyarrow.parquet as _pq

    frames = [
        _pq.read_table(p, columns=["url", "warc_ts", "text"]).to_pandas()
        for p in sorted(glob.glob(f"{pages_dir}/*.parquet"))
    ]
    full_in = (
        pd.concat(frames)
        .sort_values(["url", "warc_ts", "text"])
        .drop_duplicates(subset=["url", "warc_ts"], keep="first")
    )
    m = full_in.merge(a[["url", "warc_ts", "text"]], on=["url", "warc_ts"],
                      suffixes=("_in", "_out"))
    assert len(m) == len(a)
    assert (m["text_in"].fillna("∅") == m["text_out"].fillna("∅")).all()


def test_checkpointed_matches_streaming(ray_session, pages_dir, tmp_path):
    import ray.data as rd

    streamed = canon(page_features(load(pages_dir), num_buckets=8).to_pandas())
    out_dir = str(tmp_path / "ckpt")
    meta = checkpointed_page_features(
        load(pages_dir), out_dir, fingerprint({"t": "v1"}), num_buckets=8
    )
    assert meta["rows_out"] == len(streamed)
    ck = canon(
        pd.concat(
            pq.read_table(p).to_pandas()
            for p in sorted(glob.glob(f"{out_dir}/part=*/data.parquet"))
        )
    )
    drop = ["meta_tags"]
    pd.testing.assert_frame_equal(
        streamed.drop(columns=drop), ck.drop(columns=drop), check_dtype=False
    )
