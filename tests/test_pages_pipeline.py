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


def test_tagged_matches_pushdown_with_dup_links(ray_session, tmp_path):
    """The tagged and pushdown flagship paths must agree feature-for-feature
    — including on a record with REPEATED IDENTICAL links (counted once per
    occurrence, like the per-record pushdown aggregates) and on duplicate /
    tie rows sharing (url, warc_ts)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data as rd

    from transmog_ray.pipelines.features import page_features, page_features_pushdown

    def meta(links):
        return json.dumps({"title": "t", "headers": {"content_type": "x",
                                                     "server": "nginx"},
                           "tags": [], "links": links})

    dup_link = {"href": "u/a", "rel": "follow", "depth": 2.0}
    rows = {
        "url": ["https://a/p/1"] * 4 + ["https://a/p/2"],
        "warc_ts": [1_000_000_000_000_000, 1_000_000_000_000_000,
                    1_000_086_400_000_000, 1_000_086_400_000_000,
                    1_000_000_000_000_000],
        "html": [None] * 5,
        "text": ["s0", "s0-tie", "s1", "s1", "other"],
        "lang": ["en"] * 5,
        "meta": [
            meta([dup_link, dup_link, {"href": "u/b", "rel": "x", "depth": 4.0}]),
            meta([{"href": "u/c", "rel": "x", "depth": 1.0}]),  # tie loser
            meta([{"href": "u/d", "rel": "x", "depth": 3.0}]),  # exact dup pair
            meta([{"href": "u/d", "rel": "x", "depth": 3.0}]),
            meta([]),
        ],
    }
    t = pa.table({
        "url": pa.array(rows["url"]),
        "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
        "html": pa.array(rows["html"], pa.binary()),
        "text": pa.array(rows["text"]),
        "lang": pa.array(rows["lang"]),
        "meta": pa.array(rows["meta"]),
    })
    p = str(tmp_path / "pages-00000.parquet")
    pq_.write_table(t, p)

    def run(fn):
        ds = rd.read_parquet(p, columns=["url", "warc_ts", "text", "lang", "meta"])
        return canon(fn(ds, num_buckets=4).to_pandas())

    a, b = run(page_features), run(page_features_pushdown)
    shared = [c for c in a.columns if c in b.columns and c != "meta_tags"]
    pd.testing.assert_frame_equal(a[shared], b[shared], check_dtype=False)
    # winner of the tie is text "s0": its repeated identical link counts twice
    first = a[(a["url"] == "https://a/p/1")].sort_values("warc_ts").iloc[0]
    assert first["n_links"] == 3.0
    assert first["mean_link_depth"] == pytest.approx((2.0 + 2.0 + 4.0) / 3)


def test_fused_matches_dataset_pushdown(ray_session, pages_dir):
    import glob as _glob

    from transmog_ray.pipelines.features import (
        page_features_pushdown,
        page_features_pushdown_fused,
    )

    a = canon(page_features_pushdown(load(pages_dir), num_buckets=4).to_pandas())
    files = _glob.glob(f"{pages_dir}/*.parquet")
    b = canon(page_features_pushdown_fused(files, num_buckets=4).to_pandas())
    drop = [c for c in ("meta_tags",) if c in a.columns]
    pd.testing.assert_frame_equal(
        a.drop(columns=drop), b.drop(columns=drop), check_dtype=False
    )
