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


def test_pushdown_kernel_property_vs_loop_oracle(ray_session):
    """Random page frames (ties, dup copies, null text, zero-link and
    null-depth snapshots) through the fused pushdown kernel vs a
    straightforward row-by-row oracle."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from transmog_ray.pipelines.features import page_feature_fn_pushdown

    GAP, ROLL = 100.0, 250.0
    kernel = page_feature_fn_pushdown(GAP, ROLL)

    rows_strategy = st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),         # url
            st.integers(0, 8),                            # ts slot (ties!)
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # text
            st.integers(0, 3),                            # n_links
            st.one_of(st.none(), st.floats(0, 5, allow_nan=False)),  # depth
        ),
        min_size=1, max_size=25,
    )

    def build(rows):
        base = pd.Timestamp("2024-01-01")
        return pd.DataFrame({
            "url": [r[0] for r in rows],
            "warc_ts": [base + pd.Timedelta(seconds=60 * r[1]) for r in rows],
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
            "_id": ["x"] * len(rows),
            "n_links": pd.Series([r[3] for r in rows], dtype="int64"),
            "mean_link_depth": pd.Series(
                [r[4] if r[3] > 0 else None for r in rows], dtype="float64"),
        })

    def oracle(df):
        # dedup winner per (url, ts): min text (None last)
        groups = {}
        for i in range(len(df)):
            k = (df["url"][i], df["warc_ts"][i])
            cur = groups.get(k)
            tx = df["text"][i]
            rank = (tx is None, tx)
            if cur is None or rank < cur[0]:
                groups[k] = (rank, i)
        out = []
        for (url, ts), (_, i) in groups.items():
            out.append(dict(url=url, warc_ts=ts, text=df["text"][i],
                            n0=int(df["n_links"][i]),
                            d0=df["mean_link_depth"][i]))
        out.sort(key=lambda r: (r["url"], r["warc_ts"]))
        # as-of: latest same-url row at/earlier with n0 > 0
        for r in out:
            feat = None
            for r2 in out:
                if r2["url"] == r["url"] and r2["warc_ts"] <= r["warc_ts"] \
                        and r2["n0"] > 0:
                    if feat is None or r2["warc_ts"] > feat["warc_ts"]:
                        feat = r2
            r["feature_ts"] = feat["warc_ts"] if feat else None
            r["n_links"] = float(feat["n0"]) if feat else None
            r["mean_link_depth"] = feat["d0"] if feat else None
        # rolling over attached n_links within [t-ROLL, t]
        for r in out:
            window = [r2 for r2 in out if r2["url"] == r["url"]
                      and 0 <= (r["warc_ts"] - r2["warc_ts"]).total_seconds() <= ROLL
                      and r2["n_links"] is not None]
            r["rcount"] = len(window)
            r["rmean"] = (sum(x["n_links"] for x in window) / len(window)
                          if window else None)
        return out

    @settings(max_examples=25, deadline=None)
    @given(rows=rows_strategy)
    def check(rows):
        df = build(rows)
        got = kernel(df.copy()).sort_values(["url", "warc_ts"]).reset_index(drop=True)
        want = oracle(df)
        assert len(got) == len(want)
        for i, w in enumerate(want):
            g = got.iloc[i]
            assert (g["url"], g["warc_ts"]) == (w["url"], w["warc_ts"])
            assert (g["text"] == w["text"]) or (pd.isna(g["text"]) and w["text"] is None)
            if w["n_links"] is None:
                assert pd.isna(g["n_links"]) and pd.isna(g["feature_ts"])
            else:
                assert g["n_links"] == w["n_links"]
                assert g["feature_ts"] == w["feature_ts"]
                if w["mean_link_depth"] is None or pd.isna(w["mean_link_depth"]):
                    assert pd.isna(g["mean_link_depth"])
                else:
                    assert abs(g["mean_link_depth"] - w["mean_link_depth"]) < 1e-9
            assert g[f"n_links_w{int(ROLL)}s_count"] == w["rcount"]
            if w["rmean"] is None:
                assert pd.isna(g[f"n_links_w{int(ROLL)}s_mean"])
            else:
                assert abs(g[f"n_links_w{int(ROLL)}s_mean"] - w["rmean"]) < 1e-9

    check()


def test_fixture_tie_groups_distinguishable_by_text():
    """ADVICE r2: within any (url, warc_ts) group, rows are either
    byte-identical duplicates or pairwise distinct in TEXT — so the dedup
    winner is the same under the oracle SQL (ROW_NUMBER ORDER BY text),
    the tagged path ((text, _fp) sort) and the pushdown path (text
    re-rank): no unspecified-order peers exist."""
    from transmog_ray.sources.pages import generate_pages_shard

    for shard in range(4):
        t = generate_pages_shard(shard, n_urls_per_shard=300, seed=7).to_pandas()
        for (_, _), g in t.groupby(["url", "warc_ts"]):
            if len(g) < 2:
                continue
            rows = g[["text", "lang", "meta"]].to_dict("records")
            texts = [r["text"] for r in rows]
            # any two rows: identical content, or distinct non-null texts
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    if rows[i] == rows[j]:
                        continue
                    assert texts[i] != texts[j], (g["url"].iloc[0], texts)


def test_incremental_ingest_matches_batch_and_prunes_buckets(
    ray_session, pages_dir, tmp_path
):
    """Incremental snapshot ingest: (a) features after two ingests equal
    the batch flagship over all shards; (b) a delta touching one url
    recomputes ONLY that url's bucket — every other feature partition is
    byte-untouched (the 100-TB refresh contract)."""
    import os

    import numpy as np
    import pyarrow as pa

    from transmog_ray.pipelines.features import (
        ingest_pages_increment,
        page_features_pushdown_fused,
    )

    files = sorted(glob.glob(f"{pages_dir}/*.parquet"))
    out = str(tmp_path / "store")

    # ingest 1: the base corpus
    m1 = ingest_pages_increment(out, files, num_buckets=8)
    assert m1["files_ingested"] == len(files)

    # delta: NEW snapshots for exactly one url (ts shifted past the max)
    base = pq.read_table(files[0])
    url0 = base["url"][0].as_py()
    one = base.filter(pa.compute.equal(base["url"], url0))
    shifted = one.set_column(
        one.schema.get_field_index("warc_ts"), "warc_ts",
        pa.compute.add(one["warc_ts"], pa.scalar(86_400_000_000, pa.duration("us"))),
    )
    delta = str(tmp_path / "delta-00000.parquet")
    pq.write_table(shifted, delta)

    before = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(f"{out}/features/part=*/data.parquet")
    }
    m2 = ingest_pages_increment(out, [delta], num_buckets=8)
    assert m2["files_ingested"] == 1
    assert m2["buckets_touched"] == 1
    assert m2["buckets_reused"] == 7
    # untouched partitions are byte-untouched (same inode mtime)
    changed = [
        p for p, t in before.items() if os.stat(p).st_mtime_ns != t
    ]
    assert len(changed) == 1

    # re-ingesting the same file is a no-op
    m3 = ingest_pages_increment(out, [delta], num_buckets=8)
    assert m3["files_ingested"] == 0 and m3["buckets_touched"] == 0

    # equality with the batch flagship over ALL shards
    import ray.data as rd

    inc_df = rd.read_parquet(
        sorted(glob.glob(f"{out}/features/part=*/data.parquet"))
    ).to_pandas()
    # Ray infers a hive-partition column from the part=N dirs — not data
    inc = canon(inc_df.drop(columns=[c for c in ("part",) if c in inc_df]))
    full = canon(
        page_features_pushdown_fused(files + [delta], num_buckets=8).to_pandas()
    )
    drop = [c for c in ("meta_tags",) if c in inc.columns]
    pd.testing.assert_frame_equal(
        inc.drop(columns=drop), full.drop(columns=drop), check_dtype=False
    )
