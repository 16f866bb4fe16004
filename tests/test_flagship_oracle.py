"""North-star check: flagship feature vectors match an independent
record-level oracle via numpy.allclose at each (url, warc_ts), with zero
temporal leakage — the oracle recomputes features straight from the raw
meta JSON with plain Python loops (no pandas/merge_asof/flatten code
shared with the engine)."""

from __future__ import annotations

import glob
import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from transmog_ray.pipelines.features import page_features_pushdown
from transmog_ray.sources.pages import write_pages


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    return write_pages(str(tmp_path_factory.mktemp("p")), n_shards=2,
                       n_urls_per_shard=50)


def oracle_features(pages_dir):
    """Loop oracle: per (url, warc_ts) → (n_links, mean_link_depth) of the
    latest snapshot at-or-before with at least one link; lag of n_links;
    session index (7-day gap)."""
    rows = []
    for p in sorted(glob.glob(f"{pages_dir}/*.parquet")):
        t = pq.read_table(p, columns=["url", "warc_ts", "text", "meta"])
        rows.extend(t.to_pylist())

    # dedup exactly like the engine: first by (url, warc_ts, text) with
    # null text sorting LAST (pandas sort_values default)
    rows.sort(
        key=lambda r: (r["url"], r["warc_ts"], r["text"] is None, r["text"] or "")
    )
    seen, dedup = set(), []
    for r in rows:
        key = (r["url"], r["warc_ts"])
        if key not in seen:
            seen.add(key)
            dedup.append(r)

    # per-snapshot link stats from the raw meta tree
    def snap_stats(meta_json):
        meta = json.loads(meta_json) if meta_json else {}
        links = meta.get("links", [])
        n = len(links)
        depths = [
            l.get("depth") for l in links
            if l.get("depth") is not None
        ]
        mean_d = sum(depths) / len(depths) if depths else None
        return n, mean_d

    by_url: dict[str, list] = {}
    for r in dedup:
        by_url.setdefault(r["url"], []).append(r)

    out = {}
    for url, snaps in by_url.items():
        snaps.sort(key=lambda r: r["warc_ts"])
        series = [(r["warc_ts"], *snap_stats(r["meta"])) for r in snaps]
        feats_at = []
        for i, (ts, _n, _d) in enumerate(series):
            best = None
            for ts2, n2, d2 in series:
                if ts2 <= ts and n2 > 0:
                    best = (ts2, n2, d2)  # series sorted → last wins
            feats_at.append(best)
        prev_session_ts = None
        session = -1
        for i, (ts, _n, _d) in enumerate(series):
            if (
                prev_session_ts is None
                or (ts - prev_session_ts).total_seconds() > 7 * 86400
            ):
                session += 1
            prev_session_ts = ts
            feat = feats_at[i]
            lag = feats_at[i - 1] if i > 0 else None
            out[(url, ts)] = {
                "feature_ts": feat[0] if feat else None,
                "n_links": feat[1] if feat else None,
                "mean_link_depth": feat[2] if feat else None,
                "n_links_lag1": lag[1] if lag else None,
                "session_seq": session,
            }
    return out


def test_flagship_matches_loop_oracle(ray_session, pages_dir):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir, columns=["url", "warc_ts", "text", "lang", "meta"])
    got = page_features_pushdown(ds, num_buckets=8).to_pandas()
    expect = oracle_features(pages_dir)

    assert len(got) == len(expect)
    mismatches = []
    for _, row in got.iterrows():
        key = (row["url"], row["warc_ts"].to_pydatetime())
        exp = expect[(row["url"], pd.Timestamp(row["warc_ts"]))]
        for col in ("n_links", "mean_link_depth", "n_links_lag1"):
            a = row[col]
            b = exp[col]
            a_null = pd.isna(a)
            b_null = b is None
            if a_null != b_null or (
                not a_null and not np.allclose(float(a), float(b))
            ):
                mismatches.append((key, col, a, b))
        if int(row["session_seq"]) != exp["session_seq"]:
            mismatches.append((key, "session_seq", row["session_seq"], exp["session_seq"]))
        # zero leakage re-checked against the oracle's chosen feature_ts
        if exp["feature_ts"] is not None:
            assert pd.Timestamp(exp["feature_ts"]) <= row["warc_ts"]
            assert row["feature_ts"] == pd.Timestamp(exp["feature_ts"])
    assert not mismatches, mismatches[:5]
