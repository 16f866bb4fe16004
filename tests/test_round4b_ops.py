"""Round-4 second-batch operators: grouped top-k, unpivot, exact
global quantiles (histogram refinement), skew-aware join, per-group
boilerplate removal, grid resample/ffill."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from transmog_ray.functions.relational import (
    exact_quantiles,
    grouped_topk,
    unpivot,
)
from transmog_ray.functions.skew import skew_join
from transmog_ray.stages.dedup import boilerplate_removal
from transmog_ray.stages.window import resample_ffill


def _rd():
    import ray.data as rd

    return rd


# ---------------------------------------------------------------- topk


def _pandas_grouped_topk(df, keys, by, k, tiebreak):
    df = df[df[by].notna()]
    df = df.sort_values([by, *tiebreak], ascending=[False] + [True] * len(tiebreak))
    return df.groupby(keys, sort=False).head(k)


def test_grouped_topk_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "g": rng.integers(0, 40, n),
        "v": rng.integers(0, 50, n).astype(float),  # many ties
        "id": np.arange(n),
    })
    df.loc[rng.choice(n, 100, replace=False), "v"] = np.nan
    ds = _rd().from_pandas(df).repartition(6)
    got = (
        grouped_topk(ds, ["g"], "v", k=3, tiebreak=["id"], num_buckets=4)
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        _pandas_grouped_topk(df, ["g"], "v", 3, ["id"])
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], want[["g", "v", "id"]])


def test_grouped_topk_small_groups(ray_session):
    df = pd.DataFrame({"g": [1, 1, 2], "v": [5.0, 3.0, 9.0], "id": [0, 1, 2]})
    ds = _rd().from_pandas(df)
    got = grouped_topk(ds, ["g"], "v", k=10, tiebreak=["id"]).to_pandas()
    assert len(got) == 3  # groups smaller than k survive whole


# -------------------------------------------------------------- unpivot


def test_unpivot_roundtrip(ray_session):
    df = pd.DataFrame({"k": ["a", "b"], "x": [1.0, 2.0], "y": [3.0, 4.0]})
    got = (
        unpivot(_rd().from_pandas(df), ["k"], ["x", "y"],
                var_name="m", value_name="val")
        .to_pandas().sort_values(["k", "m"]).reset_index(drop=True)
    )
    assert list(got.columns) == ["k", "m", "val"]
    assert got["val"].tolist() == [1.0, 3.0, 2.0, 4.0]
    assert got["m"].tolist() == ["x", "y", "x", "y"]


# ------------------------------------------------------ exact_quantiles


def test_exact_quantiles_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    # deliberately non-round n: q·n is NOT an integer, so the
    # ceil(q·n)−1 and floor(q·(n−1)) conventions pick DIFFERENT ranks
    v = np.r_[rng.normal(100, 30, 19_993), rng.integers(0, 5, 5_004)].astype(float)
    df = pd.DataFrame({"x": v})
    ds = _rd().from_pandas(df).repartition(8)
    qs = (0.1, 0.5, 0.9)
    got = exact_quantiles(ds, "x", qs, num_bins=64, driver_cap=500)
    con = duckdb.connect()
    want = [con.execute("SELECT quantile_disc(x, ?) FROM df", [q]).fetchone()[0]
            for q in qs]
    assert got == want  # bit-exact: actual elements


def test_exact_quantiles_heavy_duplicates(ray_session):
    # one value owns 90% of rows: the rank bin never narrows below the
    # duplicate mass, so the candidate pull must resolve it
    v = np.r_[np.full(9000, 7.0), np.arange(1000).astype(float)]
    ds = _rd().from_pandas(pd.DataFrame({"x": v})).repartition(4)
    got = exact_quantiles(ds, "x", (0.5,), num_bins=32, driver_cap=20_000)
    assert got == [7.0]


def test_exact_quantiles_nulls_ignored(ray_session):
    df = pd.DataFrame({"x": [1.0, np.nan, 3.0, np.nan, 2.0]})
    got = exact_quantiles(_rd().from_pandas(df), "x", (0.5,))
    assert got == [2.0]


# ------------------------------------------------------------ skew_join


def test_skew_join_matches_pandas_merge(ray_session):
    rng = np.random.default_rng(3)
    n = 20_000
    # one key owns ~40% of the probe side
    k = np.where(rng.random(n) < 0.4, 0, rng.integers(1, 200, n))
    left = pd.DataFrame({"k": k, "v": rng.normal(size=n)})
    right = pd.DataFrame({"k": np.arange(150), "tag": [f"t{i}" for i in range(150)]})
    got = (
        skew_join(_rd().from_pandas(left).repartition(6),
                  _rd().from_pandas(right).repartition(2),
                  on="k", sample_fraction=0.3, hot_share=0.05,
                  num_buckets=4)
        .to_pandas()
    )
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    # identical multiset of joined rows
    c = ["k", "v", "tag"]
    got_s = got[c].sort_values(c).reset_index(drop=True)
    want_s = want[c].sort_values(c).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s)


def test_skew_join_explicit_hot_keys_both_paths(ray_session):
    left = pd.DataFrame({"k": [0] * 50 + [1, 2, 3] * 10,
                         "v": np.arange(80).astype(float)})
    right = pd.DataFrame({"k": [0, 1, 2, 3], "tag": list("abcd")})
    got = (
        skew_join(_rd().from_pandas(left), _rd().from_pandas(right),
                  on="k", hot_keys=[0], num_buckets=2)
        .to_pandas()
    )
    want = left.merge(right, on="k")
    assert sorted(got["v"].tolist()) == sorted(want["v"].tolist())
    assert set(got[got["k"] == 0]["tag"]) == {"a"}  # hot path produced rows
    assert set(got[got["k"] != 0]["tag"]) == {"b", "c", "d"}  # cold path too


# -------------------------------------------------- boilerplate_removal


def test_boilerplate_removal_planted_template(ray_session):
    tpl = "COOKIE BANNER"
    docs = []
    for i in range(10):
        body = f"unique line {i}\nsecond unique {i}"
        text = f"{tpl}\n{body}" if i < 6 else body
        docs.append({"doc_id": i, "source": "hostA", "text": text})
    # a doc that is ONLY boilerplate must drop out entirely
    docs.append({"doc_id": 99, "source": "hostA", "text": tpl})
    # another host where the same line is NOT frequent enough
    docs.append({"doc_id": 100, "source": "hostB", "text": f"{tpl}\nother"})
    docs.append({"doc_id": 101, "source": "hostB", "text": "plain"})
    ds = _rd().from_pandas(pd.DataFrame(docs)).repartition(3)
    out = (
        boilerplate_removal(ds, "doc_id", "text", "source",
                            min_df=2, min_frac=0.5, num_buckets=4)
        .to_pandas().set_index("doc_id")
    )
    assert 99 not in out.index
    for i in range(10):
        assert tpl not in out.loc[i, "text"]
        assert f"unique line {i}" in out.loc[i, "text"]
        assert out.loc[i, "n_kept"] == 2
    # hostB: df=1 of 2 docs → (min_df=2 fails) banner survives
    assert tpl in out.loc[100, "text"]


# --------------------------------------------------------- resample_ffill


def test_resample_ffill_kernel():
    ts = pd.to_datetime([
        "2024-01-01 00:07:00", "2024-01-01 00:31:00",
        "2024-01-01 00:31:00",  # duplicate ts: higher id wins
        "2024-01-01 01:20:00",
    ])
    df = pd.DataFrame({
        "u": [1, 1, 1, 1],
        "ts": ts,
        "v": [10.0, 20.0, 25.0, 40.0],
        "id": [0, 1, 2, 3],
    }).sort_values(["u", "ts", "id"])
    out = resample_ffill(df, "u", "ts", "v", every_s=900, order_col="id")
    # grid: 00:00, 00:15, 00:30, 00:45, 01:00, 01:15 (floor of 01:20)
    assert len(out) == 6
    base = pd.Timestamp("2024-01-01").value // 10**9
    assert out["grid_ts_s"].tolist() == [base + 900 * i for i in range(6)]
    vals = out["v"].tolist()
    assert np.isnan(vals[0])          # nothing at/before 00:00
    assert vals[1] == 10.0            # 00:15 ← 00:07
    assert vals[2] == 10.0            # 00:30 < 00:31
    assert vals[3] == 25.0            # 00:45 ← dup ts resolved to id=2
    assert vals[5] == 25.0            # 01:15 < 01:20


def test_resample_ffill_multi_key_vectorized():
    rng = np.random.default_rng(5)
    rows = []
    for u in range(20):
        t0 = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(rng.integers(0, 86_400)))
        for j in range(int(rng.integers(1, 30))):
            rows.append({
                "u": u,
                "ts": t0 + pd.Timedelta(seconds=int(rng.integers(0, 7200))),
                "v": float(rng.integers(0, 100)),
                "id": len(rows),
            })
    df = pd.DataFrame(rows).sort_values(["u", "ts", "id"]).reset_index(drop=True)
    out = resample_ffill(df, "u", "ts", "v", every_s=600, order_col="id")
    # per-key oracle via pandas asof, looped (the slow reference shape)
    obs = df.drop_duplicates(["u", "ts"], keep="last")
    for u, g in obs.groupby("u"):
        t = g["ts"].astype("datetime64[ns]").astype(np.int64) // 1000
        lo = (t.min() // 600_000_000) * 600_000_000
        hi = (t.max() // 600_000_000) * 600_000_000
        grid = np.arange(lo, hi + 1, 600_000_000)
        sub = out[out["u"] == u]
        assert sub["grid_ts_s"].tolist() == (grid // 1_000_000).tolist()
        for g_us, got_v in zip(grid, sub["v"]):
            prior = g[t.to_numpy() <= g_us]
            if prior.empty:
                assert np.isnan(got_v)
            else:
                assert got_v == prior["v"].iloc[-1]


# ---------------------------------------------------- grouped MAD outliers


def test_grouped_mad_outliers(ray_session):
    from transmog_ray.functions.relational import grouped_mad_outliers

    rng = np.random.default_rng(9)
    base = rng.normal(10, 1, 500)
    df = pd.DataFrame({
        "g": ["a"] * 250 + ["b"] * 250 + ["a", "b"],
        "v": np.r_[base, [1000.0, -1000.0]],
        "id": np.arange(502),
    })
    got = (
        grouped_mad_outliers(_rd().from_pandas(df).repartition(4),
                             ["g"], "v", thresh=3.0, num_buckets=2)
        .to_pandas()
    )
    # pandas oracle with lower-median selection
    want_ids = []
    for _, g in df.groupby("g"):
        v = g["v"].to_numpy()
        med = np.sort(v)[(len(v) - 1) // 2]
        ad = np.abs(v - med)
        mad = np.sort(ad)[(len(ad) - 1) // 2]
        want_ids += g.loc[ad > 3.0 * mad, "id"].tolist()
    assert sorted(got["id"]) == sorted(want_ids)
    assert {500, 501} <= set(got["id"])  # the planted outliers


def test_grouped_mad_outliers_null_values_ignored(ray_session):
    from transmog_ray.functions.relational import grouped_mad_outliers

    df = pd.DataFrame({"g": ["a"] * 6, "v": [1.0, 1.0, 1.0, 1.0, 50.0, np.nan]})
    got = grouped_mad_outliers(_rd().from_pandas(df), ["g"], "v").to_pandas()
    assert got["v"].tolist() == [50.0]


# --------------------------------------------------------- asof_join_multi


def test_asof_join_multi_matches_chained(ray_session):
    from transmog_ray.stages.asof import asof_join, asof_join_multi

    rng = np.random.default_rng(4)
    n = 3000
    ev = pd.DataFrame({
        "id": np.arange(n),
        "u": rng.integers(0, 30, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "kind": rng.choice(["a", "b", "c"], n),
        "v": rng.normal(size=n),
    })
    fa = (ev[ev["kind"] == "a"][["u", "ts", "v"]]
          .rename(columns={"ts": "a_ts", "v": "a_v"}))
    fb = (ev[ev["kind"] == "b"][["u", "ts", "v"]]
          .rename(columns={"ts": "b_ts", "v": "b_v"}))
    ds = _rd().from_pandas(ev).repartition(4)
    dsa = _rd().from_pandas(fa).repartition(3)
    dsb = _rd().from_pandas(fb).repartition(2)
    got = (
        asof_join_multi(ds, [(dsa, "a_ts", ["a_v"]), (dsb, "b_ts", ["b_v"])],
                        key="u", left_ts="ts", num_buckets=4)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # oracle: two chained single-table as-of joins
    step1 = asof_join(ds, dsa, key="u", left_ts="ts", right_ts="a_ts",
                      right_cols=["a_v"], num_buckets=4)
    want = (
        asof_join(step1, dsb, key="u", left_ts="ts", right_ts="b_ts",
                  right_cols=["b_v"], num_buckets=4)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    cols = ["id", "u", "ts", "kind", "v", "a_ts", "a_v", "b_ts", "b_v"]
    pd.testing.assert_frame_equal(got[cols], want[cols])


# -------------------------------------------------------- pmi_collocations


def test_pmi_collocations_hand_computed(ray_session):
    from transmog_ray.functions.text import pmi_collocations

    # "x y" appears 4x and x,y appear ONLY together; "p q" appears 4x
    # but p and q each appear 8x → lift(x y) > lift(p q)
    docs = pd.DataFrame({"text": [
        "x y f1 p q p r q s", "x y f2 p q p r q s",
        "x y f3 p q p r q s", "x y f4 p q p r q s",
    ]})
    got = pmi_collocations(_rd().from_pandas(docs), "text",
                           min_count=4, k=5, num_buckets=2).to_pandas()
    got = got.set_index(got["w1"] + " " + got["w2"])
    n_bigrams = 4 * 8  # 9 tokens per doc → 8 bigrams, 4 docs
    assert got.loc["x y", "n_xy"] == 4
    assert got.loc["x y", "lift"] == (n_bigrams * 4.0) / (4.0 * 4.0)
    assert got.loc["p q", "lift"] == (n_bigrams * 4.0) / (8.0 * 8.0)
    assert got.index[0] == "x y"  # highest lift first


def test_topk_mixed_directions(ray_session):
    from transmog_ray.functions.relational import topk

    df = pd.DataFrame({"s": [1.0, 1.0, 2.0, 2.0], "t": list("badc")})
    got = topk(_rd().from_pandas(df).repartition(2), ["s", "t"], k=3,
               descending=[True, False]).to_pandas()
    assert list(zip(got["s"], got["t"])) == [(2.0, "c"), (2.0, "d"), (1.0, "a")]


# ------------------------------------------------------------ merge_upsert


def test_merge_upsert_tombstones_and_order(ray_session):
    from transmog_ray.stages.dedup import merge_upsert

    base = pd.DataFrame({
        "k": [1, 2, 3, 4],
        "v": ["b1", "b2", "b3", "b4"],
    })
    delta = pd.DataFrame({
        "k":   [1,    1,    2,        5,    5,        3],
        "seq": [10,   20,   5,        1,    2,        7],
        "v":   ["x",  "y",  "dead",   "n1", "dead2",  "z"],
        "op":  ["upsert", "upsert", "delete", "upsert", "delete", "upsert"],
    })
    got = (
        merge_upsert(_rd().from_pandas(base), _rd().from_pandas(delta),
                     key="k", seq="seq", op_col="op", num_buckets=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    # k=1: latest delta seq=20 → y; k=2: tombstone → gone;
    # k=3: delta beats base → z; k=4: base survives untouched;
    # k=5: last op is delete → never appears
    assert got["k"].tolist() == [1, 3, 4]
    assert got["v"].tolist() == ["y", "z", "b4"]
    assert "op" not in got.columns and "_upsert_rank" not in got.columns


def test_merge_upsert_bootstrap_no_base(ray_session):
    from transmog_ray.stages.dedup import merge_upsert

    delta = pd.DataFrame({
        "k": [1, 1, 2], "seq": [1, 2, 1], "v": ["a", "b", "c"],
    })
    got = (
        merge_upsert(None, _rd().from_pandas(delta), key="k", seq="seq",
                     num_buckets=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["v"].tolist() == ["b", "c"]
