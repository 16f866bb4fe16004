"""Feature-operator correctness: hand-computed fixtures (FIXTURES.md §C)
and an independent row-loop oracle on randomized data.

The oracle implementations below are deliberately naive Python loops —
a different algorithm family from the engine's vectorized/sort-merge
paths, so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from transmog_ray.stages.asof import asof_join, asof_join_broadcast
from transmog_ray.stages.dedup import dedup_exact
from transmog_ray.stages.partition import apply_sorted
from transmog_ray.stages.window import (
    backfill,
    rolling_agg,
    sessionize,
    with_lag,
    with_lead,
)


def ts(seconds):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=seconds)


# ------------------------------------------------------------- oracles


def oracle_asof(left_rows, right_rows, tolerance=None):
    """For each (key, t): latest right row with rt <= t (and t - rt <= tol)."""
    out = []
    for key, t in left_rows:
        best = None
        for rkey, rt, val in right_rows:
            if rkey == key and rt <= t and (tolerance is None or (t - rt).total_seconds() <= tolerance):
                if best is None or rt > best[0]:
                    best = (rt, val)
        out.append((key, t, *(best if best else (None, None))))
    return out


def oracle_sessions(times, gap_s):
    """Session index per sorted timestamp list."""
    out, seq = [], -1
    prev = None
    for t in times:
        if prev is None or (t - prev).total_seconds() > gap_s:
            seq += 1
        out.append(seq)
        prev = t
    return out


# -------------------------------------------------------- hand fixtures


def test_asof_hand_case(ray_session):
    import ray.data as rd

    left = pd.DataFrame(
        {"url": ["u"] * 3, "warc_ts": [ts(10), ts(20), ts(30)]}
    )
    right = pd.DataFrame(
        {
            "url": ["u"] * 4,
            "feature_ts": [ts(5), ts(15), ts(25), ts(35)],
            "feat": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        key="url",
        left_ts="warc_ts",
        right_ts="feature_ts",
        right_cols=["feat"],
        num_buckets=4,
    ).to_pandas().sort_values("warc_ts").reset_index(drop=True)

    assert list(out["feat"]) == [1.0, 2.0, 3.0]
    # zero leakage: every joined feature_ts <= warc_ts; ts(35) never appears
    assert (out["feature_ts"] <= out["warc_ts"]).all()
    assert ts(35) not in set(out["feature_ts"])


def test_asof_exact_match_and_miss(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"k": ["a", "a", "b"], "t": [ts(5), ts(1), ts(9)]})
    right = pd.DataFrame({"k": ["a"], "ft": [ts(5)], "v": [7]})
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", left_ts="t", right_ts="ft", right_cols=["v"], num_buckets=2,
    ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    # exact match joins; earlier row and other key miss (null)
    assert out.loc[1, "v"] == 7  # (a, t=5) ← ft=5
    assert pd.isna(out.loc[0, "v"])  # (a, t=1): nothing at or before
    assert pd.isna(out.loc[2, "v"])  # (b, t=9): no rows for key b
    assert len(out) == 3


def test_asof_broadcast_matches_shuffle(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 100),
            "t": [ts(int(s)) for s in rng.integers(0, 1000, 100)],
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 30),
            "ft": [ts(int(s)) for s in rng.integers(0, 1000, 30)],
            "v": rng.normal(size=30),
        }
    ).drop_duplicates(subset=["k", "ft"])
    a = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        key="k", left_ts="t", right_ts="ft", right_cols=["v"], num_buckets=8,
    ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    b = asof_join_broadcast(
        rd.from_pandas(left), right,
        key="k", left_ts="t", right_ts="ft", right_cols=["v"],
    ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["k", "t", "ft", "v"]], b[["k", "t", "ft", "v"]])
    # oracle agreement
    expect = oracle_asof(
        list(zip(left["k"], left["t"])),
        list(zip(right["k"], right["ft"], right["v"])),
    )
    exp = pd.DataFrame(expect, columns=["k", "t", "ft", "v"]).sort_values(
        ["k", "t"]
    ).reset_index(drop=True)
    assert np.allclose(a["v"].to_numpy(dtype=float), exp["v"].to_numpy(dtype=float), equal_nan=True)


def test_sessionize_hand_case():
    df = pd.DataFrame(
        {"url": ["u"] * 5, "warc_ts": [ts(0), ts(30), ts(50), ts(200), ts(220)]}
    )
    out = sessionize(df.copy(), "url", "warc_ts", gap_seconds=60)
    assert list(out["session_seq"]) == [0, 0, 0, 1, 1]
    assert out["session_id"][0] == out["session_id"][2] != out["session_id"][3]
    # deterministic: key|epoch_us(session_start)
    start_us = ts(0).value // 1000
    assert out["session_id"][0] == f"u|{start_us}"
    assert list(out["session_seq"]) == oracle_sessions(list(df["warc_ts"]), 60)


def test_lag_lead_backfill_hand_case():
    df = pd.DataFrame(
        {
            "url": ["u"] * 5,
            "warc_ts": [ts(i) for i in range(5)],
            "x": [1.0, None, 3.0, None, 5.0],
        }
    )
    out = with_lag(df.copy(), "url", ["x"], lags=[1, 2])
    assert list(out["x_lag1"].fillna(-1)) == [-1, 1.0, -1, 3.0, -1]
    assert list(out["x_lag2"].fillna(-1)) == [-1, -1, 1.0, -1, 3.0]
    out = with_lead(out, "url", ["x"], leads=[1])
    assert list(out["x_lead1"].fillna(-1)) == [-1, 3.0, -1, 5.0, -1]
    out = backfill(out, "url", ["x"])
    assert list(out["x_filled"]) == [1.0, 1.0, 3.0, 3.0, 5.0]


def test_rolling_window_hand_case():
    df = pd.DataFrame(
        {
            "url": ["u"] * 4,
            "warc_ts": [ts(0), ts(50), ts(100), ts(300)],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = rolling_agg(df.copy(), "url", "warc_ts", "v", 100, aggs=("count", "mean"))
    # windows [t-100, t] closed both: t=100 includes t=0 (boundary)
    assert list(out["v_w100s_count"]) == [1.0, 2.0, 3.0, 1.0]
    assert list(out["v_w100s_mean"]) == [1.0, 1.5, 2.0, 4.0]


def test_dedup_exact(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "url": ["a", "a", "a", "b", "b"],
            "warc_ts": [ts(1), ts(1), ts(2), ts(3), ts(3)],
            "rank": [2, 1, 0, 5, 4],
        }
    )
    out = dedup_exact(
        rd.from_pandas(df), keys=["url", "warc_ts"], order_by=["rank"], num_buckets=4
    ).to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert len(out) == 3
    assert list(out["rank"]) == [1, 0, 4]  # deterministic min-rank winner


def test_apply_sorted_fused_pipeline(ray_session):
    """lag + sessionize + backfill + rolling in ONE partition pass."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame(
        {
            "url": rng.choice([f"u{i}" for i in range(17)], n),
            "warc_ts": [ts(int(s)) for s in rng.integers(0, 5000, n)],
            "x": np.where(rng.random(n) < 0.25, np.nan, rng.normal(size=n)),
        }
    ).drop_duplicates(subset=["url", "warc_ts"])

    def features(part: pd.DataFrame) -> pd.DataFrame:
        part = with_lag(part, "url", ["x"])
        part = sessionize(part, "url", "warc_ts", gap_seconds=300)
        part = backfill(part, "url", ["x"])
        part = rolling_agg(part, "url", "warc_ts", "x", 600, aggs=("count",))
        return part

    out = (
        apply_sorted(rd.from_pandas(df), ["url"], "warc_ts", features, num_buckets=8)
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    assert len(out) == len(df)

    # oracle: per-key loop
    exp = df.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    for url, g in exp.groupby("url"):
        sub = out[out["url"] == url].reset_index(drop=True)
        xs = g["x"].tolist()
        times = g["warc_ts"].tolist()
        # lag
        expect_lag = [np.nan] + xs[:-1]
        assert np.allclose(sub["x_lag1"], expect_lag, equal_nan=True)
        # sessions
        assert list(sub["session_seq"]) == oracle_sessions(times, 300)
        # backfill
        filled, last = [], np.nan
        for x in xs:
            if not np.isnan(x):
                last = x
            filled.append(last)
        assert np.allclose(sub["x_filled"], filled, equal_nan=True)
        # rolling count of non-null x in [t-600, t]
        cnt = [
            sum(
                1
                for t2, x2 in zip(times, xs)
                if 0 <= (t - t2).total_seconds() <= 600 and not np.isnan(x2)
            )
            for t in times
        ]
        assert list(sub["x_w600s_count"].astype(int)) == cnt


def test_bucket_exchange_matches_groupby_exchange(ray_session):
    """The raw-task bucket exchange must be a drop-in replacement for the
    sort-based groupby exchange."""
    import numpy as np
    import ray.data as rd

    from transmog_ray.stages.partition import apply_sorted

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10000, n), unit="s"),
        "v": rng.uniform(0, 10, n),
        "rid": np.arange(n, dtype=np.int64),
    })

    def fn(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["cum"] = part.groupby("k")["v"].cumsum()
        return part

    def run(exchange):
        ds = rd.from_pandas(df).map_batches(lambda t: t, batch_format="pyarrow")
        return (
            apply_sorted(ds, ["k"], "ts", fn, num_buckets=8,
                         tiebreak=["rid"], exchange=exchange)
            .to_pandas().sort_values("rid").reset_index(drop=True)
        )

    a, b = run("groupby"), run("tasks")
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_hash_join_left_and_dtypes(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import hash_join

    left = pd.DataFrame({
        "k": pd.Series([1, 2, 3, 4], dtype="int64"),
        "lv": pd.Series([10, 20, 30, 40], dtype="int64"),
    })
    right = pd.DataFrame({
        "k": pd.Series([2, 3, 5], dtype="int64"),
        "rv": ["b", "c", "e"],
    })
    for exchange in ("groupby", "tasks"):
        inner = (
            hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                      num_buckets=4, exchange=exchange)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(inner["k"]) == [2, 3]
        assert str(inner["k"].dtype) == "int64"  # restored after pad/union
        assert str(inner["lv"].dtype) == "int64"
        assert list(inner["rv"]) == ["b", "c"]

        outer = (
            hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                      how="left", num_buckets=4, exchange=exchange)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(outer["k"]) == [1, 2, 3, 4]
        assert outer["rv"].isna().sum() == 2


def test_grouped_quantile_matches_pandas(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import grouped_quantile

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 7, 500),
                       "v": rng.normal(100, 20, 500)})
    got = (
        grouped_quantile(rd.from_pandas(df), ["k"], "v", (0.5, 0.9),
                         num_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    expect = (
        df.groupby("k")["v"]
        .quantile([0.5, 0.9]).unstack()
        .rename(columns={0.5: "v_p50", 0.9: "v_p90"}).reset_index()
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_approx_grouped_quantile_exact_for_small_groups(ray_session):
    """Every group <= sketch_size -> the sketch is the data and the
    result is bit-exact vs the holistic grouped_quantile."""
    import ray.data as rd

    from transmog_ray.functions.relational import (
        approx_grouped_quantile, grouped_quantile)

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 40, 2000),
                       "v": rng.normal(50, 30, 2000)})
    # ~50 values per key, split across 8 blocks -> merge path exercised,
    # compression path never (total per key < 256)
    ds = rd.from_pandas(df).repartition(8)
    got = (
        approx_grouped_quantile(ds, ["k"], "v", (0.25, 0.5, 0.9),
                                sketch_size=256, num_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exact = (
        grouped_quantile(rd.from_pandas(df), ["k"], "v", (0.25, 0.5, 0.9),
                         num_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exact, check_dtype=False)


def test_approx_grouped_quantile_error_bound(ray_session):
    """Groups far larger than the sketch: the estimate's TRUE rank must
    sit within the documented 2n/m window of the target rank."""
    import ray.data as rd

    from transmog_ray.functions.relational import approx_grouped_quantile

    rng = np.random.default_rng(12)
    n = 40_000
    df = pd.DataFrame({"k": rng.integers(0, 3, n),
                       "v": rng.lognormal(3.0, 1.0, n)})
    m = 128
    got = (
        approx_grouped_quantile(rd.from_pandas(df).repartition(16),
                                ["k"], "v", (0.1, 0.5, 0.99),
                                sketch_size=m, num_buckets=4)
        .to_pandas().set_index("k").sort_index()
    )
    for k, g in df.groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        gn = len(vals)
        for q, colname in [(0.1, "v_p10"), (0.5, "v_p50"), (0.99, "v_p99")]:
            est = got.loc[k, colname]
            true_rank = np.searchsorted(vals, est)
            assert abs(true_rank - q * gn) <= 2.0 * gn / m + 1, (
                k, q, est, true_rank, q * gn)


def test_stratified_sample_nested_and_rates(ray_session):
    """A lower rate's sample must be a subset of a higher rate's (fixed
    per-row hash), and unknown strata fall back to default_rate."""
    import ray.data as rd

    from transmog_ray.functions.sampling import stratified_sample

    df = pd.DataFrame({"id": np.arange(5000),
                       "s": np.tile(["a", "b", "c"], 5000)[:5000]})
    ds = rd.from_pandas(df).repartition(4)
    lo = stratified_sample(ds, "id", "s", {"a": 10, "b": 0}, 5).to_pandas()
    hi = stratified_sample(ds, "id", "s", {"a": 40, "b": 0}, 50).to_pandas()
    assert set(lo[lo["s"] == "a"]["id"]) <= set(hi[hi["s"] == "a"]["id"])
    assert (lo["s"] != "b").all() and (hi["s"] != "b").all()
    # rates land near nominal on uniform ids
    n_a = (df["s"] == "a").sum()
    assert abs((lo["s"] == "a").sum() / n_a - 0.10) < 0.03
    assert abs((hi["s"] == "a").sum() / n_a - 0.40) < 0.05


def test_stratified_topn_matches_rownumber(ray_session):
    import ray.data as rd

    from transmog_ray.functions.sampling import knuth_hash, stratified_topn

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"id": rng.permutation(3000),
                       "s": rng.choice(["x", "y", "z"], 3000),
                       "v": rng.normal(size=3000)})
    got = (
        stratified_topn(rd.from_pandas(df).repartition(6), "id", "s", n=15,
                        num_buckets=4)
        .to_pandas().sort_values(["s", "id"]).reset_index(drop=True)
    )
    ref = df.assign(__h=knuth_hash(df["id"].to_numpy()).astype(np.int64))
    ref = (ref.sort_values(["__h", "id"], kind="mergesort")
           .groupby("s", sort=False).head(15).drop(columns="__h")
           .sort_values(["s", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["id", "s", "v"]], ref[["id", "s", "v"]],
                                  check_dtype=False)
    assert (got.groupby("s").size() == 15).all()


def test_redact_pii_kinds_and_order():
    from transmog_ray.functions.text import redact_pii

    df = pd.DataFrame({"text": [
        "mail a.b+c@sub.example.co.uk now",
        "from 192.168.0.1 and 8.8.8.8",
        "call +49 170 1234567 or +1 555-0042",
        "user7@mail3.org ip 10.1.2.3 tel +1 555-0007",  # all three kinds
        None,
    ]})
    out = redact_pii(df.copy())["text"]
    assert out[0] == "mail [EMAIL] now"
    assert out[1] == "from [IP] and [IP]"
    assert out[2] == "call [PHONE] or [PHONE]"
    # emails redacted before the phone pattern can eat their digits
    assert out[3] == "[EMAIL] ip [IP] tel [PHONE]"
    assert out[4] == ""


def test_hopping_window_matches_local(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import hopping_window_agg

    rng = np.random.default_rng(6)
    n = 800
    df = pd.DataFrame({
        "user_id": rng.integers(0, 9, n),
        "event_id": np.arange(n),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 6 * 3600, n), unit="s"),
        "value": rng.normal(10, 3, n),
    })
    got = (
        hopping_window_agg(rd.from_pandas(df), "user_id", "ts", "value",
                           window_seconds=3600, hop_seconds=1800,
                           id_col="event_id", num_buckets=8)
        .to_pandas().sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    # local reference: every event in the k=2 windows covering it
    ts_s = df["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    rows = []
    for k in (0, 1):
        w = (ts_s // 1800) * 1800 - k * 1800
        rows.append(df.assign(window_start=w))
    local = (
        pd.concat(rows).groupby(["user_id", "window_start"])
        .agg(n_events=("event_id", "count"), sum_value=("value", "sum"))
        .reset_index().sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, local, check_dtype=False)
    # every window covers its member events: [ws, ws+3600)
    assert ((got["window_start"] >= 0).all())


def test_hopping_rejects_nondividing_hop(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import hopping_window_agg

    with pytest.raises(ValueError):
        hopping_window_agg(rd.from_items([]), "k", "ts", "v",
                           window_seconds=3600, hop_seconds=700)


def test_hll_approx_distinct_error_bound(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import HyperLogLog, approx_distinct

    # sketch-level: deterministic and within ~2% at 50k cardinality
    h = HyperLogLog(14)
    h.add(pd.Series(np.arange(50_000)))
    est = h.count()
    assert abs(est - 50_000) / 50_000 < 0.02
    # merge of disjoint halves == union estimate
    a, b = HyperLogLog(14), HyperLogLog(14)
    a.add(pd.Series(np.arange(0, 30_000)))
    b.add(pd.Series(np.arange(20_000, 50_000)))
    assert a.merge(b).count() == est
    # distributed path pins against the exact distinct count
    rng = np.random.default_rng(8)
    vals = rng.integers(0, 4000, 20_000)
    ds = rd.from_pandas(pd.DataFrame({"u": vals}), override_num_blocks=8)
    exact = len(np.unique(vals))
    got = approx_distinct(ds, "u")
    assert abs(got - exact) / exact < 0.02


# ----------------------------------------------------------- range join


def _rj_frames():
    # overlapping windows, inclusive bounds, a key with no intervals,
    # an interval with no probes, and an inverted (end < start) interval
    left = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 3],
        "t": [0, 5, 10, 15, 7, 99],
        "eid": [10, 11, 12, 13, 20, 30],
    })
    right = pd.DataFrame({
        "k": [1, 1, 1, 2, 4],
        "lo": [0, 5, 12, 100, 8],
        "hi": [5, 14, 11, 200, 2],  # third inverted→empty, fourth no probe
        "wid": [100, 101, 102, 103, 104],
    })
    expect = {
        (10, 100), (11, 100), (11, 101),  # t=5 hits [0,5] AND [5,14]
        (12, 101), (13, None),            # t=15 matches nothing
    }
    expect = {(e, w) for (e, w) in expect if w is not None}
    return left, right, expect


def test_range_join_hand_case(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import range_join

    left, right, expect = _rj_frames()
    out = range_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", left_ts="t", right_start="lo", right_end="hi", num_buckets=3,
    ).to_pandas()
    got = set(zip(out["eid"], out["wid"]))
    assert got == expect
    # dtypes survive the padded union (ints stay ints)
    assert out["eid"].dtype == np.int64 and out["wid"].dtype == np.int64


def test_range_join_matches_pandas_bruteforce(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import range_join

    rng = np.random.default_rng(7)
    n, m = 400, 120
    left = pd.DataFrame({
        "k": rng.integers(0, 12, n), "t": rng.integers(0, 1000, n),
        "eid": np.arange(n),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 12, m), "lo": rng.integers(0, 900, m),
        "wid": np.arange(m),
    })
    right["hi"] = right["lo"] + rng.integers(0, 300, m)
    out = range_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", left_ts="t", right_start="lo", right_end="hi", num_buckets=5,
    ).to_pandas()
    brute = left.merge(right, on="k")
    brute = brute[(brute["t"] >= brute["lo"]) & (brute["t"] <= brute["hi"])]
    assert sorted(zip(out["eid"], out["wid"])) == sorted(
        zip(brute["eid"], brute["wid"])
    )


def test_range_join_empty_side(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import range_join

    left, right, _ = _rj_frames()
    out = range_join(
        rd.from_pandas(left), rd.from_pandas(right.iloc[:0]),
        on="k", left_ts="t", right_start="lo", right_end="hi", num_buckets=2,
    )
    assert out.count() == 0
    # schema survives on the blocks even though every bucket is empty
    # (ray's to_pandas() of an all-empty dataset drops columns)
    assert set(out.schema().names) >= {"k", "t", "eid", "lo", "hi", "wid"}


# ------------------------------------------------- repetition / sampling


def test_repetition_stats_hand_case():
    from transmog_ray.functions.text import repetition_stats

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a", "x y z", "solo"],
    })
    out = repetition_stats(df).set_index("doc_id")
    # doc 1 bigrams: "a b","b a","a b","b a" → all duplicated, top=2/4
    assert out.loc[1, "n_bigrams"] == 4
    assert out.loc[1, "top_bigram_frac"] == 0.5
    assert out.loc[1, "dup_bigram_frac"] == 1.0
    # doc 2: 2 unique bigrams, no dups
    assert out.loc[2, "n_bigrams"] == 2
    assert out.loc[2, "dup_bigram_frac"] == 0.0
    # doc 3: single token → no row
    assert 3 not in out.index


def test_pivot_count_matches_crosstab(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import pivot_count

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 9, 300),
        "c": rng.choice(["a", "b", "z"], 300),
    })
    out = pivot_count(rd.from_pandas(df), "k", "c", ["a", "b", "missing"],
                      num_buckets=4).to_pandas().sort_values("k").reset_index(drop=True)
    ct = pd.crosstab(df["k"], df["c"])
    assert (out["n_a"].to_numpy() == ct["a"].to_numpy()).all()
    assert (out["n_b"].to_numpy() == ct["b"].to_numpy()).all()
    assert (out["n_missing"] == 0).all()  # unseen category → zero column


def test_grouped_corr_matches_pandas(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import grouped_corr

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 500),
        "x": rng.normal(size=500),
    })
    df["y"] = 2 * df["x"] + rng.normal(scale=0.5, size=500)
    df.loc[3, "x"] = np.nan  # null pair dropped, SQL CORR semantics
    out = grouped_corr(rd.from_pandas(df), "k", "x", "y", num_buckets=3) \
        .to_pandas().set_index("k")["corr_xy"]
    expected = df.dropna().groupby("k").apply(
        lambda g: g["x"].corr(g["y"]), include_groups=False)
    for k in expected.index:
        assert abs(out.loc[k] - expected.loc[k]) < 1e-9
    # constant-x group → NULL
    cdf = pd.DataFrame({"k": [1, 1, 1], "x": [2.0, 2.0, 2.0], "y": [1., 2., 3.]})
    cout = grouped_corr(rd.from_pandas(cdf), "k", "x", "y").to_pandas()
    assert np.isnan(cout["corr_xy"]).all()


def test_grouped_count_distinct_matches_pandas(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import grouped_count_distinct

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 9, 600),
        "v": rng.choice(list("abcdefg"), 600),
    })
    out = (
        grouped_count_distinct(rd.from_pandas(df), "k", "v", out_col="n",
                               num_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    expect = df.groupby("k")["v"].nunique().reset_index(name="n")
    pd.testing.assert_frame_equal(out, expect, check_dtype=False)


def test_word_ngrams_hand_case():
    from transmog_ray.functions.text import word_ngrams

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "x y", "p q r"],
    })
    out = word_ngrams(df, 3)
    assert list(out["g"]) == ["a b c", "b c d", "p q r"]  # doc 2 too short
    assert list(out["doc_id"]) == [1, 1, 3]


def test_ngram_contamination(ray_session):
    import ray.data as rd

    from transmog_ray.functions.text import ngram_contamination

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat sat on the mat today",   # 4 distinct 5-grams
                 "the cat sat on the mat",          # 2, both in doc 1's set
                 "one two"],                        # too short → no row
    })
    ev = frozenset(["the cat sat on the", "cat sat on the mat"])
    out = (
        ngram_contamination(rd.from_pandas(df), ev, n=5)
        .to_pandas().set_index("doc_id")
    )
    assert set(out.index) == {1, 2}
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_contam"] == 2
    assert out.loc[2, "n_grams"] == 2 and out.loc[2, "n_contam"] == 2
    assert out.loc[2, "contam_frac"] == 1.0


def test_line_dedup_hand_case(ray_session):
    """Corpus-level line dedup: repeated lines survive only at the lowest
    (doc_id, line_no); docs reassemble in original line order; a doc whose
    every line lost disappears; both exchange paths agree."""
    import ray.data as rd

    from transmog_ray.stages.dedup import line_dedup

    docs = [
        {"doc_id": 1, "text": "alpha\nbeta\ngamma"},
        {"doc_id": 2, "text": "beta\ndelta"},       # beta lost to doc 1
        {"doc_id": 3, "text": "gamma\nbeta"},       # both lost
        {"doc_id": 4, "text": None},                # null text dropped
    ]
    expect = {1: "alpha\nbeta\ngamma", 2: "delta"}
    for exchange in ("tasks", "groupby"):
        out = (
            line_dedup(rd.from_items(docs), "doc_id", "text",
                       num_buckets=3, exchange=exchange)
            .to_pandas().set_index("doc_id")["text"].to_dict()
        )
        assert out == expect, exchange


def test_rollup_agg_hand_case(ray_session):
    """ROLLUP levels: finest + per-k1 subtotal + grand total, rolled-up
    keys NULL, counts merged by sum; non-decomposable ops rejected."""
    import pytest
    import ray.data as rd

    from transmog_ray.functions.relational import rollup_agg

    rows = [
        {"a": "x", "b": "p", "v": 1.0},
        {"a": "x", "b": "q", "v": 2.0},
        {"a": "y", "b": "p", "v": 4.0},
    ]
    ds = rd.from_items(rows)
    out = rollup_agg(ds, ["a", "b"], {"s": ("v", "sum"), "n": ("v", "count")},
                     num_buckets=4).to_pandas()
    assert len(out) == 3 + 2 + 1
    total = out[out["a"].isna()]
    assert total["s"].iloc[0] == 7.0 and total["n"].iloc[0] == 3
    xa = out[(out["a"] == "x") & (out["b"].isna())]
    assert xa["s"].iloc[0] == 3.0 and xa["n"].iloc[0] == 2
    with pytest.raises(ValueError, match="decomposable"):
        rollup_agg(ds, ["a"], {"m": ("v", "mean")})


def test_cube_and_grouping_sets_hand_case(ray_session):
    """CUBE emits all 2^m subsets (incl. the per-b level ROLLUP lacks);
    explicit GROUPING SETS emits exactly the requested sets."""
    import ray.data as rd

    from transmog_ray.functions.relational import cube_agg, grouping_sets_agg

    rows = [
        {"a": "x", "b": "p", "v": 1.0},
        {"a": "x", "b": "q", "v": 2.0},
        {"a": "y", "b": "p", "v": 4.0},
    ]
    ds = rd.from_items(rows)
    out = cube_agg(ds, ["a", "b"], {"s": ("v", "sum"), "n": ("v", "count")},
                   num_buckets=4).to_pandas()
    # finest 3 + per-a 2 + per-b 2 + grand total 1
    assert len(out) == 8
    pb = out[out["a"].isna() & (out["b"] == "p")]
    assert pb["s"].iloc[0] == 5.0 and pb["n"].iloc[0] == 2
    total = out[out["a"].isna() & out["b"].isna()]
    assert total["s"].iloc[0] == 7.0 and total["n"].iloc[0] == 3
    assert out["n"].dtype == "int64"

    only_b = grouping_sets_agg(
        rd.from_items(rows), ["a", "b"], {"s": ("v", "sum")},
        sets=[("b",)], num_buckets=4,
    ).to_pandas()
    assert len(only_b) == 2 and only_b["a"].isna().all()
    assert sorted(only_b["s"]) == [2.0, 5.0]


def test_asof_forward_direction(ray_session):
    """direction='forward' attaches the EARLIEST right row at/after the
    left ts (label construction); exact matches allowed."""
    import ray.data as rd

    from transmog_ray.stages.asof import asof_join

    left = rd.from_items([
        {"k": "a", "ts": pd.Timestamp("2024-01-01 00:10"), "i": 1},
        {"k": "a", "ts": pd.Timestamp("2024-01-01 01:00"), "i": 2},
        {"k": "a", "ts": pd.Timestamp("2024-01-01 03:00"), "i": 3},
    ])
    right = rd.from_items([
        {"k": "a", "fts": pd.Timestamp("2024-01-01 01:00"), "v": 10.0},
        {"k": "a", "fts": pd.Timestamp("2024-01-01 02:00"), "v": 20.0},
    ])
    out = (
        asof_join(left, right, key="k", left_ts="ts", right_ts="fts",
                  right_cols=["v"], num_buckets=2, direction="forward")
        .to_pandas().sort_values("i")
    )
    assert out["v"].tolist()[0] == 10.0      # next at/after 00:10
    assert out["v"].tolist()[1] == 10.0      # exact match allowed
    assert pd.isna(out["v"].tolist()[2])     # nothing after 03:00


def test_set_op_intersect_except(ray_session):
    """Distinct set semantics, NULL-safe equality, both exchanges; an
    empty result keeps its schema."""
    import ray.data as rd

    from transmog_ray.functions.relational import set_op

    a_rows = [{"k": "x", "v": 1}, {"k": "x", "v": 1}, {"k": "y", "v": 2},
              {"k": None, "v": 3}, {"k": "z", "v": 9}]
    b_rows = [{"k": "x", "v": 1}, {"k": None, "v": 3}, {"k": "w", "v": 7}]
    for exchange in ("tasks", "groupby"):
        a, b = rd.from_items(a_rows), rd.from_items(b_rows)
        got = (set_op(a, b, "intersect", num_buckets=3, exchange=exchange)
               .to_pandas().sort_values("v").reset_index(drop=True))
        # distinct rows present in both; NULL == NULL
        assert got["v"].tolist() == [1, 3], exchange
        assert got["k"].tolist()[0] == "x" and pd.isna(got["k"].iloc[1])
        a, b = rd.from_items(a_rows), rd.from_items(b_rows)
        got = (set_op(a, b, "except", num_buckets=3, exchange=exchange)
               .to_pandas().sort_values("v").reset_index(drop=True))
        assert got["v"].tolist() == [2, 9], exchange
    # empty intersect of disjoint inputs
    a = rd.from_items([{"k": "x"}])
    b = rd.from_items([{"k": "y"}])
    empty = set_op(a, b, "intersect", num_buckets=2).to_pandas()
    assert len(empty) == 0

    import pytest
    with pytest.raises(ValueError, match="intersect"):
        set_op(a, b, "union")


def test_line_quality_filter_hand_case():
    from transmog_ray.functions.text import line_quality_filter

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "good solid line\nbad the line\nok line too\nshort",
            "lorem ipsum junk\nonly one good line here",  # 1 survivor → dropped
            None,                                          # null text → dropped
            "alpha beta gamma\ndelta epsilon zeta",
        ],
    })
    out = line_quality_filter(
        df, min_words=3, blocklist=("the", "lorem"), min_lines=2
    ).sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 4]
    assert out.loc[0, "text"] == "good solid line\nok line too"
    assert out.loc[0, "n_lines"] == 2
    assert out.loc[1, "n_lines"] == 2
    # empty batch keeps schema
    empty = line_quality_filter(df.iloc[:0])
    assert list(empty.columns) == ["doc_id", "text", "n_lines"]


def test_standardizer_train_only_fit(ray_session):
    """Stats come from the fitted subset only (leakage check), nulls
    skipped, zero-variance column yields NULL z, all-null raises."""
    import pytest
    import ray.data as rd

    from transmog_ray.functions.scaling import (
        apply_standardizer, fit_standardizer,
    )

    train = rd.from_items([{"x": 1, "c": 5}, {"x": 3, "c": 5}])
    stats = fit_standardizer(train, ["x", "c"])
    assert stats["x"] == (2.0, 1.0)
    assert stats["c"][1] == 0.0
    allrows = rd.from_items(
        [{"x": 1, "c": 5}, {"x": 3, "c": 5}, {"x": 100, "c": 5}]
    )
    out = apply_standardizer(allrows, stats).to_pandas()
    # the x=100 holdout row is scaled by TRAIN stats, not its own
    assert out["x_z"].tolist() == [-1.0, 1.0, 98.0]
    assert out["c_z"].isna().all()

    with_null = rd.from_items([{"x": 2.0, "y": None}, {"x": None, "y": None}])
    s2 = fit_standardizer(with_null, ["x"])
    assert s2["x"] == (2.0, 0.0)
    with pytest.raises(ValueError, match="no values"):
        fit_standardizer(with_null, ["y"])


def test_pagerank_matches_dense_oracle(ray_session):
    """Distributed power iteration == dense numpy iteration on a small
    random digraph (duplicate edges collapse; asymmetric degrees)."""
    import ray.data as rd

    from transmog_ray.functions.graph import pagerank

    rng = np.random.default_rng(7)
    n_nodes = 12
    raw = [(int(a), int(b)) for a, b in rng.integers(0, n_nodes, (60, 2))
           if a != b]
    edges = pd.DataFrame(raw, columns=["src", "dst"]).drop_duplicates()
    got = (
        pagerank(rd.from_pandas(pd.DataFrame(raw, columns=["src", "dst"])),
                 iterations=3, num_buckets=4)
        .to_pandas().set_index("node")["pr"]
    )
    # dense oracle
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = edges.groupby("src").size()
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        nxt = np.full(n, 0.15 / n)
        for s, d in edges.itertuples(index=False):
            nxt[idx[d]] += 0.85 * r[idx[s]] / outdeg[s]
        r = nxt
    for v in nodes:
        assert np.isclose(got[v], r[idx[v]], rtol=1e-9), v
    assert np.isclose(got.sum(), r.sum())


def test_pack_offsets_hand_case(ray_session):
    """Boundary-start packing: prefix-before // budget, independent
    per stream, deterministic across exchanges."""
    import ray.data as rd

    from transmog_ray.functions.packing import pack_offsets
    from transmog_ray.functions.sampling import knuth_hash

    docs = pd.DataFrame({"doc_id": np.arange(64, dtype=np.int64),
                         "tok": np.full(64, 6, dtype=np.int64)})
    outs = {}
    # num_streams=8: several stream ids hash to the SAME physical bucket
    # on the groupby exchange — packing must still be per-stream
    for exchange in ("tasks", "groupby"):
        out = (
            pack_offsets(rd.from_pandas(docs), "doc_id", "tok", budget=10,
                         num_streams=8, exchange=exchange)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        outs[exchange] = out
        assert (out["stream"].to_numpy()
                == (knuth_hash(out["doc_id"].to_numpy()) % 8).astype(int)).all()
        for s, g in out.groupby("stream"):
            g = g.sort_values("doc_id")
            cum = np.cumsum(g["tok"].to_numpy()) - g["tok"].to_numpy()
            assert (g["pack_no"].to_numpy() == cum // 10).all()
            assert (g["pack_pos"].to_numpy() == cum % 10).all()
    pd.testing.assert_frame_equal(
        outs["tasks"][sorted(outs["tasks"].columns)],
        outs["groupby"][sorted(outs["groupby"].columns)],
    )


def test_heavy_hitters_exact_vs_brute(ray_session):
    """Pigeonhole candidates + exact recount == brute-force HAVING, on
    skewed data split across many blocks (a hitter need not be hot in
    every block)."""
    import ray.data as rd

    from transmog_ray.functions.skew import heavy_hitters

    rng = np.random.default_rng(3)
    # zipf-ish: a few hot users + a long uniform tail
    keys = np.concatenate([
        np.repeat([1, 2], [300, 120]),
        rng.integers(100, 400, 600),
    ])
    rng.shuffle(keys)
    df = pd.DataFrame({"user_id": keys.astype(np.int64)})
    ds = rd.from_pandas(df).repartition(8).materialize()
    t = 0.02
    got = (heavy_hitters(ds, "user_id", share=t, num_buckets=4)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    brute = df.groupby("user_id").size().rename("n").reset_index()
    brute = brute[brute["n"] >= t * len(df)].sort_values(
        "user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64"}), brute.astype({"n": "int64"})
    )
    assert {1, 2} <= set(got["user_id"])


def test_bpe_token_count_pattern():
    """Mixed-content tokenization: letter/digit/punct runs with optional
    leading space, matching the documented RE2-safe pattern."""
    from transmog_ray.functions.text import BpeTokenCount

    stage = BpeTokenCount()
    df = pd.DataFrame({"text": [
        "Hello, world! 42 foo_bar",   # Hello , _world !( ...) → 8
        "",                            # empty → 0
        None,                          # null → 0
        "abc123def",                   # abc|123|def → 3
    ]})
    out = stage(df.copy())
    assert out["n_bpe_tokens"].tolist() == [8, 0, 0, 3]


def test_rollup_integer_keys_roundtrip(ray_session):
    """Integer grouping keys survive the null-padded coarse exchange:
    values come back exact (within the documented 2^53 contract) and
    subtotal rows carry real NULLs."""
    import ray.data as rd

    from transmog_ray.functions.relational import rollup_agg

    rows = [
        {"k1": 1_000_000_007, "k2": 2, "v": 1.0},
        {"k1": 1_000_000_007, "k2": 3, "v": 2.0},
        {"k1": 4, "k2": 2, "v": 4.0},
    ]
    out = rollup_agg(rd.from_items(rows), ["k1", "k2"],
                     {"s": ("v", "sum")}, num_buckets=4).to_pandas()
    assert len(out) == 3 + 2 + 1
    sub = out[out["k2"].isna() & out["k1"].notna()]
    assert sorted(sub["k1"].astype("int64")) == [4, 1_000_000_007]
    assert sorted(sub["s"]) == [3.0, 4.0]
    assert out[out["k1"].isna()]["s"].iloc[0] == 7.0


def test_global_percent_rank_ties_and_nulls(ray_session):
    """Exact (rank-1)/(N-1) with tie groups sharing the min rank; nulls
    rank NULL; single-row edge returns 0."""
    import ray.data as rd

    from transmog_ray.functions.relational import global_percent_rank

    df = pd.DataFrame({"x": [10.0, 10.0, 5.0, 20.0, None]})
    out = global_percent_rank(
        rd.from_pandas(df), "x", num_buckets=2
    ).to_pandas()
    m = out.set_index("x")["pct_rank"]
    assert m[5.0] == 0.0
    assert (out.loc[out["x"] == 10.0, "pct_rank"] == 1 / 3).all()
    assert m[20.0] == 3 / 3
    assert out.loc[out["x"].isna(), "pct_rank"].isna().all()
    one = global_percent_rank(
        rd.from_pandas(pd.DataFrame({"x": [7.0]})), "x", num_buckets=1
    ).to_pandas()
    assert one["pct_rank"].iloc[0] == 0.0


def test_standardizer_exact_beyond_int64_squares(ray_session):
    """x² beyond int64 must not wrap: sums accumulate in Python ints
    (shipped as strings through the Arrow boundary)."""
    import ray.data as rd

    from transmog_ray.functions.scaling import fit_standardizer

    big = 4_000_000_000  # big² = 1.6e19 > int64 max
    stats = fit_standardizer(
        rd.from_items([{"x": big}, {"x": big + 2}]), ["x"]
    )
    assert stats["x"] == (big + 1.0, 1.0)


def test_hashed_term_counts_hand_case():
    """Bucket = md5-prefix % dim; counts per (doc, bucket); null text
    and empty batch keep schema."""
    import hashlib

    from transmog_ray.functions.text import hashed_term_counts

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["web web page", None]})
    out = hashed_term_counts(df, dim=8).sort_values("bucket")
    b_web = int(hashlib.md5(b"web").hexdigest()[:8], 16) % 8
    b_page = int(hashlib.md5(b"page").hexdigest()[:8], 16) % 8
    got = out.set_index("bucket")["n"].to_dict()
    assert got[b_web] == 2 and got[b_page] == 1
    assert (out["doc_id"] == 1).all()
    empty = hashed_term_counts(df.iloc[:0])
    assert list(empty.columns) == ["doc_id", "bucket", "n"]


def test_bm25_scores_match_loop(ray_session):
    """Rational-idf BM25 == per-doc loop oracle; null docs skipped;
    unmatched docs emit no row."""
    import math

    import ray.data as rd

    from transmog_ray.functions.text import bm25_scores

    docs = [
        {"doc_id": 1, "text": "ray data ray engine"},
        {"doc_id": 2, "text": "spark only here"},
        {"doc_id": 3, "text": "nothing relevant"},
        {"doc_id": 4, "text": None},
    ]
    terms = ("ray", "spark")
    got = (bm25_scores(rd.from_items(docs).materialize(), terms)
           .to_pandas().set_index("doc_id")["bm25"])
    texts = {d["doc_id"]: d["text"] for d in docs if d["text"] is not None}
    n = len(texts)
    avglen = sum(len(t.split(" ")) for t in texts.values()) / n
    dfreq = {t: sum(t in txt.split(" ") for txt in texts.values())
             for t in terms}
    for did, txt in texts.items():
        ws = txt.split(" ")
        expect = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf:
                idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
                expect += idf * tf * (1.2 + 1.0) / (
                    tf + 1.2 * (1.0 - 0.75 + 0.75 * len(ws) / avglen))
        if expect:
            assert math.isclose(got[did], expect, rel_tol=1e-12), did
        else:
            assert did not in got.index
    assert 4 not in got.index


def test_dup_ngram_fraction_hand_case(ray_session):
    """Trigram corpus counts: a doc fully made of corpus-repeated
    trigrams scores 1.0; a unique doc scores 0; short docs emit no row."""
    import ray.data as rd

    from transmog_ray.functions.text import dup_ngram_fraction

    docs = [
        {"doc_id": 1, "text": "a b c d"},     # grams: 'a b c', 'b c d'
        {"doc_id": 2, "text": "a b c"},       # gram: 'a b c' (shared)
        {"doc_id": 3, "text": "x y z w"},     # unique grams
        {"doc_id": 4, "text": "too short"},   # < 3 tokens → no row
    ]
    out = (dup_ngram_fraction(rd.from_items(docs), n=3, num_buckets=3)
           .to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_grams"] == 2 and out.loc[1, "n_dup"] == 1
    assert out.loc[1, "dup_frac"] == 0.5
    assert out.loc[2, "dup_frac"] == 1.0
    assert out.loc[3, "dup_frac"] == 0.0
    assert 4 not in out.index


def test_gopher_rules_hand_case():
    from transmog_ray.functions.text import gopher_rules

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            # passes every rule: 30 short DISTINCT words (no repeated
            # bigrams) incl. 2 distinct stopwords
            " ".join(["a", "the"] + [f"w{i}" for i in range(28)]),
            # too short
            "the a short one",
            # enough words but only 1 distinct stopword
            " ".join(["the"] + [f"x{i}" for i in range(35)]),
            # repetition: one bigram dominates
            " ".join(["a", "the"] + ["dup"] * 40),
        ],
    })
    out = gopher_rules(df).set_index("doc_id")
    assert out.loc[1, "keep"] == 1
    assert out.loc[2, "keep"] == 0 and out.loc[2, "n_words"] == 4
    assert out.loc[3, "keep"] == 0 and out.loc[3, "n_stop_distinct"] == 1
    assert out.loc[4, "keep"] == 0 and out.loc[4, "dup_bigram_frac"] > 0.9
    # null text → empty-string semantics, never a crash
    out2 = gopher_rules(pd.DataFrame({"doc_id": [9], "text": [None]}))
    assert out2["keep"].tolist() == [0] and out2["dup_bigram_frac"].tolist() == [0.0]


def test_heavy_hitters_empty_result_keeps_schema(ray_session):
    """sf0.1 regression: when NO key reaches the local threshold in any
    batch, the result must be a typed empty (key, n) frame — a zero-row
    Ray Dataset loses its columns through to_pandas(), so the provably-
    empty case returns pandas directly."""
    import ray.data as rd

    from transmog_ray.functions.skew import heavy_hitters

    df = pd.DataFrame({"user_id": np.arange(1000) % 500, "v": 1.0})
    ds = rd.from_pandas(df).materialize()
    out = heavy_hitters(ds, "user_id", share=0.5, num_buckets=4)
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert list(out.columns) == ["user_id", "n"]
    assert len(out) == 0 and out["user_id"].dtype == np.int64


def test_ordered_scan_range_peer_semantics(ray_session):
    """Global prefix sum with SQL RANGE-frame ties: equal order values
    all carry the sum through the WHOLE peer group."""
    import ray.data as rd

    from transmog_ray.functions.relational import ordered_scan

    rng = np.random.default_rng(23)
    keys = rng.permutation(np.repeat(np.arange(200), rng.integers(1, 4, 200)))
    df = pd.DataFrame({
        "k": keys,
        "v": rng.integers(1, 10, len(keys)).astype("int64"),
    })
    out = (
        ordered_scan(rd.from_pandas(df), "k", "v", out_col="run",
                     num_buckets=5)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    # oracle: pandas sort + cumsum, then peer-group max
    want = df.sort_values("k", kind="mergesort").reset_index(drop=True)
    want["run"] = want["v"].cumsum()
    want["run"] = want.groupby("k")["run"].transform("max")
    want = want.sort_values(["k", "v"]).reset_index(drop=True)
    assert len(out) == len(want)
    assert (out["run"].to_numpy() == want["run"].to_numpy()).all()


def test_concat_block_spans_hand_case(ray_session):
    """Docs of 30/50/40 tokens into 60-token blocks: doc 2 crosses the
    first boundary (spans blocks 0 and 1), doc 3 crosses the second."""
    import ray.data as rd

    from transmog_ray.functions.packing import concat_block_spans

    df = pd.DataFrame({"doc_id": [1, 2, 3], "n": [30, 50, 40]})
    out = (
        concat_block_spans(rd.from_pandas(df), "doc_id", "n",
                           block_tokens=60, num_buckets=2)
        .to_pandas().sort_values(["doc_id", "block_id"]).reset_index(drop=True)
    )
    rows = list(zip(out["doc_id"], out["block_id"], out["tok_start"], out["tok_end"]))
    assert rows == [
        (1, 0, 0, 30),          # tokens 0-30
        (2, 0, 0, 30), (2, 1, 30, 50),   # tokens 30-80 cross block 0|1
        (3, 1, 0, 40),          # tokens 80-120 fit block 1 exactly
    ]
    # spans tile each doc completely
    spans = out.groupby("doc_id").apply(
        lambda g: (g["tok_end"] - g["tok_start"]).sum(), include_groups=False
    )
    assert dict(spans) == {1: 30, 2: 50, 3: 40}


def test_triangle_counts_matches_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from transmog_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(41)
    n = 40
    # random graph incl. duplicate + reversed edges (function canonicalizes)
    raw = rng.integers(0, n, size=(400, 2))
    raw = raw[raw[:, 0] != raw[:, 1]]
    edges = pd.DataFrame({"src": raw[:, 0], "dst": raw[:, 1]})
    got = (
        triangle_counts(rd.from_pandas(edges), num_buckets=4)
        .to_pandas().set_index("node")["n_triangles"].to_dict()
    )
    eset = {tuple(sorted(e)) for e in raw}
    want: dict = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in eset and (a, c) in eset and (b, c) in eset:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want
    assert sum(want.values()) > 0  # the graph really has triangles
