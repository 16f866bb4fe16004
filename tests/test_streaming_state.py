"""Incremental (actor-state) sessionization equals the batch operator."""

from __future__ import annotations

import numpy as np
import pandas as pd

from transmog_ray.stages.window import sessionize
from transmog_ray.state.streaming import SessionState, streaming_sessionize


def make_log(n=600, seed=4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 17, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.sort(rng.integers(0, 50_000, n)), unit="s"),
            "event_id": np.arange(n),
        }
    )
    return df


def batch_expected(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    out["user_id_str"] = out["user_id"]
    return sessionize(out, "user_id", "ts", gap_seconds=600).drop(
        columns=["user_id_str"]
    )


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)[
        ["user_id", "ts", "event_id", "session_seq", "session_id"]
    ]


def test_incremental_state_matches_batch():
    log = make_log()
    state = SessionState("user_id", "ts", 600)
    outs = [
        state.process(chunk)
        for _, chunk in log.groupby(np.arange(len(log)) // 50, sort=True)
    ]
    got = canon(pd.concat(outs, ignore_index=True))
    expect = canon(batch_expected(make_log()))
    pd.testing.assert_frame_equal(got, expect)
    # open-session state covers every key
    assert set(state.open_sessions()["user_id"]) == set(log["user_id"].unique())


def test_streaming_actor_pool_matches_batch(ray_session):
    log = make_log(400, seed=9)
    chunks = [chunk for _, chunk in log.groupby(np.arange(len(log)) // 40, sort=True)]
    outs = list(
        streaming_sessionize(chunks, "user_id", "ts", gap_seconds=600, num_buckets=4)
    )
    got = canon(pd.concat(outs, ignore_index=True))
    expect = canon(batch_expected(make_log(400, seed=9)))
    pd.testing.assert_frame_equal(got, expect)


def test_watermark_tracker():
    from transmog_ray.state.streaming import WatermarkTracker

    wm = WatermarkTracker("ts", allowed_lateness_s=10)
    t0 = pd.Timestamp("2024-01-01")
    b1 = pd.DataFrame({"ts": [t0, t0 + pd.Timedelta(seconds=100)]})
    on_time, late = wm.split(b1)
    assert len(on_time) == 2 and late.empty  # first batch: no watermark yet
    assert wm.watermark == t0 + pd.Timedelta(seconds=90)

    # a row older than watermark (100 - 10 = 90s) is flagged late
    b2 = pd.DataFrame({"ts": [t0 + pd.Timedelta(seconds=50),
                              t0 + pd.Timedelta(seconds=95),
                              t0 + pd.Timedelta(seconds=200)]})
    on_time, late = wm.split(b2)
    assert late["ts"].tolist() == [t0 + pd.Timedelta(seconds=50)]
    assert len(on_time) == 2
    assert wm.watermark == t0 + pd.Timedelta(seconds=190)


def test_watermark_survives_empty_and_allnat_batches():
    import pandas as pd

    from transmog_ray.state.streaming import WatermarkTracker

    w = WatermarkTracker("ts", allowed_lateness_s=0.0)
    empty = pd.DataFrame({"ts": pd.Series([], dtype="datetime64[ns]")})
    w.split(empty)                       # must not set max_ts to NaT
    assert w.max_ts is None
    allnat = pd.DataFrame({"ts": pd.to_datetime([None, None])})
    w.split(allnat)
    assert w.max_ts is None
    ok = pd.DataFrame({"ts": pd.to_datetime(["2026-01-02", "2026-01-03"])})
    on_time, late = w.split(ok)
    assert len(on_time) == 2
    # the guard is actually live afterwards: earlier rows are late now
    old = pd.DataFrame({"ts": pd.to_datetime(["2026-01-01"])})
    on_time, late = w.split(old)
    assert len(late) == 1 and len(on_time) == 0


def _batch_tumbling(df, key, ts, value, window_s):
    import numpy as np

    ts_ns = df[ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
    win_ns = np.int64(window_s * 1e9)
    win = (ts_ns // win_ns) * win_ns
    g = (
        df.assign(window_start=pd.to_datetime(win))
        .groupby([key, "window_start"], sort=False)[value]
        .agg(["count", "sum", "min", "max"])
        .reset_index()
        .rename(columns={"count": "n", "sum": "sum_value",
                         "min": "min_value", "max": "max_value"})
    )
    g["n"] = g["n"].astype("int64")
    return g.sort_values([key, "window_start"]).reset_index(drop=True)


def test_streaming_tumbling_matches_batch(ray_session):
    import numpy as np

    from transmog_ray.state.streaming import streaming_tumbling

    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 40_000, n)), unit="s"),
        "value": np.round(rng.uniform(0, 50, n), 3),
    })
    batches = [df.iloc[i:i + 250] for i in range(0, n, 250)]
    out = pd.concat(
        list(streaming_tumbling(batches, "user_id", "ts", "value", 3600,
                                num_buckets=4)),
        ignore_index=True,
    ).sort_values(["user_id", "window_start"]).reset_index(drop=True)
    want = _batch_tumbling(df, "user_id", "ts", "value", 3600)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_tumbling_state_bounded_and_incremental_emission():
    from transmog_ray.state.streaming import TumblingWindowState

    st = TumblingWindowState("k", "ts", "v", window_seconds=60)
    t0 = pd.Timestamp("2024-01-01")

    def batch(offsets, vals):
        return pd.DataFrame({"k": ["a"] * len(offsets),
                             "ts": [t0 + pd.Timedelta(seconds=s) for s in offsets],
                             "v": vals})

    out1 = st.process(batch([0, 10, 20], [1.0, 2.0, 3.0]))
    assert len(out1) == 0  # watermark at :20, window [0,60) still open
    out2 = st.process(batch([70], [4.0]))
    # watermark at :70 closes window 0
    assert len(out2) == 1 and out2.iloc[0]["n"] == 3
    assert out2.iloc[0]["sum_value"] == 6.0
    assert len(st.partials) == 1  # only the open window is state

    # a row for the already-emitted window is dropped and counted
    out3 = st.process(batch([5], [99.0]))
    assert st.dropped_late == 1
    assert len(out3) == 0
    fin = st.flush()
    assert len(fin) == 1 and fin.iloc[0]["n"] == 1
    assert st.partials == {}


def test_tumbling_allowed_lateness_keeps_window_open():
    from transmog_ray.state.streaming import TumblingWindowState

    st = TumblingWindowState("k", "ts", "v", window_seconds=60,
                             allowed_lateness_s=30)
    t0 = pd.Timestamp("2024-01-01")
    df1 = pd.DataFrame({"k": ["a"], "ts": [t0], "v": [1.0]})
    df2 = pd.DataFrame({"k": ["a"], "ts": [t0 + pd.Timedelta(seconds=70)],
                        "v": [2.0]})
    late = pd.DataFrame({"k": ["a"], "ts": [t0 + pd.Timedelta(seconds=50)],
                         "v": [3.0]})
    assert len(st.process(df1)) == 0
    assert len(st.process(df2)) == 0  # watermark 70-30=40 < window end 60
    assert len(st.process(late)) == 0  # still accepted (window open)
    fin = st.flush()
    w0 = fin[fin["window_start"] == t0]
    assert w0.iloc[0]["n"] == 2 and w0.iloc[0]["sum_value"] == 4.0
    assert st.dropped_late == 0


def test_session_state_rejects_late_rows():
    """VERDICT r2 item 5: with the watermark armed, a row behind the
    watermark is dropped and counted, not sessionized out of order."""
    state = SessionState("user_id", "ts", 600, allowed_lateness_s=0.0)
    t0 = pd.Timestamp("2024-01-01")
    b1 = pd.DataFrame({"user_id": [1, 2], "ts": [t0, t0 + pd.Timedelta("100s")],
                       "event_id": [0, 1]})
    out1 = state.process(b1)
    assert len(out1) == 2 and state.dropped_late == 0
    # second batch: one on-time row, one behind the watermark
    b2 = pd.DataFrame({
        "user_id": [1, 1],
        "ts": [t0 + pd.Timedelta("200s"), t0 - pd.Timedelta("1h")],
        "event_id": [2, 3],
    })
    out2 = state.process(b2)
    assert list(out2["event_id"]) == [2]
    assert state.dropped_late == 1
    # the surviving row continued session 0 of user 1
    assert out2["session_seq"].iloc[0] == 0


def test_session_state_vectorized_matches_unguarded():
    """The vectorized carry-in kernel must equal the batch sessionize on
    chunked feeds regardless of chunk size."""
    for chunk in (7, 50, 311):
        log = make_log(300, seed=12)
        state = SessionState("user_id", "ts", 600)
        outs = [
            state.process(c)
            for _, c in log.groupby(np.arange(len(log)) // chunk, sort=True)
        ]
        got = canon(pd.concat(outs, ignore_index=True))
        expect = canon(batch_expected(make_log(300, seed=12)))
        pd.testing.assert_frame_equal(got, expect)


def _batch_hopping(df, key, ts, value, window_s, hop_s):
    import numpy as np

    ts_ns = df[ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
    win_ns, hop_ns = np.int64(window_s * 1e9), np.int64(hop_s * 1e9)
    nw = int(win_ns // hop_ns)
    win = (ts_ns // hop_ns) * hop_ns
    win = (win[:, None] - hop_ns * np.arange(nw)[None, :]).reshape(-1)
    rep = df.loc[df.index.repeat(nw)].reset_index(drop=True)
    g = (
        rep.assign(window_start=pd.to_datetime(win))
        .groupby([key, "window_start"], sort=False)[value]
        .agg(["count", "sum", "min", "max"])
        .reset_index()
        .rename(columns={"count": "n", "sum": "sum_value",
                         "min": "min_value", "max": "max_value"})
    )
    g["n"] = g["n"].astype("int64")
    return g.sort_values([key, "window_start"]).reset_index(drop=True)


def test_streaming_hopping_matches_batch(ray_session):
    import numpy as np

    from transmog_ray.state.streaming import streaming_tumbling

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 8, n).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 30_000, n)), unit="s"),
        "value": np.round(rng.uniform(0, 50, n), 3),
    })
    batches = [df.iloc[i:i + 200] for i in range(0, n, 200)]
    out = pd.concat(
        list(streaming_tumbling(batches, "user_id", "ts", "value", 3600,
                                num_buckets=4, hop_seconds=900)),
        ignore_index=True,
    ).sort_values(["user_id", "window_start"]).reset_index(drop=True)
    want = _batch_hopping(df, "user_id", "ts", "value", 3600, 900)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_hopping_state_rejects_nondivisible_hop():
    import pytest

    from transmog_ray.state.streaming import TumblingWindowState

    with pytest.raises(ValueError, match="multiple"):
        TumblingWindowState("k", "ts", "v", window_seconds=60, hop_seconds=25)


def test_streaming_dedup_equals_batch_within_horizon():
    """In-order stream, all dups inside the horizon: output == batch
    keep-first dedup; beyond-horizon repeats re-admit (the documented
    bounded-state tradeoff); late rows are dropped and counted."""
    from transmog_ray.stages.dedup import dedup_exact  # noqa: F401 (parity context)
    from transmog_ray.state.streaming import StreamingDedupState

    t0 = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "k": ["a", "b", "a", "c", "b", "a"],
        "ts": [t0, t0 + pd.Timedelta(seconds=10),
               t0 + pd.Timedelta(seconds=20),   # dup of a → suppressed
               t0 + pd.Timedelta(seconds=30),
               t0 + pd.Timedelta(seconds=40),   # dup of b → suppressed
               t0 + pd.Timedelta(seconds=5000)],  # a beyond horizon → re-admitted
    })
    st = StreamingDedupState("k", "ts", horizon_seconds=100)
    out = pd.concat([st.process(rows.iloc[i:i + 2]) for i in range(0, 6, 2)])
    assert out["k"].tolist() == ["a", "b", "c", "a"]
    # batch keep-first over the first 5 rows (all within horizon) agrees
    assert out.iloc[:3]["k"].tolist() == (
        rows.iloc[:5].drop_duplicates("k")["k"].tolist()
    )
    # eviction bounded the state: only the recent 'a' survives
    assert set(st.seen.keys()) == {"a"}
    # a late row (behind the watermark) is dropped, not re-emitted
    late = pd.DataFrame({"k": ["z"], "ts": [t0]})
    assert len(st.process(late)) == 0
    assert st.dropped_late == 1


def test_streaming_dedup_no_rewind_and_null_keys():
    """An on-time OUT-OF-ORDER occurrence must not rewind the
    suppression window; null keys dedup like any other key."""
    from transmog_ray.state.streaming import StreamingDedupState

    t0 = pd.Timestamp("2024-01-01")
    st = StreamingDedupState("k", "ts", horizon_seconds=60,
                             allowed_lateness_s=60)
    b1 = pd.DataFrame({"k": ["a"], "ts": [t0 + pd.Timedelta(seconds=100)]})
    assert len(st.process(b1)) == 1
    # on-time (within lateness) but BEFORE the emission: suppressed,
    # and must not rewind seen[a] from 100 to 50
    b2 = pd.DataFrame({"k": ["a"], "ts": [t0 + pd.Timedelta(seconds=50)]})
    assert len(st.process(b2)) == 0
    b3 = pd.DataFrame({"k": ["a"], "ts": [t0 + pd.Timedelta(seconds=120)]})
    assert len(st.process(b3)) == 0  # 20s after emission — still inside

    st2 = StreamingDedupState("k", "ts", horizon_seconds=1000)
    n1 = pd.DataFrame({"k": [None, None],
                       "ts": [t0, t0 + pd.Timedelta(seconds=1)]})
    assert len(st2.process(n1)) == 1  # nulls group: one novel row
    n2 = pd.DataFrame({"k": [None], "ts": [t0 + pd.Timedelta(seconds=2)]})
    assert len(st2.process(n2)) == 0  # still suppressed across batches


# ------------------------------------------------------ streaming as-of


def ts(seconds):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=seconds)


def test_streaming_asof_matches_batch():
    """Events + features replayed in interleaved in-order batches; the
    concatenated emissions (+ flush) must equal the batch as-of join,
    with zero temporal leakage at every emission."""
    from itertools import zip_longest

    from transmog_ray.stages.asof import _merge_asof
    from transmog_ray.state.streaming import StreamingAsofState

    rng = np.random.default_rng(17)
    feats = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 60),
        "ft": [ts(int(s)) for s in rng.integers(0, 2000, 60)],
        "v": rng.normal(size=60),
    }).drop_duplicates(["k", "ft"]).sort_values("ft").reset_index(drop=True)
    events = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 200),
        "t": [ts(int(s)) for s in rng.integers(0, 2200, 200)],
    }).sort_values("t").reset_index(drop=True)

    st = StreamingAsofState("k", "t", "ft", ["v"])
    fbatches = [feats.iloc[i:i + 10] for i in range(0, len(feats), 10)]
    ebatches = [events.iloc[i:i + 25] for i in range(0, len(events), 25)]
    outs = []
    for fb, eb in zip_longest(fbatches, ebatches):
        if fb is not None:
            st.add_features(fb)
        out = st.process(eb)
        if len(out):
            # leakage check at EVERY emission, not just the end state
            m = out["ft"].notna()
            assert (out.loc[m, "ft"] <= out.loc[m, "t"]).all()
            outs.append(out)
    outs.append(st.flush())
    got = (
        pd.concat(outs, ignore_index=True)
        .sort_values(["k", "t"], kind="mergesort").reset_index(drop=True)
    )
    want = _merge_asof(events, feats, "k", "t", "ft", ["v"], None).sort_values(
        ["k", "t"], kind="mergesort"
    ).reset_index(drop=True)
    assert len(got) == len(want) == len(events)
    assert np.allclose(
        got["v"].to_numpy(float), want["v"].to_numpy(float), equal_nan=True
    )


def test_streaming_asof_bounded_state_and_late_drops():
    from transmog_ray.state.streaming import StreamingAsofState

    st = StreamingAsofState("k", "t", "ft", ["v"], event_horizon_s=5.0)
    st.add_features(pd.DataFrame({
        "k": ["a"] * 5, "ft": [ts(i) for i in range(5)],
        "v": [float(i) for i in range(5)],
    }))
    # watermark jumps to 100: everything before 95 is event-late
    st.add_features(pd.DataFrame({"k": ["a"], "ft": [ts(100)], "v": [99.0]}))
    out = st.process(pd.DataFrame({"k": ["a", "a"], "t": [ts(1), ts(97)]}))
    assert st.dropped_late_events == 1  # t=1 behind the horizon
    assert list(out["t"]) == [ts(97)]
    assert out["v"].iloc[0] == 4.0  # latest feature <= 97 is ft=4
    # eviction: only the latest pre-bound feature per key survives
    assert len(st._consolidated()) == 2  # ft=4 (kept as latest old) + ft=100
    # a late FEATURE behind the watermark is dropped and counted
    st.add_features(pd.DataFrame({"k": ["a"], "ft": [ts(50)], "v": [50.0]}))
    assert st.dropped_late_features == 1


def test_streaming_asof_property_random_replays():
    """Property: for ANY chop of in-watermark-order streams into batches
    (random sizes, random feature/event interleaving), the union of
    emissions + flush equals the batch as-of join."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from transmog_ray.stages.asof import _merge_asof
    from transmog_ray.state.streaming import StreamingAsofState

    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.large_base_example,
                                     HealthCheck.data_too_large])
    @given(st.data())
    def run(data):
        rng = np.random.default_rng(data.draw(st.integers(0, 10_000)))
        nf, ne = rng.integers(5, 40), rng.integers(10, 80)
        feats = pd.DataFrame({
            "k": rng.choice(["a", "b"], nf),
            "ft": [ts(int(s)) for s in rng.integers(0, 500, nf)],
            "v": rng.normal(size=nf),
        }).drop_duplicates(["k", "ft"]).sort_values("ft").reset_index(drop=True)
        events = pd.DataFrame({
            "k": rng.choice(["a", "b"], ne),
            "t": [ts(int(s)) for s in rng.integers(0, 550, ne)],
        }).sort_values("t").reset_index(drop=True)

        st_obj = StreamingAsofState("k", "t", "ft", ["v"])
        outs = []
        fi = ei = 0
        while fi < len(feats) or ei < len(events):
            if data.draw(st.booleans()) and fi < len(feats):
                step = data.draw(st.integers(1, 12))
                st_obj.add_features(feats.iloc[fi:fi + step])
                fi += step
            elif ei < len(events):
                step = data.draw(st.integers(1, 20))
                out = st_obj.process(events.iloc[ei:ei + step])
                ei += step
                if len(out):
                    m = out["ft"].notna()
                    assert (out.loc[m, "ft"] <= out.loc[m, "t"]).all()
                    outs.append(out)
        outs.append(st_obj.flush())
        got = (
            pd.concat(outs, ignore_index=True)
            .sort_values(["k", "t"], kind="mergesort").reset_index(drop=True)
        )
        want = _merge_asof(
            events, feats, "k", "t", "ft", ["v"], None
        ).sort_values(["k", "t"], kind="mergesort").reset_index(drop=True)
        assert len(got) == len(events)
        assert np.allclose(got["v"].to_numpy(float), want["v"].to_numpy(float),
                           equal_nan=True)

    run()
