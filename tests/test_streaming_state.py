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
