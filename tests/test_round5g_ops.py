"""Round-5 seventh-batch operators: forward-horizon training labels,
multi-view PIT feature matrix, intra-session per-event features —
oracle pins at sf0.001 plus targeted semantics tests."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "orders", "embeddings",
              "supplier", "nation", "region", "customer", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["labels_horizon_events", "feature_matrix_events",
             "session_position_events"])
def test_round5g_oracle_pin(ray_session, name):
    from transmog_ray.pipelines import queries as q

    got = q.QUERIES[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(q.ORACLE_SQL[name])
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_labels_horizon_excludes_self_and_past(ray_session):
    """A purchase event's own row must not count toward its label, and
    strictly-past purchases never do — the forward window is (t, t+7d]."""
    from transmog_ray.pipelines import queries as q

    got = q.QUERIES["labels_horizon_events"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.user_id.notna()]
    # pick a user with >=2 purchases; the LAST purchase must have label 0
    # unless another purchase shares a later-or-equal... strictly later ts.
    p = ev[ev.event_type == "purchase"].sort_values(["user_id", "ts"])
    counts = p.groupby("user_id").size()
    uid = counts[counts >= 2].index[0]
    up = p[p.user_id == uid]
    last_ts = up.ts.max()
    last_rows = up[up.ts == last_ts]
    if len(last_rows) == 1:
        lab = got[got.event_id == last_rows.event_id.iloc[0]]
        assert int(lab.n_purch_next7d.iloc[0]) == 0
        assert int(lab.label.iloc[0]) == 0


def test_session_position_monotone(ray_session):
    """Within each (user, session), positions are 1..n, us_since_start
    is nondecreasing, and exactly one row has is_last=1 per session."""
    from transmog_ray.pipelines import queries as q

    got = q.QUERIES["session_position_events"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["event_id", "user_id", "ts"]]
    m = got.merge(ev, on="event_id")
    m = m[m.user_id.notna()].sort_values(["user_id", "ts", "event_id"])
    # reconstruct sessions from pos_in_session resets
    starts = (m.pos_in_session == 1).cumsum()
    m["sess"] = starts
    for _, g in list(m.groupby("sess"))[:50]:
        assert list(g.pos_in_session) == list(range(1, len(g) + 1))
        assert (np.diff(g.us_since_start.to_numpy()) >= 0).all()
        assert int(g.is_last.sum()) == 1
        assert int(g.is_last.iloc[-1]) == 1
        assert np.isnan(g.us_since_prev.iloc[0])
