"""Property-based checks of the windowed operators against loop oracles —
random keys/timestamps with ties, duplicates and nulls."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from transmog_ray.stages.window import backfill, rolling_agg, sessionize, with_lag

FRAMES = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),            # key
        st.integers(min_value=0, max_value=2000),    # seconds offset (ties likely)
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),  # value
    ),
    min_size=1,
    max_size=60,
)


def build(rows) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=["k", "off", "v"])
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["off"], unit="s")
    df["rid"] = np.arange(len(df))
    return df.sort_values(["k", "ts", "rid"], kind="mergesort").reset_index(drop=True)


@settings(max_examples=80, deadline=None)
@given(rows=FRAMES)
def test_lag_matches_loop(rows):
    df = build(rows)
    out = with_lag(df.copy(), "k", ["v"])
    for key, g in df.groupby("k"):
        vals = g["v"].tolist()
        expect = [None] + vals[:-1]
        got = out[out["k"] == key]["v_lag1"].tolist()
        for a, b in zip(got, expect):
            assert (pd.isna(a) and (b is None or pd.isna(b))) or a == b


@settings(max_examples=80, deadline=None)
@given(rows=FRAMES, gap=st.integers(min_value=1, max_value=500))
def test_sessionize_matches_loop(rows, gap):
    df = build(rows)
    out = sessionize(df.copy(), "k", "ts", gap_seconds=gap)
    for key, g in df.groupby("k"):
        seq, prev = [], None
        s = -1
        for t in g["ts"]:
            if prev is None or (t - prev).total_seconds() > gap:
                s += 1
            seq.append(s)
            prev = t
        assert out[out["k"] == key]["session_seq"].tolist() == seq


@settings(max_examples=80, deadline=None)
@given(rows=FRAMES)
def test_backfill_matches_loop(rows):
    df = build(rows)
    out = backfill(df.copy(), "k", ["v"])
    for key, g in df.groupby("k"):
        expect, last = [], None
        for v in g["v"]:
            if v is not None and not pd.isna(v):
                last = v
            expect.append(last)
        got = out[out["k"] == key]["v_filled"].tolist()
        for a, b in zip(got, expect):
            assert (pd.isna(a) and b is None) or a == b


@settings(max_examples=60, deadline=None)
@given(rows=FRAMES, window=st.integers(min_value=1, max_value=1000))
def test_rolling_count_matches_loop(rows, window):
    df = build(rows)
    out = rolling_agg(df.copy(), "k", "ts", "v", window, aggs=("count",))
    col = f"v_w{window}s_count"
    for key, g in df.groupby("k"):
        times = g["ts"].tolist()
        vals = g["v"].tolist()
        # trailing [t-window, t] both-closed, SQL RANGE semantics: ALL
        # rows of the key with ts in the window count — peer rows at the
        # same timestamp included regardless of sort position
        expect = []
        for i, t in enumerate(times):
            n = sum(
                1
                for j in range(len(times))
                if 0 <= (t - times[j]).total_seconds() <= window
                and vals[j] is not None
                and not pd.isna(vals[j])
            )
            expect.append(n)
        got = out[out["k"] == key][col].astype(int).tolist()
        assert got == expect


def test_rolling_tied_timestamps_match_duckdb(ray_session):
    """Full rolling_events pipeline vs the DuckDB RANGE-frame oracle on a
    fixture that CONTAINS (user_id, ts) ties — peer rows must all see the
    whole tie group (SQL peer-inclusive semantics)."""
    import duckdb
    import ray.data as rd

    from transmog_ray.pipelines.queries import ROLL_WINDOW_S
    from transmog_ray.stages.partition import apply_sorted

    rng = np.random.default_rng(5)
    n = 400
    base = pd.Timestamp("2024-01-01")
    ts = base + pd.to_timedelta(rng.integers(0, 7200, n), unit="s")
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 8, n).astype(np.int64),
        "ts": ts.astype("datetime64[us]"),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })
    # force guaranteed exact ties within users
    ev.loc[1, ["user_id", "ts"]] = ev.loc[0, ["user_id", "ts"]]
    ev.loc[3, ["user_id", "ts"]] = ev.loc[2, ["user_id", "ts"]]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from transmog_ray.stages.window import rolling_agg

        df = rolling_agg(df, "user_id", "ts", "value", ROLL_WINDOW_S,
                         aggs=("count", "mean"))
        df[f"value_w{ROLL_WINDOW_S}s_count"] = df[
            f"value_w{ROLL_WINDOW_S}s_count"].astype("int64")
        return df

    got = (
        apply_sorted(rd.from_pandas(ev), ["user_id"], "ts", fn, num_buckets=4,
                     tiebreak=["event_id"])
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # raw (unrounded) RANGE-frame oracle: values compared with a float
    # tolerance — accumulation order differs between engines, a genuine
    # tie-semantics bug would differ by whole rows, not 1e-12
    sql = f"""
    SELECT event_id, user_id, ts, value,
           COUNT(value) OVER w AS value_w{ROLL_WINDOW_S}s_count,
           SUM(value) OVER w / COUNT(value) OVER w AS value_w{ROLL_WINDOW_S}s_mean
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL {ROLL_WINDOW_S} SECOND PRECEDING
                       AND CURRENT ROW)
    """
    con = duckdb.connect()
    con.register("events", ev)
    want = con.sql(sql).df().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, rtol=1e-9, atol=1e-9,
    )


@settings(max_examples=80, deadline=None)
@given(rows=FRAMES)
def test_running_agg_matches_loop(rows):
    from transmog_ray.stages.window import running_agg

    df = build(rows)
    out = running_agg(df.copy(), "k", "v", aggs=("sum", "count", "mean", "max", "min"))
    for key, g in df.groupby("k"):
        vals = g["v"].tolist()
        seen: list[float] = []
        for i, v in enumerate(vals):
            if v is not None and not pd.isna(v):
                seen.append(v)
            row = out[out["k"] == key].iloc[i]
            if not seen:  # all-null prefix: SQL NULL aggregates, count 0
                assert row["v_run_count"] == 0
                for c in ("v_run_sum", "v_run_mean", "v_run_max", "v_run_min"):
                    assert pd.isna(row[c])
            else:
                assert row["v_run_count"] == len(seen)
                assert np.isclose(row["v_run_sum"], sum(seen))
                assert np.isclose(row["v_run_mean"], sum(seen) / len(seen))
                assert row["v_run_max"] == max(seen)
                assert row["v_run_min"] == min(seen)


@settings(max_examples=60, deadline=None)
@given(rows=FRAMES)
def test_ewma_matches_loop(rows):
    from transmog_ray.stages.window import ewma

    df = build(rows)
    out = ewma(df.copy(), "k", "v", alpha=0.4)
    for key, g in df.groupby("k"):
        y = None
        got = out[out["k"] == key]["v_ewma0.4"].tolist()
        for i, v in enumerate(g["v"].tolist()):
            if v is not None and not pd.isna(v):
                y = v if y is None else 0.4 * v + 0.6 * y
            if y is None:
                assert pd.isna(got[i])
            else:
                assert np.isclose(got[i], y)


@settings(max_examples=80, deadline=None)
@given(rows=FRAMES)
def test_target_encode_matches_loop(rows):
    from transmog_ray.stages.window import target_encode

    df = build(rows)
    out = target_encode(df.copy(), "k", "v", out_col="pm")
    for key, g in df.groupby("k"):
        seen: list[float] = []
        got = out[out["k"] == key]["pm"].tolist()
        for i, v in enumerate(g["v"].tolist()):
            if not seen:  # no non-null PRIOR value → NULL, never own value
                assert pd.isna(got[i])
            else:
                assert np.isclose(got[i], sum(seen) / len(seen))
            if v is not None and not pd.isna(v):
                seen.append(v)


@settings(max_examples=80, deadline=None)
@given(rows=FRAMES)
def test_first_touch_matches_loop(rows):
    from transmog_ray.stages.window import first_touch

    df = build(rows)
    out = first_touch(df.copy(), "k", "v", "ts",
                      value_out="vf", since_out="us")
    for key, g in df.groupby("k"):
        o = out[out["k"] == key]
        first_v = g["v"].iloc[0]  # respects nulls: first ROW's value
        first_t = g["ts"].iloc[0]
        for i in range(len(g)):
            a = o["vf"].iloc[i]
            assert (pd.isna(a) and pd.isna(first_v)) or a == first_v
            want_us = int((g["ts"].iloc[i] - first_t).total_seconds() * 1e6)
            assert int(o["us"].iloc[i]) == want_us


@settings(max_examples=60, deadline=None)
@given(rows=FRAMES)
def test_running_distinct_matches_loop(rows):
    from transmog_ray.stages.window import running_distinct

    df = build(rows)
    # reuse v as a small categorical so duplicates are likely
    df["cat"] = df["v"].fillna(-1).astype(int) % 3
    out = running_distinct(df.copy(), "k", "cat", out_col="nd")
    for key, g in df.groupby("k"):
        seen: set = set()
        expect = []
        for c in g["cat"]:
            seen.add(c)
            expect.append(len(seen))
        assert out[out["k"] == key]["nd"].tolist() == expect


@settings(max_examples=25, deadline=None)
@given(
    a=st.lists(st.tuples(st.sampled_from(["x", "y", None]),
                         st.integers(0, 3)), max_size=12),
    b=st.lists(st.tuples(st.sampled_from(["x", "y", None]),
                         st.integers(0, 3)), max_size=12),
)
def test_set_op_matches_null_safe_oracle(ray_session, a, b):
    """INTERSECT/EXCEPT on random frames with nulls == a sentinel-based
    pandas oracle (NULL compares equal, distinct output)."""
    import ray.data as rd

    from transmog_ray.functions.relational import set_op

    fa = pd.DataFrame(a, columns=["k", "v"])
    fb = pd.DataFrame(b, columns=["k", "v"])

    def canon(df):
        return set(map(tuple, df.fillna("␀").itertuples(index=False)))

    sa, sb = canon(fa), canon(fb)
    for op, expect in (("intersect", sa & sb), ("except", sa - sb)):
        if len(fa) == 0:
            continue  # empty upstream: exchange returns empty, trivially right
        got = set_op(rd.from_pandas(fa), rd.from_pandas(fb), op,
                     num_buckets=2).to_pandas()
        assert canon(got) == expect, op
        assert len(got) == len(expect), op  # distinct rows only


def test_rows_window_agg_matches_loop_oracle():
    """ROWS k-PRECEDING frame vs a naive per-row window scan, incl. null
    values (skipped) and all-null windows (NULL sum/mean, count 0)."""
    import numpy as np
    import pandas as pd

    from transmog_ray.stages.window import rows_window_agg

    rng = np.random.default_rng(31)
    n = 300
    df = pd.DataFrame({
        "k": np.sort(rng.choice(["a", "b", "c"], n)),   # key-contiguous
        "v": np.where(rng.random(n) < 0.3, np.nan, rng.integers(0, 100, n)),
    })
    out = rows_window_agg(df.copy(), "k", "v", preceding=3,
                          aggs=("count", "sum", "mean"))
    pos = df.groupby("k").cumcount().to_numpy()
    for i in range(n):
        lo = i - min(pos[i], 3)
        w = df["v"].iloc[lo:i + 1]
        cnt, s = int(w.notna().sum()), w.sum()
        assert out["v_rows3_count"].iloc[i] == cnt
        if cnt == 0:
            assert pd.isna(out["v_rows3_sum"].iloc[i])
            assert pd.isna(out["v_rows3_mean"].iloc[i])
        else:
            assert abs(out["v_rows3_sum"].iloc[i] - s) < 1e-9
            assert abs(out["v_rows3_mean"].iloc[i] - s / cnt) < 1e-9
