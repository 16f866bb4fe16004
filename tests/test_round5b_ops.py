"""Round-5 second-batch operators, each pinned to its DuckDB oracle at
sf0.001 (plus semantic brute-force checks where the SQL alone is weak)."""

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
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["nation_trade_volume", "market_share_promo",
             "order_count_hist", "waiting_suppliers",
             "dormant_rich_customers", "trimmed_mean_segments",
             "followed_pairs", "wau_daily", "join_size_by_type",
             "trigram_diversity_docs", "clamped_balance_users",
             "throttled_events", "knn_confusion", "degree_assortativity",
             "curate_pages", "unconverted_events", "lang_profile_dots",
             "cheapest_supplier_per_part", "conversion_delay_quartiles",
             "theta_sketch_types", "fd_violations", "out_of_order_stats",
             "proportional_split_docs", "label_centroid_sums",
             "crawl_budget_allocation", "greedy_policy_replay",
             "bloom_fp_audit", "rolling_corr7_types",
             "repeat_purchase_parts", "part_supplier_hhi",
             "loo_target_encode", "churned_users", "salient_dims",
             "domain_staleness", "range_join_streaming", "hits_scores",
             "contract_violations_events", "top_prices_with_ties",
             "top_parts_share_nation", "value_gini_orders",
             "expanding_z_events", "hierarchical_median_lengths",
             "html_byte_stats", "hash_collision_stats",
             "activity_streaks"]
)
def test_new_query_matches_oracle(ray_session, name):
    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _canon(_oracle(ORACLE_SQL[name]))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_waiting_supplier_bruteforce(ray_session):
    """The per-order winner must be the literal argmax on (shipdate DESC,
    suppkey ASC) restricted to multi-supplier orders."""
    from transmog_ray.pipelines.queries import QUERIES

    got = (QUERIES["waiting_suppliers"](SF).to_pandas()
           .set_index("l_suppkey")["n_orders_won"].astype(int))
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    wins: dict[int, int] = {}
    for _, g in li.groupby("l_orderkey"):
        if g["l_suppkey"].nunique() < 2:
            continue
        g = g.sort_values(["l_shipdate", "l_suppkey"],
                          ascending=[False, True])
        w = int(g["l_suppkey"].iloc[0])
        wins[w] = wins.get(w, 0) + 1
    assert dict(got) == wins


def test_streaming_interval_equals_batch(ray_session):
    """Fully-flushed streaming interval join == the batch range_join
    result on the same windows/events, including window-watermark
    release order not mattering."""
    from transmog_ray.pipelines.queries import QUERIES

    got = (QUERIES["range_join_streaming"](SF).sort_values(
        ["event_id", "win_id"]).reset_index(drop=True))
    want = (QUERIES["range_join_events"](SF).to_pandas()
            [["event_id", "ts", "event_type", "win_id"]]
            .sort_values(["event_id", "win_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_interval_late_window_accounting(ray_session):
    """A window arriving behind the window watermark is dropped and
    COUNTED, never silently joined against already-emitted events."""
    from transmog_ray.state.streaming import StreamingIntervalState

    st = StreamingIntervalState("k", "ts", "ws", "we", ["win_id"])
    t0 = pd.Timestamp("2024-01-01")

    def w(start_s, end_s, wid):
        return pd.DataFrame({"k": [1], "ws": [t0 + pd.Timedelta(seconds=start_s)],
                             "we": [t0 + pd.Timedelta(seconds=end_s)],
                             "win_id": [wid]})

    def e(ts_s, eid):
        return pd.DataFrame({"k": [1], "ts": [t0 + pd.Timedelta(seconds=ts_s)],
                             "event_id": [eid]})

    st.add_windows(w(0, 100, 1))
    st.add_windows(w(50, 150, 2))          # watermark now 50
    out1 = st.process(e(10, "a"))          # ts 10 < 50 → released, joins win 1
    assert sorted(out1["win_id"]) == [1]
    st.add_windows(w(5, 60, 3))            # ws 5 < watermark 50 → LATE
    assert st.dropped_late_windows == 1
    out2 = st.flush()                      # nothing pending
    assert len(out2) == 0


def test_streaming_interval_eviction_bounds_state(ray_session):
    """Windows whose end passed both the event watermark and every
    buffered event are evicted; results stay correct."""
    from transmog_ray.state.streaming import StreamingIntervalState

    st = StreamingIntervalState("k", "ts", "ws", "we", ["win_id"])
    t0 = pd.Timestamp("2024-01-01")
    st.add_windows(pd.DataFrame({
        "k": [1, 1], "ws": [t0, t0 + pd.Timedelta(seconds=1000)],
        "we": [t0 + pd.Timedelta(seconds=10),
               t0 + pd.Timedelta(seconds=2000)],
        "win_id": [1, 2]}))
    # event at 500: released (ws watermark 1000 > 500), matches nothing
    out = st.process(pd.DataFrame({"k": [1], "ts": [t0 + pd.Timedelta(seconds=500)],
                                   "event_id": ["x"]}))
    assert len(out) == 0
    # window 1 (end=10) is now evicted: event watermark 500 > 10
    assert list(st._win_frame()["win_id"]) == [2]
