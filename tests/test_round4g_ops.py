"""Round-4 sixth-batch operators, each pinned to its DuckDB oracle at
sf0.001 plus brute-force semantic checks where the oracle alone is
weak."""

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
    "name", ["dwell_by_type", "decayed_user_activity", "crawl_schedule",
             "split_leakage_docs", "vocab_ids", "sliding_distinct_types",
             "ma_crossover_events", "event_runs", "trending_types",
             "oov_rate_docs", "burst_windows", "cdc_chunks_docs",
             "snapshot_char_drift", "length_gini_sources",
             "peak_hour_types", "abc_parts", "novel_bigrams_daily",
             "tld_stats", "rfm_customers", "dense_daily_counts",
             "ttr_langs", "distinctive_terms", "returning_users_daily",
             "changepoint_types", "top_paths_3", "time_to_value_users",
             "url_shape_domains", "partitioned_docs", "inter_session_gaps",
             "corpus_card", "copurchase_parts", "autocorr7_types",
             "quantile_norm_lengths", "negsample_weights",
             "k_anonymity_docs", "nation_share_region",
             "revenue_concentration", "log_length_histogram",
             "rolling_max_events", "length_clusters_docs",
             "active_time_users", "spearman_types", "pps_sample_docs",
             "link_domain_edges", "dangling_links", "user_retention_curve",
             "domain_degrees", "link_locality_pages",
             "politeness_violations", "url_templates", "max_rate_users",
             "props_k_stats", "novel_edges_daily", "domain_dup_content",
             "unchanged_streaks", "term_positions", "day_churn_overlap",
             "price_dispersion_parts", "multi_grain_counts",
             "crosscorr_types", "front_coding_savings",
             "onboarding_paths", "snapshots_per_url_hist",
             "session_length_hist", "q6_revenue", "value_bins_types",
             "fulfillment_latency_hist", "sentence_stats_docs",
             "bucket_skew_report", "region_priority_grid",
             "twap_users", "domain_lang_gini", "type_coverage_masks",
             "gap_quartiles_types", "next_type_recs", "domain_bytes",
             "weekend_share_types", "top_count_swings",
             "value_extremes_daily", "user_lifespan_stats"]
)
def test_new_query_matches_oracle(ray_session, name):
    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _canon(_oracle(ORACLE_SQL[name]))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_decayed_units_bruteforce(ray_session):
    """Decayed units must equal the literal per-event Σ 2^(40-k)."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["decayed_user_activity"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    day = ev["ts"].astype("datetime64[ns]").astype("int64") // (
        1000 * 86_400_000_000)
    ev = ev.assign(day=day)
    for uid, g in ev.groupby("user_id"):
        last = g["day"].max()
        want = sum(1 << (40 - k) for k in (last - g["day"]) if k <= 40)
        row = got[got["user_id"] == uid]
        assert int(row["decayed_units"].iloc[0]) == want
        assert int(row["n_events"].iloc[0]) == len(g)


def test_sliding_distinct_bruteforce(ray_session):
    """Interval-stabbing result must equal the literal per-event
    distinct-type count over the trailing hour, including ties."""
    from transmog_ray.pipelines.queries import QUERIES

    got = (QUERIES["sliding_distinct_types"](SF).to_pandas()
           .set_index("event_id")["n_types"])
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    W = pd.Timedelta(hours=1)
    for _, g in ev.groupby("user_id"):
        for _, row in g.iterrows():
            want = g[(g["ts"] <= row["ts"]) & (g["ts"] > row["ts"] - W)][
                "event_type"].nunique()
            assert int(got[row["event_id"]]) == want


def test_pps_sample_exact_k_and_proportional(ray_session):
    """Lattice hits total exactly k=100, and every doc's hit count is
    within 1 of its proportional share k·w/W."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["pps_sample_docs"](SF).to_pandas()
    assert int(got["n_hits"].sum()) == 100
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    W = docs["n_chars"].sum()
    share = docs.set_index("doc_id")["n_chars"] * 100 / W
    hits = got.set_index("doc_id")["n_hits"]
    for did, h in hits.items():
        assert abs(h - share[did]) <= 1


def test_active_time_bruteforce(ray_session):
    from transmog_ray.pipelines.queries import QUERIES

    got = (QUERIES["active_time_users"](SF).to_pandas()
           .set_index("user_id")["active_us"])
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    D = 300_000_000
    for uid, g in ev.groupby("user_id"):
        t = np.sort(g["ts"].astype("datetime64[ns]").astype("int64")
                    // 1000)
        covered, cur_end = 0, -1
        for s in t:
            e = s + D
            if s >= cur_end:
                covered += D
                cur_end = e
            elif e > cur_end:
                covered += e - cur_end
                cur_end = e
        assert int(got[uid]) == covered


def test_rolling_max_tied_timestamps(ray_session, tmp_path):
    """RANGE frames include ALL ts peers — a tied-timestamp fixture must
    match the DuckDB window verbatim (the two-buffer kernel's tie
    transform is what this pins)."""
    import duckdb

    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    rng = np.random.RandomState(7)
    n = 400
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.randint(0, 180, n) * 60, unit="s")  # coarse → many ties
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 5, n).astype(np.int64),
        "ts": ts.astype("datetime64[us]"),
        "event_type": "x",
        "value": rng.randn(n),
        "props": "",
    })
    sf = tmp_path / "sfsynth"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet", index=False)

    got = _canon(QUERIES["rolling_max_events"](str(sf)).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = _canon(con.execute(ORACLE_SQL["rolling_max_events"]).df())
    con.close()
    assert ev.groupby(["user_id", "ts"]).size().max() > 1  # ties real
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantile_norm_distributionally_pooled(ray_session):
    """After normalization every source's value multiset is a subset of
    pooled lengths, and the largest doc of each source maps to the
    pooled maximum."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["quantile_norm_lengths"](SF).to_pandas()
    pooled = np.sort(got["n_chars"].to_numpy())
    assert set(got["norm_chars"]) <= set(pooled)
    for _, g in got.groupby("source"):
        assert g["norm_chars"].max() == pooled[-1]
        # monotone: higher raw rank never maps to a smaller pooled value
        gg = g.sort_values(["n_chars", "doc_id"])
        assert (np.diff(gg["norm_chars"].to_numpy()) >= 0).all()


def test_hive_sink_resume_and_roundtrip(ray_session, tmp_path):
    """write_hive_partitioned: (1) round-trips all rows under
    lang=<v>/ dirs, (2) a re-run with the same fingerprint skips every
    partition, (3) deleting one partition's manifest makes ONLY that
    partition rewrite, (4) a changed fingerprint rewrites all."""
    import os

    import ray.data as rd

    from transmog_ray.state.checkpoint import (load_metrics,
                                               write_hive_partitioned)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"]).materialize()
    out = str(tmp_path / "hive")
    m1 = write_hive_partitioned(docs, out, "lang", "fp1",
                                order_by=["doc_id"])
    assert m1["partitions_skipped"] == 0
    want = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    # the column is kept in-file, so read the part files directly
    import glob

    got = pd.concat([pd.read_parquet(p) for p in
                     glob.glob(f"{out}/lang=*/data.parquet")],
                    ignore_index=True)
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    langs = sorted(want["lang"].dropna().unique())
    assert sorted(os.listdir(out)) == sorted(
        [f"lang={v}" for v in langs] + ["_run.json"])

    m2 = write_hive_partitioned(docs, out, "lang", "fp1",
                                order_by=["doc_id"])
    assert m2["partitions_skipped"] == m2["num_partitions"]

    victim = os.path.join(out, f"lang={langs[0]}", "manifest.json")
    os.remove(victim)
    before = {v: os.path.getmtime(os.path.join(out, f"lang={v}",
                                               "data.parquet"))
              for v in langs}
    m3 = write_hive_partitioned(docs, out, "lang", "fp1",
                                order_by=["doc_id"])
    assert m3["partitions_skipped"] == m3["num_partitions"] - 1
    after = {v: os.path.getmtime(os.path.join(out, f"lang={v}",
                                              "data.parquet"))
             for v in langs}
    assert after[langs[0]] > before[langs[0]]
    for v in langs[1:]:
        assert after[v] == before[v]

    m4 = write_hive_partitioned(docs, out, "lang", "fp2",
                                order_by=["doc_id"])
    assert m4["partitions_skipped"] == 0
    metrics = load_metrics(out)
    assert set(metrics["partition_value"]) == set(map(str, langs))


def test_rfm_buckets_balanced(ray_session):
    """Each RFM dimension's quintiles differ in size by ≤1 and cover
    1..5."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["rfm_customers"](SF).to_pandas()
    for col in ("r_bucket", "f_bucket", "m_bucket"):
        sizes = got[col].value_counts()
        assert set(sizes.index) == {1, 2, 3, 4, 5}
        assert sizes.max() - sizes.min() <= 1
    assert (got["rfm_segment"] ==
            100 * got["r_bucket"] + 10 * got["f_bucket"]
            + got["m_bucket"]).all()


def test_dense_daily_counts_gapless(ray_session):
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["dense_daily_counts"](SF).to_pandas()
    for _, g in got.groupby("event_type"):
        days = np.sort(g["day_start"].to_numpy())
        assert (np.diff(days) == 86400).all()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
    per_type = got.groupby("event_type")["cnt"].sum()
    want = ev.groupby("event_type").size()
    assert per_type.astype(int).to_dict() == want.astype(int).to_dict()


def test_abc_classes_monotone(ray_session):
    """Cumulative cents are non-decreasing as revenue descends, and the
    class sequence along that order is A* B* C*."""
    from transmog_ray.pipelines.queries import QUERIES

    got = (QUERIES["abc_parts"](SF).to_pandas()
           .sort_values(["cum_cents", "rev_cents"],
                        ascending=[True, False]))
    order = {"A": 0, "B": 1, "C": 2}
    codes = got["abc_class"].map(order).to_numpy()
    assert (np.diff(codes) >= 0).all()
    assert set(got["abc_class"]) >= {"A", "C"}
    total = got["rev_cents"].sum()
    assert got["cum_cents"].max() == total


def test_length_gini_bounds_and_known_values(ray_session):
    """gini_num/gini_den ∈ [0, 1) and equals the textbook formula on a
    hand-computed group."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["length_gini_sources"](SF).to_pandas()
    assert (got["gini_num"] >= 0).all()
    assert (got["gini_num"] < got["gini_den"]).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    src = got["source"].iloc[0]
    x = np.sort(docs[docs["source"] == src]["n_chars"].to_numpy())
    n = len(x)
    i = np.arange(1, n + 1)
    assert int(got[got["source"] == src]["gini_num"].iloc[0]) == int(
        ((2 * i - n - 1) * x).sum())


def test_cdc_chunks_tile_and_shift_stability(ray_session):
    """Chunks must tile each doc exactly; and because boundaries are
    content-defined, prepending one char re-chunks only the prefix —
    every boundary past the first window realigns."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["cdc_chunks_docs"](SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    lens = docs.set_index("doc_id")["text"].str.len()
    for did, g in got.groupby("doc_id"):
        g = g.sort_values("chunk_no")
        assert g["start_pos"].iloc[0] == 1
        ends = g["start_pos"] + g["chunk_len"] - 1
        assert (g["start_pos"].iloc[1:].to_numpy()
                == ends.iloc[:-1].to_numpy() + 1).all()
        assert ends.iloc[-1] == lens[did]

    def boundaries(text, W=8, MOD=16):
        cp = np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(
            np.int64)
        ps = np.concatenate(([0], np.cumsum(cp)))
        pos = np.arange(1, len(text) + 1)
        w = ps[pos] - ps[np.maximum(pos - W, 0)]
        return set(pos[w % MOD == 0])

    text = str(docs["text"].iloc[0])
    b0 = boundaries(text)
    b1 = boundaries("X" + text)
    # boundaries beyond the first full window after the edit realign
    realigned = {p + 1 for p in b0 if p > 8}
    assert realigned <= b1


def test_event_runs_reassemble(ray_session):
    """Run lengths per (user, type) must sum to the user's event count,
    and no two adjacent runs of one user share a type."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["event_runs"](SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    per_user = got.groupby("user_id")["run_len"].sum()
    want = ev.groupby("user_id").size()
    assert per_user.astype(int).to_dict() == want.astype(int).to_dict()
    # start events are distinct across runs
    assert got["start_event_id"].is_unique


def test_vocab_ids_dense_and_ordered(ray_session):
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["vocab_ids"](SF).to_pandas().sort_values("vocab_id")
    assert list(got["vocab_id"]) == list(range(1, len(got) + 1))
    pairs = list(zip(-got["cnt"], got["term"]))
    assert pairs == sorted(pairs)


def test_crawl_schedule_round_robin(ray_session):
    """Slots must be a permutation of 1..n, ordered rank-major (all
    rank-1 urls before any rank-2 url)."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["crawl_schedule"](SF).to_pandas()
    n = len(got)
    assert sorted(got["slot"]) == list(range(1, n + 1))
    g = got.sort_values("slot")
    assert (g["rank_in_domain"].diff().dropna() >= 0).all()
    # within a rank, domains ascend
    for _, grp in g.groupby("rank_in_domain"):
        doms = list(grp.sort_values("slot")["domain"])
        assert doms == sorted(doms)
