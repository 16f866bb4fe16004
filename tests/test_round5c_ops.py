"""Round-5 third-batch operators, pinned to their DuckDB oracles at
sf0.001, plus the BPE-train equality check against the single-process
reference implementation (the rows-only entry's correctness pin)."""

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
    "name", ["type_lift_pairs", "cheapest_two_hop", "label_inertia",
             "order_total_reconciliation", "decile_revenue_share",
             "zorder_parts", "tf_cosine_pairs_docs", "rle_runs_events",
             "order_line_signature", "busday_latency_orders",
             "typo_clusters_docs", "core3_parts", "bounce_rate_sessions",
             "cont_price_quantiles", "union_schema_read",
             "cdc_join_delta", "division_customers", "stump_split_events",
             "price_gcd_brand", "tukey_outliers_langs", "stock_span_daily",
             "content_fingerprint_langs", "rowgroup_skip_stats",
             "column_compression_stats", "gram_matrix_embeddings",
             "frequent_triples_parts", "bitmap_distinct_users",
             "merge_join_segments", "compaction_plan", "iso_week_revenue",
             "quarantine_parse_docs", "auto_join_types",
             "mannwhitney_langs", "survival_table_users",
             "image_thumbnail_stats", "wav_energy_stats", "emd_langs",
             "hist_intersection_langs", "session_threshold_sweep",
             "mirror_detection_pages", "crawl_fairness_daily"]
)
def test_round5c_query_matches_oracle(ray_session, name):
    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _canon(_oracle(ORACLE_SQL[name]))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_train_equals_reference(ray_session):
    """Distributed 5-iteration BPE merge training == the single-process
    reference (Sennrich-style greedy merges) on the sf0.001 corpus."""
    from transmog_ray.pipelines.queries import (QUERIES,
                                                bpe_train_reference)

    got = QUERIES["bpe_train_docs"](SF).reset_index(drop=True)
    texts = pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["text"])["text"].tolist()
    want = bpe_train_reference(texts, n_merges=5).reset_index(drop=True)
    assert len(got) == 5
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bpe_train_reference_semantics():
    """The reference itself: overlapping pair runs merge greedily
    left-to-right ([a,a,a] -> [aa, a]), ties break lexicographically."""
    ref = __import__("transmog_ray.pipelines.queries",
                     fromlist=["bpe_train_reference"]).bpe_train_reference
    out = ref(["aaa aaa", "ab ab ab"], n_merges=2)
    # pairs: (a,a) count 4 (two per 'aaa', x2 docs... one doc: 'aaa aaa'
    # = two words 'aaa' each with pairs (a,a)x2 -> 4; (a,b) count 3.
    assert list(out.iloc[0][["left", "right", "n"]]) == ["a", "a", 4]
    # after merging: 'aaa' -> [aa, a]; pair (aa,a) count 2, (a,b) 3
    assert list(out.iloc[1][["left", "right", "n"]]) == ["a", "b", 3]


def test_union_read_column_pruning(ray_session, tmp_path):
    """read_parquet_union pads columns missing from a schema version
    with typed nulls, prunes to requested columns, and handles a file
    carrying NONE of the requested columns (row counts preserved)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from transmog_ray.sources.union_read import read_parquet_union

    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}),
                   str(tmp_path / "v1.parquet"))
    pq.write_table(pa.table({"b": ["z"], "c": [3.5]}),
                   str(tmp_path / "v2.parquet"))
    pq.write_table(pa.table({"d": [7, 8, 9]}),
                   str(tmp_path / "v3.parquet"))

    full = read_parquet_union(str(tmp_path)).to_pandas()
    assert sorted(full.columns) == ["a", "b", "c", "d"]
    assert len(full) == 6
    assert full["a"].notna().sum() == 2 and full["d"].notna().sum() == 3

    pruned = read_parquet_union(str(tmp_path), columns=["a", "c"])
    pdf = pruned.to_pandas()
    assert sorted(pdf.columns) == ["a", "c"]
    assert len(pdf) == 6  # v3 contributes 3 all-null rows
    assert pdf["c"].notna().sum() == 1

    with pytest.raises(ValueError):
        read_parquet_union(str(tmp_path), columns=["nope"])


def test_cdc_join_delta_net_zero_moves(ray_session):
    """A customer move must net to zero order-count across nations:
    the summed d_orders equals inserts minus deletes exactly."""
    import pandas as pd

    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["cdc_join_delta"](SF)
    ords = pd.read_parquet(f"{SF}/orders.parquet",
                           columns=["o_orderkey"])["o_orderkey"]
    expect = int((ords % 41 == 0).sum()) - int((ords % 37 == 0).sum())
    assert int(got["d_orders"].sum()) == expect


def test_quarantine_map_routes_errors(ray_session):
    """Bad rows land in the DLQ with the exception text; good rows
    keep their parsed columns; row counts are conserved."""
    import ray.data as rd

    from transmog_ray.stages.quarantine import (dlq_rows, ok_rows,
                                                quarantine_map)

    src = rd.from_pandas(pd.DataFrame(
        {"raw": ["1", "2", "boom", "4", "nope"]}))
    tagged = quarantine_map(src, lambda v: {"val": int(v)},
                            "raw").materialize()
    ok = ok_rows(tagged).to_pandas()
    bad = dlq_rows(tagged, "raw").to_pandas()
    assert sorted(ok["val"]) == [1, 2, 4]
    assert sorted(bad["raw"]) == ["boom", "nope"]
    assert all("ValueError" in e for e in bad["_dlq_error"])
    assert len(ok) + len(bad) == 5


def test_auto_join_picks_broadcast_and_hash(ray_session):
    """Both physical paths of auto_join return identical rows; the
    limit decides which one runs."""
    import ray.data as rd

    from transmog_ray.functions.relational import auto_join

    left = pd.DataFrame({"k": [1, 2, 2, 3], "lv": list("abcd")})
    right = pd.DataFrame({"k": [2, 3, 9], "rv": [20, 30, 90]})
    canon = lambda d: (d[sorted(d.columns)]
                       .sort_values(sorted(d.columns))
                       .reset_index(drop=True))
    bc = auto_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                   broadcast_limit=10).to_pandas()
    hj = auto_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                   broadcast_limit=0, num_buckets=2).to_pandas()
    pd.testing.assert_frame_equal(canon(bc), canon(hj), check_dtype=False)
    assert sorted(bc["rv"]) == [20, 20, 30]


def test_sorted_merge_join_equals_hash_join(ray_session):
    """Row-level equality with hash_join on the same inputs, plus the
    merge join's differentiator: output arrives key-ordered."""
    import ray.data as rd

    from transmog_ray.functions.relational import (hash_join,
                                                   sorted_merge_join)

    left = pd.DataFrame({"k": [5, 1, 3, 3, 9, 1],
                         "lv": ["a", "b", "c", "d", "e", "f"]})
    right = pd.DataFrame({"k": [3, 1, 1, 7], "rv": [30, 10, 11, 70]})
    mj = sorted_merge_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", num_buckets=3).to_pandas()
    hj = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                   on="k", num_buckets=3).to_pandas()
    canon = lambda d: (d[sorted(d.columns)]
                       .sort_values(sorted(d.columns))
                       .reset_index(drop=True))
    pd.testing.assert_frame_equal(canon(mj), canon(hj), check_dtype=False)
    assert (mj["k"].to_numpy()[1:] >= mj["k"].to_numpy()[:-1]).all()


def _feed_sessions(state, batches):
    outs = [state.process(b) for b in batches]
    return outs


def test_pava_isotonic_properties():
    """PAVA pools: output means non-decreasing (cross-multiplied),
    mass conserved, and equal to the O(n²) brute-force pooled fit."""
    import numpy as np

    from transmog_ray.pipelines.queries import pava_pools

    rng = np.random.default_rng(5)
    for _ in range(25):
        vals = rng.integers(-50, 200, size=rng.integers(1, 40)).tolist()
        pools = pava_pools(vals)
        assert sum(n for _, _, n in pools) == len(vals)
        assert sum(s for _, s, _ in pools) == sum(vals)
        for (_, s1, n1), (_, s2, n2) in zip(pools, pools[1:]):
            assert s1 * n2 <= s2 * n1  # means non-decreasing
        # brute force: repeatedly merge the first violating pair
        bf = [(i, v, 1) for i, v in enumerate(vals)]
        changed = True
        while changed:
            changed = False
            for i in range(len(bf) - 1):
                (a0, s1, n1), (_, s2, n2) = bf[i], bf[i + 1]
                if s1 * n2 > s2 * n1:
                    bf[i:i + 2] = [(a0, s1 + s2, n1 + n2)]
                    changed = True
                    break
        assert pools == bf


def test_isotonic_daily_matches_reference(ray_session):
    """The distributed query's pools equal PAVA on the single-process
    daily totals."""
    from transmog_ray.pipelines.queries import QUERIES, pava_pools

    got = QUERIES["isotonic_daily"](SF)
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderdate", "o_totalprice"])
    day = (o["o_orderdate"].astype("datetime64[ns]")
           .to_numpy("datetime64[D]").astype("int64"))
    cents = np.rint(o["o_totalprice"].to_numpy() * 100).astype("int64")
    tot = (pd.DataFrame({"d": day, "c": cents}).groupby("d")["c"].sum()
           .sort_index())
    pools = pava_pools(tot.to_numpy())
    days = tot.index.to_numpy()
    assert list(got["pool_start_day"]) == [int(days[s])
                                           for s, _, _ in pools]
    assert list(got["pool_sum_cents"]) == [s for _, s, _ in pools]
    assert list(got["pool_n_days"]) == [n for _, _, n in pools]


def test_streaming_session_snapshot_resume(ray_session):
    """Kill+resume for the STREAMING path: pickling SessionState
    mid-stream and resuming in a 'new process' yields outputs
    byte-identical to the uninterrupted run."""
    import pickle

    from transmog_ray.state.streaming import SessionState

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
    batches = np.array_split(ev, 6)

    straight = SessionState("user_id", "ts", 1800)
    full = pd.concat(_feed_sessions(straight, batches)
                     + [straight.open_sessions()], ignore_index=True)

    first = SessionState("user_id", "ts", 1800)
    out_a = _feed_sessions(first, batches[:3])
    blob = pickle.dumps(first)          # the checkpoint
    resumed = pickle.loads(blob)        # the 'new process'
    out_b = _feed_sessions(resumed, batches[3:])
    resumed_full = pd.concat(out_a + out_b + [resumed.open_sessions()],
                             ignore_index=True)

    key = sorted(full.columns)
    pd.testing.assert_frame_equal(
        full[key].sort_values(key).reset_index(drop=True),
        resumed_full[key].sort_values(key).reset_index(drop=True))


def test_streaming_asof_snapshot_resume(ray_session):
    """Same pickle-checkpoint contract for StreamingAsofState: snapshot
    between feature and event batches, resume, equal joined output."""
    import pickle

    from transmog_ray.state.streaming import StreamingAsofState

    t0 = pd.Timestamp("2024-01-01")

    def feats(rows):
        return pd.DataFrame({
            "k": [r[0] for r in rows],
            "fts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "fv": [r[2] for r in rows]})

    def evs(rows):
        return pd.DataFrame({
            "k": [r[0] for r in rows],
            "ts": [t0 + pd.Timedelta(seconds=r[1]) for r in rows],
            "eid": [r[2] for r in rows]})

    def run(split):
        st = StreamingAsofState("k", "ts", "fts", ["fv"])
        outs = []
        st.add_features(feats([(1, 0, 10.0), (1, 50, 11.0),
                               (2, 10, 20.0)]))
        outs.append(st.process(evs([(1, 5, "a"), (2, 15, "b")])))
        if split:
            st = pickle.loads(pickle.dumps(st))
        st.add_features(feats([(1, 100, 12.0)]))
        outs.append(st.process(evs([(1, 60, "c"), (1, 120, "d")])))
        outs.append(st.flush())
        out = pd.concat([o for o in outs if len(o)], ignore_index=True)
        key = sorted(out.columns)
        return out[key].sort_values(key).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(split=False), run(split=True))


def test_rle_runs_boundary_stitching(ray_session):
    """Cross-range boundaries count as changes exactly when values
    differ — verified against a pandas single-process recount."""
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["rle_runs_events"](SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "event_type",
                                  "user_id"])
    ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
    t = ev["event_type"].to_numpy(object)
    u = ev["user_id"].to_numpy()
    assert int(got["n_rows"]) == len(ev)
    assert int(got["type_runs"]) == 1 + int((t[1:] != t[:-1]).sum())
    assert int(got["user_runs"]) == 1 + int((u[1:] != u[:-1]).sum())
