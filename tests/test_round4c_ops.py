"""Round-4 third-batch operators: per-domain quota cap, exact-substring
decontamination, Markov transition counts — each pinned to its DuckDB
oracle at sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _fetch(ds, cols) -> pd.DataFrame:
    """to_pandas with the zero-row guard: an empty Ray Dataset loses its
    columns through to_pandas() even when ds.schema() is intact."""
    df = ds.to_pandas()
    if df.empty and not set(cols) <= set(df.columns):
        return pd.DataFrame({c: [] for c in cols})
    return df[list(cols)]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name", ["domain_capped_pages", "decontam_exact_docs", "transition_counts",
             "lang_length_quantiles", "systematic_sample_events",
             "table_diff_orders", "winsorized_events", "scd2_user_tier",
             "chunked_docs", "weighted_price_quantiles", "typo_pairs_docs",
             "dup_span_docs", "incremental_event_totals",
             "linear_score_docs", "epoch_order_docs", "canonical_urls",
             "user_type_gini", "neighbor_pairs_docs",
             "assoc_rules_sessions"]
)
def test_new_query_matches_oracle(ray_session, name):
    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _canon(_oracle(ORACLE_SQL[name]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_table_diff_statuses_and_null_safety(ray_session):
    import numpy as np
    import ray.data as rd

    from transmog_ray.functions.relational import table_diff

    a = pd.DataFrame({
        "k": [1, 2, 3, 4, 5],
        "x": [1.0, 2.0, np.nan, 4.0, 5.0],
        "s": ["a", "b", "c", None, "e"],
    })
    b = pd.DataFrame({
        "k": [1, 2, 3, 4, 6],
        "x": [1.0, 2.5, np.nan, 4.0, 6.0],   # k=2 changed; k=3 NULL==NULL
        "s": ["a", "b", "c", "d", "f"],      # k=4: NULL -> 'd' counts
    })
    got = (
        table_diff(rd.from_pandas(a).repartition(2),
                   rd.from_pandas(b).repartition(3), keys="k", num_buckets=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == [2, 4, 5, 6]
    assert got["status"].tolist() == ["changed", "changed", "only_a", "only_b"]
    assert got["n_cols_changed"].tolist() == [1, 1, 0, 0]
    # k=1 (identical) and k=3 (NULL==NULL) emit nothing


class TestMergeUpsertProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    logs = st.lists(
        st.tuples(st.integers(0, 6),            # key
                  st.integers(0, 20),           # seq (ties allowed)
                  st.integers(0, 99),           # payload
                  st.booleans()),               # delete?
        min_size=1, max_size=40,
    )
    bases = st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 99)),
        max_size=8, unique_by=lambda t: t[0],
    )

    @settings(max_examples=12, deadline=None)
    @given(log=logs, base=bases)
    def test_matches_latest_op_rule(self, ray_session, log, base):
        import ray.data as rd

        from transmog_ray.stages.dedup import merge_upsert

        delta = pd.DataFrame(log, columns=["k", "seq", "v", "is_del"])
        delta["rid"] = np.arange(len(delta))  # total-order tiebreak
        delta["op"] = np.where(delta["is_del"], "delete", "upsert").astype(object)
        delta = delta.drop(columns=["is_del"])
        base_df = pd.DataFrame(base, columns=["k", "v"])

        got = _fetch(
            merge_upsert(
                rd.from_pandas(base_df).repartition(2) if len(base_df) else None,
                rd.from_pandas(delta).repartition(2),
                key="k", seq=["seq", "rid"], op_col="op", num_buckets=2,
            ),
            ["k", "v"],
        ).sort_values("k").reset_index(drop=True)

        # oracle: base rows rank below all delta rows; latest op wins;
        # delete tombstones the key
        d = delta.sort_values(["seq", "rid"]).drop_duplicates("k", keep="last")
        want = {}
        for k, v in zip(base_df["k"], base_df["v"]):
            want[k] = v
        for row in d.itertuples(index=False):
            if row.op == "delete":
                want.pop(row.k, None)
            else:
                want[row.k] = row.v
        want_df = (pd.DataFrame(sorted(want.items()), columns=["k", "v"])
                   if want else pd.DataFrame(columns=["k", "v"]))
        assert got["k"].tolist() == want_df["k"].tolist()
        assert got["v"].tolist() == want_df["v"].tolist()


class TestTableDiffProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frames = st.lists(
        st.tuples(st.integers(0, 9),
                  st.one_of(st.none(), st.integers(0, 3)),
                  st.one_of(st.none(), st.sampled_from("abc"))),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    )

    @settings(max_examples=12, deadline=None)
    @given(a=frames, b=frames)
    def test_matches_outer_merge_oracle(self, ray_session, a, b):
        import ray.data as rd

        from transmog_ray.functions.relational import table_diff

        adf = pd.DataFrame(a, columns=["k", "x", "s"])
        bdf = pd.DataFrame(b, columns=["k", "x", "s"])
        got = _fetch(
            table_diff(rd.from_pandas(adf).repartition(2),
                       rd.from_pandas(bdf).repartition(2),
                       keys="k", num_buckets=2),
            ["k", "status", "n_cols_changed"],
        ).sort_values("k").reset_index(drop=True)
        amap = {r.k: (r.x, r.s) for r in adf.itertuples(index=False)}
        bmap = {r.k: (r.x, r.s) for r in bdf.itertuples(index=False)}
        want = []
        for k in sorted(set(amap) | set(bmap)):
            if k not in bmap:
                want.append((k, "only_a", 0))
            elif k not in amap:
                want.append((k, "only_b", 0))
            else:
                n = sum(
                    not (pd.isna(va) and pd.isna(vb)) and va != vb
                    for va, vb in zip(amap[k], bmap[k])
                )
                if n:
                    want.append((k, "changed", n))
        assert list(map(tuple, got[["k", "status", "n_cols_changed"]]
                        .itertuples(index=False))) == want


def test_weighted_quantiles_matches_cumweight_rule(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import weighted_quantiles

    rng = np.random.default_rng(3)
    v = rng.normal(50, 20, 4001)
    w = rng.integers(1, 9, 4001)
    ds = rd.from_pandas(pd.DataFrame({"v": v, "w": w})).repartition(4)
    got = weighted_quantiles(ds, "v", "w", (0.25, 0.5, 0.9),
                             num_bins=64, driver_cap=500)
    order = np.argsort(v)
    cw = np.cumsum(w[order])
    tot = cw[-1]
    want = [float(v[order][np.searchsorted(cw, q * tot, side="left")])
            for q in (0.25, 0.5, 0.9)]
    assert got == want


def test_weighted_quantiles_duplicate_mass(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import weighted_quantiles

    # one value carries 90% of the weight: refinement stalls and must
    # resolve through the candidate pull
    df = pd.DataFrame({"v": np.r_[np.full(50, 7.0), np.arange(50.0)],
                       "w": np.r_[np.full(50, 100), np.full(50, 1)]})
    ds = rd.from_pandas(df).repartition(3)
    assert weighted_quantiles(ds, "v", "w", (0.5,), num_bins=16) == [7.0]


def test_edit_distance_pairs_fastss(ray_session):
    import ray.data as rd

    from transmog_ray.functions.neardup import edit_distance_pairs

    words = ["cat", "cut", "cats", "at", "dog", "ab", "ba", "dig", "dug"]
    ds = rd.from_pandas(pd.DataFrame({"w": words})).repartition(3)
    got = set(map(tuple, edit_distance_pairs(ds, "w", num_buckets=2)
                  .to_pandas()[["w_a", "w_b"]].itertuples(index=False)))
    # brute-force oracle
    def d1(a, b):
        if abs(len(a) - len(b)) > 1 or a == b:
            return False
        if len(a) == len(b):
            return sum(x != y for x, y in zip(a, b)) == 1
        s, l = (a, b) if len(a) < len(b) else (b, a)
        return any(l[:i] + l[i + 1:] == s for i in range(len(l)))
    want = {tuple(sorted((a, b))) for i, a in enumerate(words)
            for b in words[i + 1:] if d1(a, b)}
    assert got == want
    assert ("ab", "ba") not in got  # distance-2 blocking collision removed
    assert ("cat", "cut") in got and ("at", "cat") in got
    assert ("cat", "cats") in got and ("dig", "dug") in got


def test_duplicate_span_stats_hand_case(ray_session):
    import ray.data as rd

    from transmog_ray.functions.text import duplicate_span_stats

    shared = "a b c d e"  # the planted duplicated 5-gram
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            f"x1 x2 {shared} x3 x4",       # covered positions 2..6 (5)
            f"y1 {shared} y2 y3 y4 y5",    # covered positions 1..5 (5)
            "z1 z2 z3 z4 z5 z6",           # nothing duplicated
        ],
    })
    got = (duplicate_span_stats(rd.from_pandas(docs).repartition(2),
                                n=5, num_buckets=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_words"].tolist() == [9, 10, 6]
    assert got["n_covered"].tolist() == [5, 5, 0]


def test_sorted_neighborhood_pairs_boundaries(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import sorted_neighborhood_pairs

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"id": np.arange(30, dtype=np.int64),
                       "k": rng.integers(0, 10, 30)})
    # tiny block forces many range buckets and cross-boundary borrows
    got = (sorted_neighborhood_pairs(
        rd.from_pandas(df).repartition(3), "k", "id", window=4, block=8,
        num_buckets=3).to_pandas())
    got_set = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    order = df.sort_values(["k", "id"])["id"].to_numpy()
    want = {(order[i], order[j]) for i in range(len(order))
            for j in range(i + 1, min(i + 4, len(order)))}
    assert got_set == want
    assert len(got) == len(got_set)  # no duplicate pairs


def test_domain_cap_is_three_per_domain(ray_session):
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["domain_capped_pages"](SF).to_pandas()
    assert got["url"].is_unique
    assert got.groupby("domain").size().max() <= 3
