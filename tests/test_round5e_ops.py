"""Round-5 fifth-batch operators, pinned to their DuckDB oracles at
sf0.001, plus structural property checks for the rolling median and
dup-weight kernels."""

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
    "name", ["rolling_median_events", "zero_crossings_audio",
             "dup_weight_docs", "orphan_keys_audit",
             "timed_funnel_events", "bollinger_breakouts",
             "sortedness_audit", "jsonl_gz_events", "debounced_events",
             "negative_edges_pages", "theilsen_trend_parts",
             "max_gain_users", "edge_support_suppliers",
             "wl_hash_suppliers", "decay_attribution_events",
             "bitemporal_asof_events", "dhash_groups_images",
             "importance_weights_langs", "pushdown_read_lineitem",
             "ahash_neardup_images", "fallback_asof_events",
             "join_cardinality_estimate", "kmv_sketch_users",
             "dod_bits_users", "rendezvous_shards_pages",
             "bucketed_join_orders", "knn_graph_int8",
             "l_diversity_docs", "rbo_rankings_docs",
             "value_drift_types", "cohort_ltv_users",
             "warc_domain_census", "warc_token_stats",
             "boruvka_round_parts", "bootstrap_means_events",
             "funnel_distance_users", "zorder_skip_stats",
             "null_census_tables", "forget_users_run",
             "encoding_advisor_lineitem", "lateness_sweep_events",
             "nation_part_overlap"]
)
def test_round5e_query_matches_oracle(ray_session, name):
    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _canon(_oracle(ORACLE_SQL[name]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_median_on_half_grid(ray_session):
    """Every emitted median must be an integer or an exact .5 value —
    the property that makes the cross-engine comparison exact."""
    from transmog_ray.pipelines.queries import QUERIES

    med = QUERIES["rolling_median_events"](SF).to_pandas()["med"]
    doubled = med.to_numpy(np.float64) * 2
    assert np.all(doubled == np.round(doubled))


def test_dup_weight_inverse_of_cluster_size(ray_session):
    from transmog_ray.pipelines.queries import QUERIES

    df = QUERIES["dup_weight_docs"](SF).to_pandas()
    assert (df["weight"] == 1.0 / df["n_dup"]).all()
    assert df["doc_id"].is_unique


def test_jsonl_gz_source_error_contract(ray_session, tmp_path):
    """Malformed lines raise with file:line under on_error='raise' and
    are dropped under 'skip'; non-object rows are rejected too."""
    import gzip

    from transmog_ray.api import ValidationError
    from transmog_ray.sources.jsonl_gz import read_jsonl_gz

    p = tmp_path / "bad.jsonl.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write('{"a": 1}\n')
        f.write("not json\n")
        f.write('{"a": 2, "b": "x"}\n')
        f.write("[1, 2]\n")

    with pytest.raises(Exception) as exc:
        read_jsonl_gz([str(p)]).materialize()
    assert "bad.jsonl.gz:2" in str(exc.value)

    got = read_jsonl_gz([str(p)], on_error="skip").to_pandas()
    assert sorted(got["a"].tolist()) == [1, 2]
    assert set(got.columns) == {"a", "b"}

    with pytest.raises(ValueError):
        read_jsonl_gz([str(p)], on_error="nope")
    with pytest.raises(ValueError):
        read_jsonl_gz([])


def test_decay_attribution_conserves_cents(ray_session):
    """Credits must sum exactly to each purchase's floored cents —
    the largest-remainder invariant."""
    import duckdb

    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["decay_attribution_events"](SF).to_pandas()
    sums = got.groupby("purchase_id")["credit_cents"].sum()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(
        "SELECT event_id, CAST(FLOOR(value*100) AS BIGINT) c FROM events "
        "WHERE event_type='purchase'").df().set_index("event_id")["c"]
    con.close()
    for pid, s in sums.items():
        assert s == want.loc[pid], (pid, s, want.loc[pid])


def test_bitemporal_never_uses_late_features(ray_session):
    """A feature whose ingest time is after the view must never be
    selected, even when its event time qualifies — the leak guard."""
    import hashlib

    import duckdb

    from transmog_ray.pipelines.queries import (BITEMPORAL_DELAY_MOD_S,
                                                QUERIES)

    got = QUERIES["bitemporal_asof_events"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    ev = con.execute(
        "SELECT event_id, user_id, epoch_us(ts) t, event_type, value "
        "FROM events WHERE user_id IS NOT NULL").df()
    con.close()
    views = ev[ev.event_type == "view"].set_index("event_id")
    feats = ev[(ev.event_type == "purchase") & ev.value.notna()]
    delay = {int(r.event_id):
             int(hashlib.md5(str(int(r.event_id)).encode())
                 .hexdigest()[:8], 16) % BITEMPORAL_DELAY_MOD_S
             for r in feats.itertuples()}
    fmap = feats.set_index("event_id")
    hits = got[got.f_event_id >= 0]
    assert len(hits) > 0
    for r in hits.itertuples():
        vt = views.loc[r.event_id, "t"]
        ft = fmap.loc[r.f_event_id, "t"]
        assert ft <= vt
        assert ft + delay[int(r.f_event_id)] * 1_000_000 <= vt


def test_warc_roundtrip_and_error_contract(ray_session, tmp_path):
    """write_warc → read_warc round-trips records byte-for-byte (plain
    and gz); malformed streams raise with file + record index under
    on_error='raise' and resync under 'skip'."""
    import gzip

    from transmog_ray.api import ValidationError
    from transmog_ray.sources.warc import (parse_warc_stream, read_warc,
                                           write_warc)

    recs = [{"url": f"https://ex{i}.com/p", "warc_date": "2024-01-01",
             "payload": (b"body \r\n\r\n binary \x00" * (i + 1))}
            for i in range(5)]
    for name in ("a.warc", "a.warc.gz"):
        p = tmp_path / name
        write_warc(recs, str(p))
        got = read_warc([str(p)]).to_pandas()
        assert len(got) == 5
        assert got["url"].tolist() == [r["url"] for r in recs]
        assert [bytes(b) for b in got["payload"]] == [r["payload"]
                                                      for r in recs]
        assert (got["length"].to_numpy()
                == [len(r["payload"]) for r in recs]).all()
        assert set(got["warc_type"]) == {"response"}

    bad = tmp_path / "bad.warc"
    with open(bad, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Target-URI: u\r\n\r\n")  # no length
    with pytest.raises(Exception) as exc:
        read_warc([str(bad)]).materialize()
    assert "record 1" in str(exc.value)
    with open(bad, "rb") as f:
        assert list(parse_warc_stream(f, "bad", on_error="skip")) == []
    with pytest.raises(ValueError):
        read_warc([str(bad)], on_error="nope")


def test_negative_edges_are_not_edges(ray_session):
    """No sampled negative may be a real link or a self-loop, and every
    source url contributes at most NEG_EDGES_PER_SRC rows."""
    import ray.data as rd

    from transmog_ray.pipelines import queries as q

    neg = q.QUERIES["negative_edges_pages"](SF).to_pandas()
    pages_dir = q._pages_fixture(SF)
    pages = rd.read_parquet(pages_dir, columns=["url", "meta"]).to_pandas()
    edges = set(map(tuple, q._explode_hrefs(pages)[["url", "href"]]
                    .drop_duplicates().to_numpy()))
    assert not any((s, d) in edges for s, d in
                   zip(neg["src"], neg["dst"]))
    assert (neg["src"] != neg["dst"]).all()
    assert neg.groupby("src").size().max() <= q.NEG_EDGES_PER_SRC
