"""Round-5 fourth-batch operators, pinned to their DuckDB oracles at
sf0.001, plus structural property checks for the walk and containment
kernels."""

from __future__ import annotations

import duckdb
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
    "name", ["graph_walks_pages", "containment_pairs_docs",
             "calibration_bins_docs", "meta_key_census_pages",
             "silence_runs_audio", "ahash_groups_images",
             "mlm_mask_plan_docs", "readability_docs",
             "auc_scorer_docs", "media_type_census",
             "nofollow_share_domains", "reject_reasons_docs",
             "posting_gap_bits", "hourweek_heatmap_events",
             "char_class_langs", "gate_parity_langs", "pre_post_types",
             "duplicate_titles_pages", "session_entry_exit",
             "ams_f2_events", "curriculum_phases_docs",
             "contrastive_pairs_docs", "fano_daily_types"]
)
def test_round5d_query_matches_oracle(ray_session, name):
    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](SF)
    got = _canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
    want = _canon(_oracle(ORACLE_SQL[name]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_graph_walk_hops_are_edges(ray_session):
    """Every hop the walk takes must be a real edge of the link graph,
    and every source node gets exactly one walk."""
    from transmog_ray.pipelines.queries import (PAGES_CURRENT, QUERIES,
                                                _pages_fixture)

    _pages_fixture(SF)
    walks = QUERIES["graph_walks_pages"](SF)
    con = duckdb.connect()
    edges = con.execute(f"""
        SELECT DISTINCT url AS src, json_extract_string(
          unnest(CAST(json_extract(meta, '$.links') AS JSON[])), '$.href')
          AS dst
        FROM read_parquet('{PAGES_CURRENT}/pages-*.parquet')
        WHERE meta IS NOT NULL""").df().dropna()
    eset = set(zip(edges["src"], edges["dst"]))
    assert walks["walk_start"].is_unique
    assert set(walks["walk_start"]) == set(edges["src"])
    for _, r in walks.iterrows():
        assert (r["walk_start"], r["hop1"]) in eset
        if r["hop2"] is not None:
            assert (r["hop1"], r["hop2"]) in eset


def test_containment_pairs_shared_bounded(ray_session):
    """shared can never exceed the source doc's rare-gram count, and
    every emitted pair clears the rational 0.8 threshold."""
    from transmog_ray.pipelines.queries import QUERIES

    res = QUERIES["containment_pairs_docs"](SF)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    assert len(df) > 0  # exact dups in documents guarantee pairs
    assert (df["shared"] <= df["size_a"]).all()
    assert (5 * df["shared"] >= 4 * df["size_a"]).all()
    assert (df["id_a"] != df["id_b"]).all()


def test_silence_runs_consistent(ray_session):
    """Run structure sanity: quiet windows partition into runs whose
    total equals n_quiet and whose max is bounded by n_windows."""
    from transmog_ray.pipelines.queries import QUERIES

    df = QUERIES["silence_runs_audio"](SF).to_pandas()
    assert (df["n_quiet"] <= df["n_windows"]).all()
    assert (df["max_run"] <= df["n_quiet"]).all()
    assert ((df["n_runs"] == 0) == (df["n_quiet"] == 0)).all()
    assert (df.loc[df["n_runs"] > 0, "max_run"] > 0).all()
