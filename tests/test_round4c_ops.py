"""Round-4 third-batch operators: per-domain quota cap, exact-substring
decontamination, Markov transition counts — each pinned to its DuckDB
oracle at sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "documents"):
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
    "name", ["domain_capped_pages", "decontam_exact_docs", "transition_counts",
             "lang_length_quantiles", "systematic_sample_events"]
)
def test_new_query_matches_oracle(ray_session, name):
    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = _canon(QUERIES[name](SF).to_pandas())
    want = _canon(_oracle(ORACLE_SQL[name]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_domain_cap_is_three_per_domain(ray_session):
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["domain_capped_pages"](SF).to_pandas()
    assert got["url"].is_unique
    assert got.groupby("domain").size().max() <= 3
