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


def test_domain_cap_is_three_per_domain(ray_session):
    from transmog_ray.pipelines.queries import QUERIES

    got = QUERIES["domain_capped_pages"](SF).to_pandas()
    assert got["url"].is_unique
    assert got.groupby("domain").size().max() <= 3
