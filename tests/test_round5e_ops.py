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
             "sortedness_audit"]
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
