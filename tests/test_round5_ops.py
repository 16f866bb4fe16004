"""Round-5 fixes: hive sink hardening (collision-free partition names,
empty-input tolerance, stale-partition pruning) and the de-drivered
streaming replay harnesses."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest


def test_hive_partition_names_collision_free(ray_session, tmp_path):
    """Values differing only in non-alnum chars ('en US' vs 'en_US' vs
    'en/US') must land in DISTINCT partition dirs — a lossy sanitizer
    would let one silently overwrite the other (ADVICE r4)."""
    import ray.data as rd

    from transmog_ray.state.checkpoint import write_hive_partitioned

    df = pd.DataFrame({
        "doc_id": range(6),
        "lang": ["en US", "en US", "en_US", "en_US", "en/US", "en/US"],
    })
    out = str(tmp_path / "hive")
    meta = write_hive_partitioned(rd.from_pandas(df), out, "lang", "fp1",
                                  order_by=["doc_id"])
    assert meta["num_partitions"] == 3
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(dirs) == 3
    got = pd.concat(
        [pd.read_parquet(os.path.join(out, d, "data.parquet")) for d in dirs],
        ignore_index=True,
    )
    assert sorted(got["doc_id"]) == list(range(6))
    # every distinct value round-trips through its own manifest
    vals = set()
    for d in dirs:
        with open(os.path.join(out, d, "manifest.json")) as f:
            m = json.load(f)
        vals.add(m["partition_value"])
        assert m["rows_out"] == 2
    assert vals == {"en US", "en_US", "en/US"}


def test_hive_empty_input_writes_empty_run(ray_session, tmp_path):
    """A fully-empty dataset (whose to_pandas loses its columns) must
    produce an empty run, not a KeyError (ADVICE r4)."""
    import ray.data as rd

    from transmog_ray.state.checkpoint import write_hive_partitioned

    empty = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "lang": pd.Series([], dtype=object)})
    )
    out = str(tmp_path / "hive-empty")
    meta = write_hive_partitioned(empty, out, "lang", "fp1")
    assert meta["num_partitions"] == 0
    assert meta["rows_out"] == 0
    assert os.path.exists(os.path.join(out, "_run.json"))


def test_hive_stale_partitions_pruned(ray_session, tmp_path):
    """Partition dirs for values absent from the current data are
    removed, so resume/load_metrics never surface stale output
    (ADVICE r4)."""
    import ray.data as rd

    from transmog_ray.state.checkpoint import (load_metrics,
                                               write_hive_partitioned)

    out = str(tmp_path / "hive")
    df1 = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                        "lang": ["en", "en", "de", "fr"]})
    write_hive_partitioned(rd.from_pandas(df1), out, "lang", "fp1",
                           order_by=["doc_id"])
    assert os.path.isdir(os.path.join(out, "lang=fr"))

    # second run: 'fr' vanished from the input (and the fingerprint
    # changed, as input lineage in a fingerprint would make it)
    df2 = pd.DataFrame({"doc_id": [0, 1, 2], "lang": ["en", "en", "de"]})
    write_hive_partitioned(rd.from_pandas(df2), out, "lang", "fp2",
                           order_by=["doc_id"])
    assert not os.path.exists(os.path.join(out, "lang=fr"))
    m = load_metrics(out)
    assert set(m["partition_value"]) == {"en", "de"}
    assert (m["run_fingerprint"] == "fp2").all()


def test_streaming_replay_matches_batch(ray_session):
    """The block-replay harnesses (no driver-side full-table pandas)
    still equal their batch-path oracles."""
    import duckdb

    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    for name in ("sessionize_streaming", "asof_purchase_streaming"):
        got = QUERIES[name](sf)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        want = con.execute(ORACLE_SQL[name]).df()
        got = got[sorted(got.columns)].sort_values(
            sorted(got.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(
            sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con.close()
