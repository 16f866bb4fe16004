"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library code it calls) initialises or shuts down
Ray. ``queries()`` / ``oracle_sql()`` pairs are compared by the driver at
sf=0.01 via DuckDB (row count + schema + order-insensitive value hash
with columns sorted by name); entries without SQL get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _configure():
    from transmog_ray.runtime import configure_context

    configure_context()


def entry() -> Any:
    """Flagship on sf0.001: point-in-time event features — exact dedup,
    as-of join to the latest purchase, lag/lead, sessionization, backfill
    and trailing windows in one fused sorted pass."""
    _configure()
    import pandas as pd

    from transmog_ray.pipelines.queries import read_table
    from transmog_ray.stages.asof import asof_join
    from transmog_ray.stages.dedup import dedup_exact
    from transmog_ray.stages.partition import apply_sorted
    from transmog_ray.stages.window import (
        backfill, rolling_agg, sessionize, with_lag,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type", "value"])
    ev = dedup_exact(ev, keys=["event_id"], order_by=["ts"], num_buckets=16).materialize()
    purchases = ev.map_batches(
        lambda df: df[df["event_type"] == "purchase"][["user_id", "ts", "value"]]
        .rename(columns={"ts": "p_ts", "value": "p_value"}),
        batch_format="pandas",
    )
    joined = asof_join(ev, purchases, key="user_id", left_ts="ts",
                       right_ts="p_ts", right_cols=["p_value"], num_buckets=16)

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        df = with_lag(df, "user_id", ["value"])
        df = sessionize(df, "user_id", "ts", gap_seconds=1800)
        df = df.assign(x=df["value"].where(df["event_type"] != "error"))
        df = backfill(df, "user_id", ["x"])
        return rolling_agg(df, "user_id", "ts", "value", 3600, aggs=("count", "mean"))

    return apply_sorted(joined, ["user_id"], "ts", feats, num_buckets=16,
                        tiebreak=["event_id"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2)."""
    _configure()
    from transmog_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query."""
    from transmog_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
