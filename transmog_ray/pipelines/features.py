"""Flagship pipeline: Common-Crawl-style pages → point-in-time features.

The north-star shape (BASELINE.json):

    read_parquet(pages)
      → FlattenStage (actor pool, tagged: main + child tables, one pass)
      → exact dedup of (url, warc_ts)
      → feature side: per-(url, warc_ts) link aggregates from the
        pages_meta_links child table (join back by _parent_id == root id)
      → as-of join: latest feature row with feature_ts <= warc_ts
        (features lag one snapshot — computed features describe the
        PREVIOUS crawl of the url, a real point-in-time setup)
      → one fused sorted pass: lag/lead + sessionize + backfill + rolling
      → write partitioned parquet + manifest (checkpoint/resume)

``text`` rides as an untouched passthrough column end-to-end
(byte-identity invariant), and ``html`` is dropped before any shuffle.
"""

from __future__ import annotations

import pandas as pd

from ..core.config import FlattenConfig
from ..stages.asof import asof_join
from ..stages.dedup import dedup_exact
from ..stages.flatten import FlattenSpec, TABLE_TAG, flatten_dataset, split_tagged
from ..stages.partition import apply_sorted
from ..stages.window import backfill, rolling_agg, sessionize, with_lag, with_lead
from ..functions.relational import grouped_agg, hash_join

PAGE_SPEC = FlattenSpec(
    entity="pages",
    config=FlattenConfig(id_generation=("url", "warc_ts")),
    json_col="meta",
    record_cols=("url", "warc_ts"),
    passthrough=("url", "warc_ts", "text", "lang"),
    extract_time="2026-01-01 00:00:00.000000",  # run constant: deterministic
)


def page_features(
    pages_ds,
    session_gap_s: float = 7 * 86400,
    rolling_window_s: float = 30 * 86400,
    num_buckets: int = 64,
    flatten_concurrency: int | None = None,
):
    """Full feature pipeline over a pages Dataset → features Dataset.

    Returns one row per distinct (url, warc_ts) with flattened metadata
    columns, as-of-joined link features of the previous snapshot, and
    windowed features. ``html`` is never read (column pruning happens at
    the caller's ``read_parquet``).
    """
    tagged, plan = flatten_dataset(
        pages_ds, PAGE_SPEC, emit="tagged", concurrency=flatten_concurrency
    )
    # the tagged table fans out to main + child consumers; materialize ONCE
    # so the (expensive) JSON-parse+flatten never re-executes — Ray pins
    # blocks in the object store and spills under pressure
    tagged = tagged.materialize()
    tables = split_tagged(tagged, plan)
    main = tables["pages"]
    links = tables.get("pages_meta_links")

    # 1 row per (url, warc_ts): the composite _id is constant within the
    # group (it hashes the key), so break ties on content — text gives a
    # deterministic winner for conflicting same-timestamp crawls
    main = dedup_exact(main, keys=["url", "warc_ts"], order_by=["text"],
                       num_buckets=num_buckets).materialize()  # feeds id_map AND the join left side

    # feature side: link aggregates per page snapshot (keyed by root id)
    # materialized: the join below probes the schema AND unions this
    # dataset — without pinning, the groupby would execute twice
    feats = grouped_agg(
        links,
        keys=["_parent_id"],
        specs={
            "n_links": ("href", "count"),
            "mean_link_depth": ("depth", "mean"),
        },
    ).materialize()
    # attach the url/warc_ts of the owning snapshot (acting as the feature
    # timestamp) by joining back on the deterministic root id — both sides
    # are 1 row per snapshot, so a partitioned hash join
    id_map = main.map_batches(
        lambda df: df[["_id", "url", "warc_ts"]].rename(
            columns={"_id": "_parent_id", "warc_ts": "feature_ts"}
        ),
        batch_format="pandas",
    )
    feature_rows = hash_join(
        feats, id_map, on="_parent_id", num_buckets=num_buckets
    ).materialize()  # probed + unioned by the as-of join below

    # as-of join needs feature_ts strictly BEFORE equal-time self-matches
    # would be trivial; we keep exact-time matches (features of the current
    # snapshot are known at crawl time) — leakage contract is <=.
    left = main.map_batches(
        lambda df: df.drop(columns=[c for c in df.columns if c == TABLE_TAG]),
        batch_format="pandas",
    )
    joined = asof_join(
        left,
        feature_rows.map_batches(
            lambda df: df.drop(columns=["_parent_id"]), batch_format="pandas"
        ),
        key="url",
        left_ts="warc_ts",
        right_ts="feature_ts",
        right_cols=["n_links", "mean_link_depth"],
        num_buckets=num_buckets,
    )

    def windowed(part: pd.DataFrame) -> pd.DataFrame:
        part = with_lag(part, "url", ["n_links"])
        part = with_lead(part, "url", ["n_links"])
        part = sessionize(part, "url", "warc_ts", gap_seconds=session_gap_s)
        part = backfill(part, "url", ["mean_link_depth"])
        part = rolling_agg(
            part, "url", "warc_ts", "n_links", rolling_window_s, aggs=("count", "mean")
        )
        return part

    return apply_sorted(
        joined, ["url"], "warc_ts", windowed, num_buckets=num_buckets,
        tiebreak=["_id"],
    )


__all__ = ["page_features", "PAGE_SPEC"]
