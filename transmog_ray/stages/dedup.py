"""Exact deduplication (hash-partition + deterministic first-per-key).

Near-duplicate detection (MinHash/LSH, SimHash, n-gram Jaccard,
embedding-cosine) lives in :mod:`transmog_ray.functions.neardup`.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .partition import BUCKET_COL, add_bucket


def dedup_exact(
    ds,
    keys: Sequence[str],
    order_by: Sequence[str] = (),
    num_buckets: int = 64,
    exchange: str | None = None,
):
    """Keep exactly one row per distinct *keys* combination.

    Deterministic winner: the first row under ``sort_values([*keys,
    *order_by])`` — pass a total-ordering ``order_by`` (e.g. a source row
    id) for stable results; without it ties are broken by partition-local
    input order.

    One shuffle (hash by keys; the raw-task bucket exchange by default,
    ``exchange="groupby"`` for the Ray Data sort-based path). Hash
    collisions are safe: rows in the same bucket are still deduped on the
    REAL key columns, and rows of one key can never land in different
    buckets.
    """

    keys = list(keys)
    order_by = list(order_by)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*keys, *order_by], kind="mergesort")
        out = df.drop_duplicates(subset=keys, keep="first")
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    from ..stages.partition import resolve_exchange

    if resolve_exchange(exchange) == "tasks":
        from .partition import bucket_exchange

        return bucket_exchange(ds, keys, per_bucket, num_buckets)
    bucketed = add_bucket(ds, keys, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


__all__ = ["dedup_exact"]
