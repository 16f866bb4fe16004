"""Hash partitioning and sorted-partition execution.

THE one shuffle that feeds every order-sensitive operator (as-of join,
lag/lead, sessionization, backfill, rolling windows): rows are hash-
bucketed by entity key, and each bucket is processed as a single sorted
pandas frame by ``groupby(_bucket).map_groups`` — so one task sees ALL
rows of each key it owns, in ``(key, ts, tiebreak)`` order. Downstream
operators are pure functions over that sorted frame and FUSE into one
pass (no second shuffle).

Scale notes (100 TB / multi-node):
* bucket count ``num_buckets`` must be ≫ total cores so stragglers are
  small and one bucket (not one key) bounds task memory; keys are never
  split across buckets, so the widest single key bounds the minimum.
* the bucket hash is ``pandas.util.hash_pandas_object`` — deterministic
  across processes/nodes (fixed siphash key), vectorized, no
  PYTHONHASHSEED dependence.
* order-sensitive ops cannot be key-salted without breaking window
  semantics; hot-KEY skew is handled by raising ``num_buckets`` (bucket
  ≈ few keys) and, for pure aggregations, by the salted two-stage
  aggregate in :mod:`transmog_ray.functions.agg` instead.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

BUCKET_COL = "_bucket"


def key_hash(frame: pd.DataFrame, keys: Sequence[str]) -> np.ndarray:
    """Deterministic uint64 hash of one or more key columns."""
    h = pd.util.hash_pandas_object(frame[keys[0]], index=False).to_numpy()
    for k in keys[1:]:
        h = h * np.uint64(1_000_003) ^ pd.util.hash_pandas_object(
            frame[k], index=False
        ).to_numpy()
    return h


def add_bucket(ds, keys: Sequence[str], num_buckets: int):
    """Append the hash-bucket column (vectorized, stateless map).

    Arrow-native: only the key columns are converted to pandas for the
    siphash — the (potentially wide) payload columns stay zero-copy Arrow.
    """
    import pyarrow as pa

    keys = list(keys)

    def bucketize(t: pa.Table) -> pa.Table:
        key_frame = t.select(keys).to_pandas()
        buckets = (key_hash(key_frame, keys) % np.uint64(num_buckets)).astype(
            np.int64
        )
        return t.append_column(BUCKET_COL, pa.array(buckets, pa.int64()))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def apply_sorted(
    ds,
    keys: Sequence[str],
    ts: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
    tiebreak: Sequence[str] = (),
):
    """Hash-partition by *keys*, sort each partition by (keys, ts, tiebreak),
    apply *fn* per sorted partition.

    *fn* may add columns, drop rows, or aggregate — anything with
    per-key-local semantics. Rows of one key never span partitions.
    """
    keys = list(keys)
    sort_cols = [*keys, ts, *tiebreak]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        out = fn(df)
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    bucketed = add_bucket(ds, keys, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


__all__ = ["BUCKET_COL", "key_hash", "add_bucket", "apply_sorted"]
