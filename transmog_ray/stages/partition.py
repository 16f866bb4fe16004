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


def bucket_exchange(
    ds,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 32,
    only_buckets: Sequence[int] | None = None,
    with_bucket: bool = False,
):
    """Map-side bucket exchange on raw Ray tasks: each input block is
    split into per-bucket Arrow slices (one vectorized argsort, zero-copy
    ``take``), then one reduce task per bucket concatenates its slices
    and applies *fn* to the whole bucket frame.

    This replaces the sort-based ``groupby().map_groups`` exchange for
    the hot path: there is no global sort and no merge coordination —
    the split stage is embarrassingly parallel and each reduce depends
    only on its own column of the [blocks × buckets] object matrix, so
    the exchange scales with cores. The object matrix is the classic
    map-shuffle layout (O(blocks × buckets) small objects; at multi-node
    scale keep buckets ≈ a small multiple of total cores, and the object
    store spills slices under pressure). One of the few places the engine
    drops below the Dataset API — the Dataset groupby expresses the same
    semantics but pays a sort it doesn't need (SURVEY.md §2 custom-
    operator rule c). ``only_buckets`` restricts the REDUCE side to a
    subset (checkpoint resume: completed buckets never launch a task);
    ``with_bucket=True`` calls ``fn(frame, bucket_index)``.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    keys = list(keys)

    @ray.remote(num_returns=num_buckets)
    def split(block):
        if not isinstance(block, pa.Table):  # pandas-backed upstream block
            block = pa.Table.from_pandas(block, preserve_index=False)
        key_frame = block.select(keys).to_pandas()
        h = (key_hash(key_frame, keys) % np.uint64(num_buckets)).astype(np.int64)
        order = np.argsort(h, kind="stable")
        taken = block.take(pa.array(order))
        bounds = np.searchsorted(h[order], np.arange(num_buckets + 1))
        parts = tuple(
            taken.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(num_buckets)
        )
        return parts if num_buckets > 1 else parts[0]

    @ray.remote
    def reduce(bucket: int, *parts: pa.Table):
        live = [p for p in parts if p.num_rows]
        if not live:
            t = parts[0]
        else:
            t = pa.concat_tables(live, promote_options="permissive")
        frame = t.to_pandas()
        out = fn(frame, bucket) if with_bucket else fn(frame)
        return pa.Table.from_pandas(out, preserve_index=False)

    # stream split tasks as upstream blocks are produced — the split
    # stage overlaps the (possibly expensive) map stage feeding it; only
    # the reduce barrier waits for everything
    matrix = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            matrix.append(split.remote(block_ref))
    if not matrix:  # upstream produced no blocks at all
        return rd.from_items([])
    if num_buckets == 1:
        matrix = [[refs] for refs in matrix]
    buckets = range(num_buckets) if only_buckets is None else only_buckets
    outs = [
        reduce.remote(b, *[row[b] for row in matrix]) for b in buckets
    ]
    return rd.from_arrow_refs(outs)


def apply_sorted(
    ds,
    keys: Sequence[str],
    ts: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
    tiebreak: Sequence[str] = (),
    exchange: str = "groupby",
):
    """Hash-partition by *keys*, sort each partition by (keys, ts, tiebreak),
    apply *fn* per sorted partition.

    *fn* may add columns, drop rows, or aggregate — anything with
    per-key-local semantics. Rows of one key never span partitions.
    ``exchange`` picks the physical shuffle: ``"groupby"`` (Ray Data
    sort-based groupby — streaming, overlaps with upstream) or
    ``"tasks"`` (:func:`bucket_exchange` — no sort coordination, better
    core-scaling on large exchanges).
    """
    keys = list(keys)
    sort_cols = [*keys, ts, *tiebreak]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        out = fn(df)
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    if exchange == "tasks":
        return bucket_exchange(ds, keys, per_bucket, num_buckets)
    bucketed = add_bucket(ds, keys, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


__all__ = ["BUCKET_COL", "key_hash", "add_bucket", "apply_sorted",
           "bucket_exchange"]
