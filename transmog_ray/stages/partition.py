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

import os
from typing import Callable, Sequence

import numpy as np
import pandas as pd

BUCKET_COL = "_bucket"

#: max refs any single reduce/concat task takes as arguments. Above this
#: the exchange inserts tree levels of concat tasks (group size = this
#: cap), so per-task fan-in stays bounded no matter the shard count —
#: 10^5 input shards become ceil(log_64(10^5)) = 3 hops of ≤64-arg tasks
#: instead of one 10^5-arg reduce call.
DEFAULT_MAX_FANIN = int(os.environ.get("GRAFT_REDUCE_FANIN", "64"))


def default_num_buckets() -> int:
    """Cluster-scaled bucket count: ≈ total CPUs (min 16). One bucket per
    core keeps every reducer busy without the quadratic coordination cost
    of buckets ≫ cores; multi-node clusters get more buckets automatically
    because ``cluster_resources`` sums all nodes."""
    try:
        import ray

        if ray.is_initialized():
            return max(16, int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return max(16, os.cpu_count() or 8)


def default_exchange() -> str:
    """Physical exchange default: the raw-task bucket exchange ("tasks")
    everywhere — measured faster than the Dataset sort-based groupby at
    every parallelism level (BASELINE.md). ``GRAFT_DEFAULT_EXCHANGE``
    (or the legacy ``GRAFT_JOIN_EXCHANGE``) switches the fallback."""
    return os.environ.get(
        "GRAFT_DEFAULT_EXCHANGE",
        os.environ.get("GRAFT_JOIN_EXCHANGE", "tasks"),
    )


def resolve_exchange(exchange: str | None) -> str:
    return exchange if exchange else default_exchange()


def key_hash(frame: pd.DataFrame, keys: Sequence[str]) -> np.ndarray:
    """Deterministic uint64 hash of one or more key columns."""
    h = pd.util.hash_pandas_object(frame[keys[0]], index=False).to_numpy()
    for k in keys[1:]:
        h = h * np.uint64(1_000_003) ^ pd.util.hash_pandas_object(
            frame[k], index=False
        ).to_numpy()
    return h


def split_frame_by_hash(df: pd.DataFrame, col: str, num_buckets: int):
    """Split one pandas frame into ``num_buckets`` Arrow slices by key
    hash — the map-side shuffle-write kernel (one stable argsort,
    zero-copy slices). Shared by :func:`bucket_exchange`-style raw-task
    stages that build their own exchange (e.g. the Pregel pagerank)."""
    import pyarrow as pa

    t = pa.Table.from_pandas(df, preserve_index=False)
    if len(df) == 0:
        return tuple(t for _ in range(num_buckets))
    h = (key_hash(df[[col]], [col]) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(h, kind="stable")
    taken = t.take(pa.array(order))
    bounds = np.searchsorted(h[order], np.arange(num_buckets + 1))
    return tuple(
        taken.slice(bounds[b], bounds[b + 1] - bounds[b])
        for b in range(num_buckets)
    )


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


_CONCAT_REMOTE = None


def _concat_remote():
    """Lazily-built shared concat task (module import must not require a
    live Ray session)."""
    global _CONCAT_REMOTE
    if _CONCAT_REMOTE is None:
        import pyarrow as pa
        import ray

        @ray.remote
        def concat(*parts: pa.Table) -> pa.Table:
            live = [p for p in parts if p.num_rows]
            if not live:  # keep a schema-bearing empty if any part has one
                return next((p for p in parts if p.num_columns), parts[0])
            return pa.concat_tables(live, promote_options="permissive")

        _CONCAT_REMOTE = concat
    return _CONCAT_REMOTE


def _tree_concat(refs: list, max_fanin: int):
    """Bound per-task fan-in: while more than ``max_fanin`` part refs
    remain for a bucket, concat them in groups of ``max_fanin`` via
    intermediate tasks (each level frees its inputs, so the object store
    never holds more than two levels). Returns ≤ ``max_fanin`` refs."""
    concat = _concat_remote()
    while len(refs) > max_fanin:
        refs = [
            concat.remote(*refs[i : i + max_fanin])
            for i in range(0, len(refs), max_fanin)
        ]
    return refs


class _GroupedColumns:
    """Streaming collector for the [rows × buckets] shuffle matrix that
    bounds DRIVER ref count: each full group of ``max_fanin`` rows is
    eagerly folded into ONE concat ref per bucket as rows arrive (the
    concat overlaps the still-running splits), so the driver holds
    O(rows/max_fanin × buckets + max_fanin × buckets) refs instead of
    O(rows × buckets) — at 10^5 shards × 16 buckets that is ~25k refs,
    not 1.6M. A run that fits one group keeps raw refs (no extra hop —
    the ≤max_fanin case is byte-for-byte the old flat path)."""

    def __init__(self, num_buckets: int, max_fanin: int):
        self.num_buckets = num_buckets
        self.max_fanin = max_fanin
        self.cols: list[list] = [[] for _ in range(num_buckets)]
        self._group: list = []
        self._flushed = False

    def add(self, row_refs) -> None:
        self._group.append(row_refs)
        if len(self._group) >= self.max_fanin:
            self._flush(final=False)

    def _flush(self, final: bool) -> None:
        if not self._group:
            return
        if final and not self._flushed:
            # everything fit one group: raw refs, no extra hop
            for row in self._group:
                for b in range(self.num_buckets):
                    self.cols[b].append(row[b])
        else:
            concat = _concat_remote()
            for b in range(self.num_buckets):
                self.cols[b].append(
                    concat.remote(*[row[b] for row in self._group])
                )
            self._flushed = True
        self._group.clear()

    def finish(self) -> list[list]:
        self._flush(final=True)
        return self.cols


def bucket_exchange(
    ds,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
    only_buckets: Sequence[int] | None = None,
    with_bucket: bool = False,
    max_fanin: int | None = None,
    bucket_col: str | None = None,
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
    map-shuffle layout (O(blocks × buckets) small objects; the object
    store spills slices under pressure). When a bucket's part count
    exceeds ``max_fanin`` (default ``GRAFT_REDUCE_FANIN``, 64) the
    reduce becomes a TREE: intermediate concat tasks of ≤ ``max_fanin``
    parts each, so per-task argument counts stay bounded at any shard
    count (10^5 shards → 3 tree hops, never a 10^5-arg call). One of the
    few places the engine drops below the Dataset API — the Dataset
    groupby expresses the same semantics but pays a sort it doesn't need
    (SURVEY.md §2 custom-operator rule c). ``only_buckets`` restricts
    the REDUCE side to a subset (checkpoint resume: completed buckets
    never launch a task); ``with_bucket=True`` calls
    ``fn(frame, bucket_index)``. ``bucket_col`` routes each row by a
    PRECOMPUTED integer column in ``[0, num_buckets)`` instead of
    hashing ``keys`` — the identity exchange a sharded writer needs
    (bucket index == user-visible shard number, 1:1).

    EAGER at the upstream boundary: this function consumes
    ``ds.iter_internal_ref_bundles()`` at CALL time (that streaming
    launch — split tasks starting as upstream blocks appear — is what
    overlaps the split with the map stage feeding it and makes the
    exchange win; see BASELINE.md). Callers that build pipelines without
    consuming them should defer calling this until they mean to execute;
    the returned Dataset's reduce stage is still lazy.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    keys = list(keys)
    if num_buckets is None:
        num_buckets = default_num_buckets()
    if max_fanin is None:
        max_fanin = DEFAULT_MAX_FANIN

    @ray.remote(num_returns=num_buckets)
    def split(block):
        if not isinstance(block, pa.Table):  # pandas-backed upstream block
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0:
            # Ray Data emits zero-row (sometimes zero-COLUMN) filler
            # blocks from actor-pool stages; hashing would KeyError
            parts = tuple(block for _ in range(num_buckets))
            return parts if num_buckets > 1 else parts[0]
        if bucket_col is not None:
            h = block.column(bucket_col).to_numpy().astype(np.int64)
        else:
            key_frame = block.select(keys).to_pandas()
            h = (key_hash(key_frame, keys)
                 % np.uint64(num_buckets)).astype(np.int64)
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
            t = next((p for p in parts if p.num_columns), parts[0])
        else:
            t = pa.concat_tables(live, promote_options="permissive")
        if t.num_columns == 0:
            # all-filler bucket: ray.data map_batches SKIPS the UDF on
            # zero-row blocks and emits zero-COLUMN fillers, so a bucket
            # fed only fillers has an unknowable schema — don't hand the
            # kernel a schema-less frame, re-emit the filler (every
            # downstream consumer already guards num_rows == 0)
            return t
        frame = t.to_pandas()
        out = fn(frame, bucket) if with_bucket else fn(frame)
        return pa.Table.from_pandas(out, preserve_index=False)

    # stream split tasks as upstream blocks are produced — the split
    # stage overlaps the (possibly expensive) map stage feeding it; only
    # the reduce barrier waits for everything. Completed groups fold
    # into one ref per bucket as they fill (_GroupedColumns), bounding
    # both driver ref count and per-task fan-in at any shard count.
    grouped = _GroupedColumns(num_buckets, max_fanin)
    empty = True
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            refs = split.remote(block_ref)
            grouped.add([refs] if num_buckets == 1 else refs)
            empty = False
    if empty:  # upstream produced no blocks at all
        return rd.from_items([])
    cols = grouped.finish()
    buckets = range(num_buckets) if only_buckets is None else only_buckets
    outs = [
        reduce.remote(b, *_tree_concat(cols[b], max_fanin)) for b in buckets
    ]
    return rd.from_arrow_refs(outs)


def apply_sorted(
    ds,
    keys: Sequence[str],
    ts: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
    tiebreak: Sequence[str] = (),
    exchange: str | None = None,
):
    """Hash-partition by *keys*, sort each partition by (keys, ts, tiebreak),
    apply *fn* per sorted partition.

    *fn* may add columns, drop rows, or aggregate — anything with
    per-key-local semantics. Rows of one key never span partitions.
    ``exchange`` picks the physical shuffle: ``"tasks"`` (default —
    :func:`bucket_exchange`, no sort coordination, best measured
    core-scaling; eager at the upstream boundary, see its docstring) or
    ``"groupby"`` (Ray Data sort-based groupby — fully lazy fallback).
    """
    keys = list(keys)
    sort_cols = [*keys, ts, *tiebreak]
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        out = fn(df)
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    if resolve_exchange(exchange) == "tasks":
        return bucket_exchange(ds, keys, per_bucket, num_buckets)
    bucketed = add_bucket(ds, keys, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


__all__ = ["BUCKET_COL", "key_hash", "add_bucket", "apply_sorted",
           "bucket_exchange", "default_num_buckets", "default_exchange",
           "resolve_exchange"]
