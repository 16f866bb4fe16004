"""Relational building blocks: pre-aggregated groupby, broadcast join, top-k.

The reference has no joins/groupby/sort at all (SURVEY.md §2.5); these are
engine-native operators expressed Ray-Data-first:

* :func:`grouped_agg` — two-stage aggregation: vectorized PARTIAL
  aggregates inside ``map_batches`` (one row per key per batch) feed a
  small ``groupby().aggregate()`` shuffle. At 100 TB this moves per-batch
  partials, not rows, through the object store; hot keys are naturally
  salted by batch boundaries (each batch contributes one partial per key).
* :func:`broadcast_join` — dimension-table join with the small side
  shipped once via ``ray.put`` and merged per batch. No shuffle.
* :func:`topk` — per-batch local prune to k, then a tiny global sort.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd

_PARTIALS = {
    "sum": ("sum",),
    "count": ("count",),
    "mean": ("sum", "count"),
    "min": ("min",),
    "max": ("max",),
}


def grouped_agg(
    ds,
    keys: Sequence[str],
    specs: Mapping[str, tuple[str, str]],
    num_buckets: int = 64,
    exchange: str | None = None,
):
    """Grouped aggregation: vectorized partial aggregates per batch, then
    a hash-bucket shuffle and a pandas combine per bucket.

    The shuffle key is a SMALL int bucket column, not the raw key values —
    Ray's native groupby sort-shuffles on the full key, which is
    needlessly expensive for high-cardinality string keys; hashing to
    ``num_buckets`` gives the same co-location with an int sort. Partial
    pre-aggregation bounds shuffle volume at one row per key per batch
    (hot keys contribute one partial per batch — natural salting).

    ``specs``: output column name -> (input column, op) with op in
    sum/count/mean/min/max; ``count`` counts non-null values of the input
    column (SQL ``COUNT(col)``). Returns one row per key combo, columns
    named exactly as spec'd (oracle-SQL friendly).
    """
    from ..stages.partition import BUCKET_COL, add_bucket

    keys = list(keys)
    for alias, (col, op) in specs.items():
        if op not in _PARTIALS:
            raise ValueError(f"unsupported agg op {op!r} for {alias!r}")

    # partial columns needed, deduped: (col, partial_op) -> temp name
    partial_cols = {}
    for alias, (col, op) in specs.items():
        for p in _PARTIALS[op]:
            partial_cols.setdefault((col, p), f"__{p}_{col}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        out = {}
        for (col, p), name in partial_cols.items():
            # min_count=1: an all-null group must yield NULL like SQL SUM,
            # not pandas' default 0
            out[name] = (
                g[col].sum(min_count=1) if p == "sum" else getattr(g[col], p)()
            )
        return pd.DataFrame(out).reset_index()

    partials_ds = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        merged = {}
        for (col, p), name in partial_cols.items():
            if p == "sum":
                merged[name] = g[name].sum(min_count=1)
            elif p == "count":
                merged[name] = g[name].sum()
            else:
                merged[name] = getattr(g[name], p)()
        comb = pd.DataFrame(merged).reset_index()
        out = comb[keys].copy()
        for alias, (col, op) in specs.items():
            if op == "mean":
                out[alias] = (
                    comb[partial_cols[(col, "sum")]]
                    / comb[partial_cols[(col, "count")]]
                )
            elif op == "count":
                out[alias] = comb[partial_cols[(col, "count")]].astype("int64")
            else:
                out[alias] = comb[partial_cols[(col, op)]]
        return out

    from ..stages.partition import bucket_exchange, resolve_exchange

    if resolve_exchange(exchange) == "tasks":
        return bucket_exchange(partials_ds, keys, combine, num_buckets)
    partials = add_bucket(partials_ds, keys, num_buckets)
    return partials.groupby(BUCKET_COL).map_groups(combine, batch_format="pandas")


def grouped_count_distinct(
    ds,
    keys: Sequence[str] | str,
    col: str,
    out_col: str | None = None,
    num_buckets: int | None = None,
    exchange: str | None = None,
):
    """Exact per-key ``COUNT(DISTINCT col)`` in ONE exchange.

    Distinct counts are holistic (not pre-aggregable into scalars), but
    the *pair set* is: each batch first reduces to its distinct
    ``(keys, col)`` pairs, bounding shuffle volume at one row per
    observed pair per batch — at web scale this is the difference
    between shuffling every event and shuffling the (user, type)
    lattice. The bucket exchange then co-locates each key's pairs and a
    final per-bucket dedup + size() yields the exact count. Compare
    :func:`approx_distinct` (HyperLogLog) for the sketch form when the
    pair lattice itself is too wide.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"n_distinct_{col}"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[*keys, col]].drop_duplicates()

    pairs = ds.map_batches(partial, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([*keys, col])
        out = (
            d.groupby(keys, sort=False, dropna=False)
            .size()
            .reset_index(name=out_col)
        )
        out[out_col] = out[out_col].astype("int64")
        return out

    from ..stages.partition import bucket_exchange

    return bucket_exchange(pairs, keys, per_bucket, num_buckets)


def broadcast_join(
    ds,
    small: pd.DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    select: Sequence[str] | None = None,
):
    """Join a Dataset against a small in-memory table (dimension side).

    The small side is put in the object store ONCE and read zero-copy by
    every task — never re-shipped per batch. ``select`` optionally projects
    the small side (keys always kept).
    """
    import ray

    on = [on] if isinstance(on, str) else list(on)
    if select is not None:
        small = small[list(dict.fromkeys([*on, *select]))]
    ref = ray.put(small)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return df.merge(rhs, on=on, how=how)

    return ds.map_batches(merge, batch_format="pandas")


def hash_join(
    left_ds,
    right_ds,
    on: Sequence[str] | str,
    how: str = "inner",
    num_buckets: int = 64,
    exchange: str | None = None,
    post_fn=None,
):
    """Partitioned hash join, both sides large: pad to a common typed
    schema, tag, union, hash-bucket on the key(s), pandas merge per
    bucket. Each row moves exactly once. Non-key column names must be
    disjoint between the sides. ``exchange="tasks"`` (default) runs the
    bucket exchange on raw Ray tasks (no sort coordination —
    stages.partition.bucket_exchange); ``"groupby"`` uses the Ray Data
    sort-based groupby. ``post_fn`` (frame → frame) runs INSIDE each
    reduce task on that bucket's joined frame — join+aggregate fusion:
    a decomposable rollup applied here means the joined rows never
    leave the join task, only the partials do.
    """
    import pyarrow as pa

    from ..stages.common import arrow_schema, pad_to, union_schemas
    from ..stages.partition import BUCKET_COL, add_bucket, bucket_exchange

    on = [on] if isinstance(on, str) else list(on)
    side = "_join_side"
    left_schema = arrow_schema(left_ds)
    right_schema = arrow_schema(right_ds)
    overlap = (set(left_schema.names) & set(right_schema.names)) - set(on)
    if overlap:
        raise ValueError(f"non-key columns on both sides: {sorted(overlap)}")
    target = union_schemas(left_schema, right_schema, side)

    left_pad = left_ds.map_batches(pad_to(target, side, 0), batch_format="pyarrow")
    right_pad = right_ds.map_batches(pad_to(target, side, 1), batch_format="pyarrow")
    unioned = left_pad.union(right_pad)

    left_cols = list(left_schema.names)
    right_only = [n for n in right_schema.names if n not in left_schema.names]
    # pandas upcasts int columns to float when the other side's padding
    # nulls share the column in the unioned bucket frame; restore the
    # original integer dtypes after the merge (mirrors asof_join)
    int_cols = {
        f.name: f.type.to_pandas_dtype()
        for schema in (left_schema, right_schema)
        for f in schema
        if pa.types.is_integer(f.type)
    }

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        left = df[df[side] == 0][left_cols]
        right = df[df[side] == 1][[*on, *right_only]]
        out = left.merge(right, on=on, how=how)
        for col, dtype in int_cols.items():
            if col in out.columns and out[col].notna().all():
                out[col] = out[col].astype(dtype)
        return post_fn(out) if post_fn is not None else out

    from ..stages.partition import resolve_exchange

    if resolve_exchange(exchange) == "tasks":
        return bucket_exchange(unioned, on, per_bucket, num_buckets)
    bucketed = add_bucket(unioned, on, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def auto_join(
    left_ds,
    right_ds,
    on: str,
    broadcast_limit: int = 100_000,
    num_buckets: int = 64,
    post_fn=None,
):
    """ADAPTIVE physical join planning: probe the right side's row
    count (parquet-metadata cheap) and pick broadcast-map vs
    partitioned hash join at runtime — the decision a static pipeline
    author would otherwise hard-code and get wrong when a dimension
    grows. Broadcast path: right frame ships once via ``ray.put`` and
    every left batch merges map-side (zero shuffle); ``post_fn`` runs
    per batch there (same decomposable-rollup contract as hash_join's
    per-bucket fusion). Above the limit it degrades to
    :func:`hash_join` unchanged."""
    import ray

    n_right = int(right_ds.count())
    if n_right > broadcast_limit:
        return hash_join(left_ds, right_ds, on=on,
                         num_buckets=num_buckets, post_fn=post_fn)
    right = right_ds.to_pandas()
    ref = ray.put(right)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        out = df.merge(r, on=on, how="inner")
        return post_fn(out) if post_fn is not None else out

    return left_ds.map_batches(probe, batch_format="pandas")


def sorted_merge_join(
    left_ds,
    right_ds,
    on: str,
    num_buckets: int = 16,
    post_fn=None,
):
    """RANGE-partitioned sort-merge join on a single key — the physical
    alternative to :func:`hash_join` when downstream wants KEY ORDER:
    both sides route by the same sampled range cuts (co-partitioning by
    VALUE, not hash), each bucket sorts its two sides once and gathers
    matches with searchsorted bounds + one vectorized repeat/arange
    expansion — no per-row probing, no hash table. Output rows are
    globally ordered by the key (within and across buckets), so an
    ordered scan can consume the join without re-sorting. ``post_fn``
    fuses a rollup into the reduce tasks exactly like hash_join's.
    Non-key column names must be disjoint between the sides.
    """
    import pyarrow as pa

    from ..stages.common import arrow_schema, pad_to, union_schemas
    from ..stages.partition import bucket_exchange

    side = "_join_side"
    left_schema = arrow_schema(left_ds)
    right_schema = arrow_schema(right_ds)
    overlap = (set(left_schema.names) & set(right_schema.names)) - {on}
    if overlap:
        raise ValueError(f"non-key columns on both sides: {sorted(overlap)}")
    target = union_schemas(left_schema, right_schema, side)

    left_pad = left_ds.map_batches(pad_to(target, side, 0),
                                   batch_format="pyarrow")
    right_pad = right_ds.map_batches(pad_to(target, side, 1),
                                     batch_format="pyarrow")
    unioned = left_pad.union(right_pad).materialize()  # sample + route

    sample = unioned.map_batches(
        lambda df: df[[on]].iloc[:: max(1, len(df) // 32)],
        batch_format="pandas").to_pandas()
    keys_sorted = np.sort(sample[on].to_numpy())
    if len(keys_sorted) > 1:
        qpos = (np.linspace(0, 1, num_buckets + 1)[1:-1]
                * (len(keys_sorted) - 1)).astype(int)
        cuts = np.unique(keys_sorted[qpos])
    else:
        cuts = keys_sorted[:0]
    n_ranges = len(cuts) + 1

    def with_range(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(cuts, df[on].to_numpy(), side="right")
        return df.assign(_mj_rng=b.astype(np.int64))

    left_cols = list(left_schema.names)
    right_only = [n for n in right_schema.names if n not in left_schema.names]
    int_cols = {
        f.name: f.type.to_pandas_dtype()
        for schema in (left_schema, right_schema)
        for f in schema
        if pa.types.is_integer(f.type)
    }

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df[side] == 0]
        right = df[df[side] == 1]
        lk = left[on].to_numpy()
        order_l = np.argsort(lk, kind="mergesort")
        left = left.iloc[order_l]
        rk = right[on].to_numpy()
        order_r = np.argsort(rk, kind="mergesort")
        right = right.iloc[order_r]
        rk = rk[order_r]
        lk = lk[order_l]
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        counts = hi - lo
        left_idx = np.repeat(np.arange(len(lk)), counts)
        # right indices: for each left row, the run lo..hi-1 — built as
        # one cumsum-offset arange, no Python loop
        total = int(counts.sum())
        if total:
            starts = np.repeat(lo, counts)
            within = (np.arange(total)
                      - np.repeat(np.cumsum(counts) - counts, counts))
            right_idx = starts + within
        else:
            right_idx = np.empty(0, np.int64)
        out = pd.concat(
            [left.iloc[left_idx][left_cols].reset_index(drop=True),
             right.iloc[right_idx][right_only].reset_index(drop=True)],
            axis=1)
        for col, dtype in int_cols.items():
            if col in out.columns and len(out) and out[col].notna().all():
                out[col] = out[col].astype(dtype)
        return post_fn(out) if post_fn is not None else out

    routed = unioned.map_batches(with_range, batch_format="pandas")
    return bucket_exchange(routed, ["_mj_rng"], per_range,
                           num_buckets=n_ranges, bucket_col="_mj_rng")


def grouped_mode(
    ds,
    keys: Sequence[str],
    col: str,
    out_col: str | None = None,
    count_col: str = "n",
    num_buckets: int = 64,
    exchange: str | None = None,
):
    """Most frequent value of *col* per key group (argmax of counts),
    with a deterministic tie-break on the smaller value; null values are
    ignored (SQL aggregate semantics).

    Two bounded exchanges: per-batch partial counts at the (keys, col)
    grain cap shuffle volume at one row per distinct pair per batch (hot
    pairs self-salt), then the small count table re-keys by *keys* alone
    and each bucket picks its winners with one vectorized sort."""
    keys = list(keys)
    out_col = out_col or f"{col}_mode"

    filtered = ds.map_batches(
        lambda df: df[df[col].notna()][[*keys, col]], batch_format="pandas"
    )
    cnt = grouped_agg(filtered, [*keys, col], {count_col: (col, "count")},
                      num_buckets, exchange)

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*keys, count_col, col],
                            ascending=[*([True] * len(keys)), False, True],
                            kind="mergesort")
        out = df.drop_duplicates(subset=keys, keep="first")
        out = out.rename(columns={col: out_col})
        from ..stages.partition import BUCKET_COL

        return out.drop(columns=[BUCKET_COL], errors="ignore")

    from ..stages.partition import bucket_exchange, resolve_exchange

    if resolve_exchange(exchange) == "tasks":
        return bucket_exchange(cnt, keys, winner, num_buckets)
    from ..stages.partition import BUCKET_COL, add_bucket

    bucketed = add_bucket(cnt, keys, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(winner, batch_format="pandas")


def grouping_sets_agg(
    ds,
    keys: Sequence[str],
    specs: Mapping[str, tuple[str, str]],
    sets: Sequence[Sequence[str]],
    num_buckets: int = 64,
    exchange: str | None = None,
    coarse_buckets: int | None = None,
):
    """SQL ``GROUP BY GROUPING SETS (...)`` over the aggregation
    lattice, in exactly TWO exchanges regardless of how many sets:

    1. raw rows shuffle once at the finest (all-``keys``) grain;
    2. each finest row is replicated once per requested coarser set with
       its rolled-up keys nulled plus a set-id salt, and ONE further
       grouped aggregation combines them all — that exchange moves
       finest-cardinality × n_sets rows, never raw rows.

    Rolled-up key columns emit typed SQL NULLs. Ops are restricted to
    the decomposable set (sum/count/min/max; counts merge across levels
    by SUM). ``coarse_buckets`` sizes the second exchange — default
    ``min(num_buckets, 8)``, right for low-cardinality dimension keys;
    raise it toward ``num_buckets`` when the finest grain is
    high-cardinality (the coarse exchange carries finest-cardinality ×
    n_sets rows). Caveat: a rolled-up INTEGER key column travels
    null-padded (object/float) through the coarse exchange, so integer
    keys beyond 2^53 could lose precision in coarser levels; string
    dimension keys (the common case) are exact.
    """
    import numpy as np

    from ..stages.common import arrow_schema, pad_to

    keys = list(keys)
    sets = [tuple(s) for s in sets]
    if not sets:
        raise ValueError("grouping_sets_agg needs at least one grouping set")
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} has non-key columns {unknown}")
    bad = [a for a, (_, op) in specs.items()
           if op not in ("sum", "count", "min", "max")]
    if bad:
        raise ValueError(
            f"grouping-sets aggs must be decomposable (sum/count/min/max): {bad}"
        )
    respec = {a: (a, "sum" if op in ("sum", "count") else op)
              for a, (_, op) in specs.items()}
    count_aliases = [a for a, (_, op) in specs.items() if op == "count"]
    aliases = list(specs)

    def _int_counts(df: pd.DataFrame) -> pd.DataFrame:
        for a in count_aliases:
            df[a] = df[a].astype("int64")
        return df

    finest = grouped_agg(ds, keys, specs, num_buckets, exchange).materialize()
    coarse_sets = [s for s in sets if set(s) != set(keys)]
    include_finest = len(coarse_sets) != len(sets)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for i, s in enumerate(coarse_sets):
            f = df[[*keys, *aliases]].copy()
            for k in keys:
                if k not in s:
                    f[k] = None
            f["__gs"] = np.int64(i)
            frames.append(f)
        return pd.concat(frames, ignore_index=True)

    parts = []
    if include_finest:
        parts.append(finest)
    if coarse_sets:
        exploded = finest.map_batches(explode, batch_format="pandas")
        coarse = grouped_agg(
            exploded, ["__gs", *keys], respec,
            num_buckets=(coarse_buckets if coarse_buckets is not None
                         else min(num_buckets, 8)),
            exchange=exchange,
        )
        parts.append(coarse.map_batches(
            lambda df: _int_counts(df.drop(columns="__gs")),
            batch_format="pandas",
        ))
    target = arrow_schema(finest)
    out = parts[0] if include_finest else None
    for lvl in parts[1 if include_finest else 0:]:
        lvl = lvl.map_batches(pad_to(target), batch_format="pyarrow")
        out = lvl if out is None else out.union(lvl)
    return out


def rollup_agg(
    ds,
    keys: Sequence[str],
    specs: Mapping[str, tuple[str, str]],
    num_buckets: int = 64,
    exchange: str | None = None,
):
    """``GROUP BY ROLLUP (k1, k2, ...)``: the finest grain plus every
    key-prefix level plus the grand total — the prefix grouping sets,
    computed by :func:`grouping_sets_agg` in two exchanges total."""
    keys = list(keys)
    return grouping_sets_agg(
        ds, keys, specs,
        sets=[tuple(keys[:i]) for i in range(len(keys), -1, -1)],
        num_buckets=num_buckets, exchange=exchange,
    )


def cube_agg(
    ds,
    keys: Sequence[str],
    specs: Mapping[str, tuple[str, str]],
    num_buckets: int = 64,
    exchange: str | None = None,
):
    """``GROUP BY CUBE (k1, ..., km)``: every subset of the keys (2^m
    grouping sets), computed by :func:`grouping_sets_agg` in two
    exchanges total — the coarse exchange moves finest-cardinality × 2^m
    rows, never raw rows."""
    import itertools

    keys = list(keys)
    all_sets = [
        s for size in range(len(keys), -1, -1)
        for s in itertools.combinations(keys, size)
    ]
    return grouping_sets_agg(ds, keys, specs, sets=all_sets,
                             num_buckets=num_buckets, exchange=exchange)


def pivot_count(
    ds,
    keys: Sequence[str] | str,
    col: str,
    values: Sequence[str],
    num_buckets: int = 64,
    exchange: str | None = None,
):
    """Pivot *col*'s categorical values into per-key count columns
    (``n_<value>``) — SQL conditional aggregation
    ``SUM(CASE WHEN col = v THEN 1 ELSE 0 END)``. The category list is
    caller-supplied so the output schema is static (no discovery pass);
    unseen categories yield zero columns. One-hot encoding happens
    vectorized per batch, then :func:`grouped_agg` compresses to one row
    per key per batch before the bucket shuffle — at scale the exchange
    moves |keys| × |values| ints, never raw rows."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def onehot(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys].copy()
        for v in values:
            out[f"n_{v}"] = df[col].eq(v).astype("int64")
        return out

    enc = ds.map_batches(onehot, batch_format="pandas")
    return grouped_agg(enc, keys, {f"n_{v}": (f"n_{v}", "sum") for v in values},
                       num_buckets=num_buckets, exchange=exchange)


def grouped_corr(
    ds,
    keys: Sequence[str] | str,
    x: str,
    y: str,
    out_col: str = "corr_xy",
    num_buckets: int = 64,
    exchange: str | None = None,
):
    """Pearson correlation of (*x*, *y*) per key group, computed
    distributed from sufficient statistics: each batch contributes
    ``(n, Σx, Σy, Σx², Σy², Σxy)`` per key (vectorized), the combine sums
    them, and the closed form finishes on the combined row — rows never
    shuffle, only six doubles per key per batch. Pairs where either side
    is null are dropped (SQL ``CORR`` semantics); groups with < 2 pairs
    or zero variance yield NULL."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df[x].notna() & df[y].notna()
        d = df[ok]
        xs = d[x].astype("float64")
        ys = d[y].astype("float64")
        g = pd.DataFrame({
            **{k: d[k] for k in keys},
            "_n": 1.0, "_sx": xs, "_sy": ys,
            "_sxx": xs * xs, "_syy": ys * ys, "_sxy": xs * ys,
        }).groupby(keys, sort=False, as_index=False).sum()
        return g

    stats_cols = ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]
    parts = ds.map_batches(partial, batch_format="pandas")
    combined = grouped_agg(parts, keys, {c: (c, "sum") for c in stats_cols},
                           num_buckets=num_buckets, exchange=exchange)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n, sx, sy = df["_n"], df["_sx"], df["_sy"]
        cov = df["_sxy"] - sx * sy / n
        vx = df["_sxx"] - sx * sx / n
        vy = df["_syy"] - sy * sy / n
        denom = np.sqrt(vx * vy)
        df[out_col] = np.where((n >= 2) & (denom > 0), cov / denom, np.nan)
        return df[[*keys, out_col]]

    return combined.map_batches(finish, batch_format="pandas")


def range_join(
    left_ds,
    right_ds,
    on: Sequence[str] | str,
    left_ts: str,
    right_start: str,
    right_end: str,
    num_buckets: int | None = None,
    exchange: str | None = None,
):
    """Distributed interval (range) join: emit one output row per
    ``(left, right)`` pair sharing the equi-key(s) *on* with
    ``right.start <= left.ts <= right.end`` (SQL ``BETWEEN`` — both ends
    inclusive). Intervals may OVERLAP arbitrarily; each probe matches
    every interval that covers it.

    Ray Data has no native interval join; this is the SURVEY.md §2
    custom-operator composition: pad/tag/union both sides, ONE hash-bucket
    exchange on the equi-key (each row moves exactly once), then a fully
    vectorized per-bucket kernel. The kernel is two merge-ranks: probes
    are lexsorted by ``(key, ts)``; each interval's start (resp. end) is
    ranked into that order by one combined ``np.lexsort`` whose tie tag
    places the bound before (resp. after) equal probes, yielding for every
    interval the half-open probe index range ``[lo, hi)`` it covers; pairs
    are then emitted with one ragged ``np.repeat``/``arange`` gather — no
    per-key Python loop, O((n+m)·log(n+m) + output) per bucket.

    Non-key column names must be disjoint between sides. ``left_ts``,
    ``right_start`` and ``right_end`` must share a comparable dtype
    (timestamps are compared in the left column's resolution).
    """
    import pyarrow as pa

    from ..stages.common import arrow_schema, pad_to, union_schemas
    from ..stages.partition import (
        BUCKET_COL, add_bucket, bucket_exchange, default_num_buckets,
        resolve_exchange,
    )

    on = [on] if isinstance(on, str) else list(on)
    if num_buckets is None:
        num_buckets = default_num_buckets()
    side = "_join_side"
    left_schema = arrow_schema(left_ds)
    right_schema = arrow_schema(right_ds)
    overlap = (set(left_schema.names) & set(right_schema.names)) - set(on)
    if overlap:
        raise ValueError(f"non-key columns on both sides: {sorted(overlap)}")
    target = union_schemas(left_schema, right_schema, side)

    left_pad = left_ds.map_batches(pad_to(target, side, 0), batch_format="pyarrow")
    right_pad = right_ds.map_batches(pad_to(target, side, 1), batch_format="pyarrow")
    unioned = left_pad.union(right_pad)

    left_cols = list(left_schema.names)
    right_only = [n for n in right_schema.names if n not in left_schema.names]
    int_cols = {
        f.name: f.type.to_pandas_dtype()
        for schema in (left_schema, right_schema)
        for f in schema
        if pa.types.is_integer(f.type)
    }
    out_cols = [*left_cols, *right_only]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        left = df[df[side] == 0][left_cols].reset_index(drop=True)
        right = df[df[side] == 1][[*on, *right_only]].reset_index(drop=True)
        if left.empty or right.empty:
            return pd.DataFrame({c: pd.Series([], dtype=df[c].dtype)
                                 for c in out_cols})
        # joint key factorization (vectorized, composite-key safe)
        combined = pd.concat([left[on], right[on]], ignore_index=True)
        codes = combined.groupby(on, sort=False).ngroup().to_numpy()
        lc, rc = codes[: len(left)], codes[len(left):]
        ts_dtype = left[left_ts].dtype
        lt = left[left_ts].to_numpy()
        rs = right[right_start].astype(ts_dtype).to_numpy()
        re = right[right_end].astype(ts_dtype).to_numpy()

        order_p = np.lexsort((lt, lc))
        pc, pt = lc[order_p], lt[order_p]
        n_p, n_r = len(pc), len(rc)

        def merge_rank(bound, bound_after_equal_probes: bool):
            # Rank each interval bound into the (key, ts)-sorted probe
            # order; the tie tag decides whether probes EQUAL to the bound
            # sort before it (end bound → counted) or after (start bound →
            # not counted). At a bound's merged position the inclusive
            # cumsum of is_probe IS the exclusive probe count (the bound
            # itself contributes 0), which is exactly lo / hi.
            mc = np.concatenate([pc, rc])
            mt = np.concatenate([pt, bound])
            bound_tag = np.int8(1 if bound_after_equal_probes else 0)
            tag = np.concatenate([
                np.full(n_p, np.int8(1) - bound_tag), np.full(n_r, bound_tag),
            ])
            order = np.lexsort((tag, mt, mc))
            is_probe = (order < n_p)
            pos = np.cumsum(is_probe)
            out = np.empty(n_r, dtype=np.int64)
            ivl_pos = np.nonzero(~is_probe)[0]
            out[order[ivl_pos] - n_p] = pos[ivl_pos]
            return out

        lo = merge_rank(rs, bound_after_equal_probes=False)
        hi = merge_rank(re, bound_after_equal_probes=True)
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame({c: pd.Series([], dtype=df[c].dtype)
                                 for c in out_cols})
        ridx = np.repeat(np.arange(n_r), counts)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pidx = np.arange(total) - np.repeat(offsets, counts) + np.repeat(lo, counts)
        lrows = left.iloc[order_p[pidx]].reset_index(drop=True)
        rrows = right.iloc[ridx][right_only].reset_index(drop=True)
        out = pd.concat([lrows, rrows], axis=1)
        for col, dtype in int_cols.items():
            if col in out.columns and out[col].notna().all():
                out[col] = out[col].astype(dtype)
        return out

    if resolve_exchange(exchange) == "tasks":
        return bucket_exchange(unioned, on, per_bucket, num_buckets)
    bucketed = add_bucket(unioned, on, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def global_percent_rank(
    ds,
    col: str,
    out_col: str = "pct_rank",
    num_buckets: int = 16,
    exchange: str | None = None,
):
    """``PERCENT_RANK() OVER (ORDER BY col)`` — a GLOBAL window — with
    NO global sort: one grouped count by value builds the histogram
    (tiny relative to the data whenever the value domain is bounded —
    lengths, scores, counts), the cumulative distribution is assembled
    once on the driver and broadcast, and each row maps to its
    rows-below count. ``percent_rank = rows_below / (N - 1)`` is an
    exact integer ratio — bit-identical to the SQL window, no rounding.

    NULL values get a NULL rank and don't count toward N (pass a
    non-null column for exact SQL parity — SQL windows order NULLs into
    the frame). Caveat: the HISTOGRAM must fit the driver, not the
    data; for unbounded real-valued columns use
    :func:`approx_grouped_quantile` instead."""
    import ray

    ds = ds.materialize()  # consumed twice: histogram pass + rank pass
    hist = grouped_agg(
        ds.map_batches(lambda df: df[[col]], batch_format="pandas"),
        [col], {"n": (col, "count")},
        num_buckets=num_buckets, exchange=exchange,
    ).to_pandas()
    # a NULL group would pollute the CDF (and NaN can match NaN in map)
    hist = hist[hist[col].notna()].sort_values(col).reset_index(drop=True)
    n_total = int(hist["n"].sum())
    below = np.cumsum(hist["n"].to_numpy(np.int64)) - hist["n"].to_numpy(np.int64)
    ref = ray.put(pd.Series(below, index=hist[col].to_numpy()))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        cdf = ray.get(ref)
        b = df[col].map(cdf)
        df[out_col] = (
            b / (n_total - 1) if n_total > 1 else b.where(b.isna(), 0.0)
        )
        return df

    return ds.map_batches(rank, batch_format="pandas")


def profile_table(ds, columns, distinct_cap: int = 100_000):
    """ANALYZE-style column profile → pandas
    (column, n_rows, n_null, n_distinct, min_value, max_value).

    Three bounded passes over a materialized Dataset:
    * null/row counts — per-batch partials, driver sums scalars;
    * min/max — ONE Dataset aggregate pass (all columns together),
      computed on the RAW typed values (string rendering happens only
      at the end, so '9' < '10' string traps can't bite) and rendered
      with ``str()`` (== DuckDB ``CAST(x AS VARCHAR)`` for BIGINT and
      VARCHAR; profile timestamp/float columns at your own rendering
      risk);
    * EXACT distinct counts — per-batch value dedup then one column
      exchange (shuffle bounded by the value lattice, same contract as
      grouped_count_distinct); a column whose per-batch distinct set
      exceeds ``distinct_cap`` raises — use :func:`approx_distinct`
      for unbounded cardinalities."""
    from ray.data.aggregate import Max, Min

    from ..stages.partition import bucket_exchange

    ds = ds.materialize()  # three consumers
    counts = ds.map_batches(
        lambda df: pd.DataFrame({
            "column": pd.Series(list(columns), dtype="object"),
            "n_rows": np.int64(len(df)),
            "n_null": [np.int64(df[c].isna().sum()) for c in columns],
        }),
        batch_format="pandas",
    ).to_pandas().groupby("column", sort=False).agg(
        n_rows=("n_rows", "sum"), n_null=("n_null", "sum")
    ).reset_index()

    aggs = []
    for c in columns:
        aggs.extend([Min(c), Max(c)])
    mm = ds.aggregate(*aggs)
    minmax = pd.DataFrame({
        "column": list(columns),
        "min_value": [str(mm[f"min({c})"]) for c in columns],
        "max_value": [str(mm[f"max({c})"]) for c in columns],
    })

    def value_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            vals = df[c].dropna().unique()
            if len(vals) > distinct_cap:
                raise ValueError(
                    f"profile_table: column {c!r} exceeds distinct_cap="
                    f"{distinct_cap} in one batch; use approx_distinct"
                )
            rows.append(pd.DataFrame(
                {"column": c, "value": pd.Series(vals).astype(str)}
            ))
        return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
            {"column": pd.Series(dtype="object"),
             "value": pd.Series(dtype="object")}
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", sort=False)["value"]
        return g.nunique().rename("n_distinct").reset_index()

    distinct = bucket_exchange(
        ds.map_batches(value_partial, batch_format="pandas"),
        ["column"], finish, min(8, max(2, len(list(columns)))),
    ).to_pandas()
    out = counts.merge(distinct, on="column").merge(minmax, on="column")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out[["column", "n_rows", "n_null", "n_distinct",
                "min_value", "max_value"]].sort_values(
        "column").reset_index(drop=True)


def ordered_scan(
    ds,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    num_buckets: int = 16,
    exchange: str | None = None,
):
    """``SUM(value) OVER (ORDER BY order_col)`` — a GLOBAL ordered prefix
    sum — without a global sort: the classic distributed scan.

    1. deterministic range CUTS from a thin per-block sample of
       ``order_col`` (cuts only affect balance, never the result);
    2. one cheap pass computes per-range totals; the driver folds them
       into per-range OFFSETS (num_buckets values — broadcast);
    3. one range exchange; each range sorts locally and emits its local
       cumulative sum plus its offset.

    Tie semantics match the SQL default RANGE frame: rows with equal
    ``order_col`` all carry the cumulative sum through ALL their peers.
    Integer inputs stay integer (int64 cumsum — exact, SQL-hashable).
    ``order_col`` must be non-null. The building block for global
    cumulative totals and concat-and-chunk block assignment."""
    import ray

    from ..stages.partition import BUCKET_COL, bucket_exchange

    ds = ds.materialize()  # three consumers: sample, totals, exchange
    sample = ds.map_batches(
        lambda df: df[[order_col]].iloc[:: max(1, len(df) // 32)],
        batch_format="pandas",
    ).to_pandas()
    keys = np.sort(sample[order_col].to_numpy())
    if len(keys) > 1:
        qpos = (np.linspace(0, 1, num_buckets + 1)[1:-1]
                * (len(keys) - 1)).astype(int)
        cuts = np.unique(keys[qpos])
    else:
        cuts = keys[:0]
    nb = len(cuts) + 1

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(cuts, df[order_col].to_numpy(), side="right")
        return df.assign(_scan_bucket=b.astype(np.int64))

    bucketed = ds.map_batches(with_bucket, batch_format="pandas").materialize()

    # per-range totals → driver offsets (num_buckets scalars, never rows)
    totals = bucketed.map_batches(
        lambda df: df.groupby("_scan_bucket", sort=False)[value_col]
        .sum().rename("_s").reset_index(),
        batch_format="pandas",
    ).to_pandas()
    per_range = (
        totals.groupby("_scan_bucket")["_s"].sum()
        .reindex(range(nb), fill_value=0).to_numpy()
    )
    offsets = np.concatenate([per_range[:1] * 0, np.cumsum(per_range)[:-1]])
    off_ref = ray.put(offsets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            # a range with no rows still arrives as a typed empty slice
            df[out_col] = df[value_col]
            return df.drop(columns=["_scan_bucket", BUCKET_COL],
                           errors="ignore")
        offs = ray.get(off_ref)
        df = df.sort_values(order_col, kind="mergesort")
        cum = df[value_col].cumsum() + offs[int(df["_scan_bucket"].iloc[0])]
        df[out_col] = cum
        # SQL RANGE frame: every peer of an order value carries the sum
        # through the WHOLE peer group
        df[out_col] = df.groupby(order_col, sort=False)[out_col].transform(
            "max"
        )
        return df.drop(columns=["_scan_bucket", BUCKET_COL],
                       errors="ignore")

    return bucket_exchange(
        bucketed, ["_scan_bucket"], kernel, nb,
        bucket_col="_scan_bucket",
    )


def set_op(
    ds_a,
    ds_b,
    op: str,
    num_buckets: int | None = None,
    exchange: str | None = None,
):
    """Distributed SQL set operations with DISTINCT semantics:
    ``op="intersect"`` (rows in both inputs) or ``op="except"`` (rows in
    *ds_a* and not in *ds_b*), over full-row equality.

    One exchange: both sides are projected to the shared column list,
    side-tagged, and co-bucketed by the hash of ALL columns — every
    occurrence of a given row value lands in the same bucket, so the
    resolve is bucket-local: one vectorized groupby over the row columns
    computes min/max of the side tag per distinct row (``min==0`` ⇒ in
    A, ``max==1`` ⇒ in B). NULLs compare equal (SQL set-op semantics —
    ``groupby(dropna=False)``), and the output is distinct rows, like
    SQL ``INTERSECT`` / ``EXCEPT``."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")
    from ..stages.common import arrow_schema
    from ..stages.partition import (
        BUCKET_COL, add_bucket, bucket_exchange, resolve_exchange,
    )

    cols = list(arrow_schema(ds_a).names)
    cols_b = set(arrow_schema(ds_b).names)
    if set(cols) != cols_b:
        raise ValueError(
            f"set_op inputs must share columns: {sorted(cols)} vs {sorted(cols_b)}"
        )

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["_side"] = np.int64(side)
            return df
        return f

    unioned = ds_a.map_batches(tag(0), batch_format="pandas").union(
        ds_b.map_batches(tag(1), batch_format="pandas")
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols, sort=False, dropna=False)["_side"]
        mn, mx = g.min(), g.max()
        keep = (mn == 0) & (mx == 1) if op == "intersect" else (mn == 0) & (mx == 0)
        out = mn.index[keep.to_numpy()]
        return pd.DataFrame(
            {c: out.get_level_values(i) for i, c in enumerate(cols)}
            if len(cols) > 1 else {cols[0]: out.to_numpy()}
        )

    if num_buckets is None:
        from ..stages.partition import default_num_buckets

        num_buckets = default_num_buckets()
    if resolve_exchange(exchange) == "tasks":
        return bucket_exchange(unioned, cols, resolve, num_buckets)
    bucketed = add_bucket(unioned, cols, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda df: resolve(df.drop(columns=[BUCKET_COL])),
        batch_format="pandas",
    )


def table_diff(
    ds_a,
    ds_b,
    keys: Sequence[str] | str,
    num_buckets: int | None = None,
):
    """Distributed table reconciliation — the cross-run regression check:
    compare two runs of a pipeline (or a snapshot vs a rebuild) on a
    unique key and emit ONE row per differing key with
    ``status ∈ {'only_a', 'only_b', 'changed'}`` and
    ``n_cols_changed`` (count of non-key columns that differ, NULL-safe
    ``IS DISTINCT FROM`` semantics; 0 for one-sided keys). Matching keys
    with identical rows emit nothing, so the output is small whenever
    the tables mostly agree — the common case this exists for.

    Both sides must share a schema and have at most one row per key.
    ONE exchange: side-tag, union, hash-bucket by key; the per-bucket
    kernel does a vectorized outer merge + column-wise NULL-safe
    compare. Each row crosses the wire once.

    When the tables are IDENTICAL the result Dataset is empty, and a
    zero-row Ray Dataset loses its columns through ``to_pandas()`` —
    callers selecting columns from the diff must guard that case.
    """
    from ..stages.common import arrow_schema
    from ..stages.partition import bucket_exchange, default_num_buckets

    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = list(arrow_schema(ds_a).names)
    if set(cols) != set(arrow_schema(ds_b).names):
        raise ValueError("table_diff inputs must share columns")
    val_cols = [c for c in cols if c not in keys]

    def tag(side: int):
        # pyarrow, not pandas: a filtered-empty upstream block with an
        # object column would spam Ray's pandas block size estimator
        def f(t):
            import pyarrow as pa

            return t.select(cols).append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int64))
            )

        return f

    unioned = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")
    )

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["_side"] == 0]
        b = df[df["_side"] == 1]
        m = a.merge(b, on=keys, how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        status = m["_merge"].map(
            {"left_only": "only_a", "right_only": "only_b", "both": "changed"}
        ).astype(object)
        n_changed = np.zeros(len(m), dtype=np.int64)
        both = (m["_merge"] == "both").to_numpy()
        for c in val_cols:
            va, vb = m[f"{c}_a"], m[f"{c}_b"]
            na, nb = va.isna().to_numpy(), vb.isna().to_numpy()
            # IS DISTINCT FROM: NULL==NULL, NULL!=value, else !=
            same = (va == vb).to_numpy() | (na & nb)
            n_changed += (both & ~same).astype(np.int64)
        out = m[keys].copy()
        out["status"] = status
        out["n_cols_changed"] = n_changed
        # identical both-side rows are NOT differences
        return out[(~both) | (n_changed > 0)]

    return bucket_exchange(unioned, keys, diff,
                           num_buckets or default_num_buckets())


def semi_join(ds, keys_df: pd.DataFrame, on: Sequence[str] | str,
              anti: bool = False):
    """Semi/anti join: keep rows whose key IS (or is NOT) in the broadcast
    key set. The key set is shipped once via ``ray.put`` and probed per
    batch with a vectorized pandas isin/merge — no shuffle; at very large
    key-set sizes swap the set for a Bloom filter with the same call shape.
    """
    import ray

    on = [on] if isinstance(on, str) else list(on)
    key_set = keys_df[on].drop_duplicates()
    ref = ray.put(
        key_set if len(on) > 1 else set(key_set[on[0]])
    )

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        if len(on) == 1:
            mask = df[on[0]].isin(keys).to_numpy()
        else:
            # vectorized membership: left merge against the (unique) key
            # frame preserves left row order, so the hit flag aligns
            # positionally — no per-row tuple loop
            hit = df[on].merge(keys.assign(_hit=True), on=on, how="left")
            mask = hit["_hit"].notna().to_numpy()
        return df[~mask] if anti else df[mask]

    return ds.map_batches(probe, batch_format="pandas")


class BloomFilter:
    """Vectorized numpy Bloom filter (double hashing over the fixed-key
    siphash) — the broadcastable stand-in for a key SET when the set is
    too large to ship. Deterministic across processes."""

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        import math

        n_items = max(1, n_items)
        self.m = max(8, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        self.k = max(1, int(round(self.m / n_items * math.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    @staticmethod
    def _hashes(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        h1 = pd.util.hash_pandas_object(values, index=False).to_numpy()
        h2 = pd.util.hash_pandas_object(
            values, index=False, hash_key="fedcba9876543210"
        ).to_numpy() | np.uint64(1)
        return h1, h2

    def _positions(self, values: pd.Series) -> np.ndarray:
        h1, h2 = self._hashes(values)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add(self, values: pd.Series) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, values: pd.Series) -> np.ndarray:
        pos = self._positions(values)
        hit = (self.bits[pos >> np.uint64(6)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)


def bloom_prefilter(ds, keys: pd.Series, on: str, fp_rate: float = 0.01):
    """Approximate semi-join prefilter: keep rows whose key PROBABLY is in
    *keys* (no false negatives; ≤ fp_rate false positives). Use before an
    exact verify/join when the key set is too big to broadcast as a set —
    the filter is a fixed-size bit array regardless of set size."""
    import ray

    bloom = BloomFilter(len(keys), fp_rate)
    bloom.add(pd.Series(pd.unique(keys)))
    ref = ray.put(bloom)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        return df[ray.get(ref).contains(df[on])]

    return ds.map_batches(probe, batch_format="pandas")


def grouped_mad_outliers(
    ds,
    keys: Sequence[str] | str,
    col: str,
    thresh: float = 3.0,
    num_buckets: int | None = None,
):
    """Robust per-group outlier rows: ``|v − median| > thresh · MAD``
    (median absolute deviation — the robust z-score that a few extreme
    values cannot drag, unlike mean/std).

    Median and MAD are holistic, so each group's values are co-located
    by ONE bucket exchange (the grouped_quantile contract: per-group
    row counts bound task memory); median, deviations, MAD, and the
    outlier filter all run inside the same kernel — rows cross the
    wire once and only outliers come back. Both medians use the
    lower-median SELECTION (DuckDB ``quantile_disc`` rank
    ``(n-1)//2``), so every comparison is float-bit-exact against SQL.
    NULL values are ignored (they are never outliers).

    Groups are re-grouped INSIDE the kernel — small-domain keys hash
    into shared buckets and must never be treated as one group.
    """
    from ..stages.partition import BUCKET_COL, bucket_exchange

    keys = [keys] if isinstance(keys, str) else list(keys)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        out = []
        for _, g in df.groupby(keys, sort=False, dropna=False):
            g = g[g[col].notna()]
            if g.empty:
                continue
            v = g[col].to_numpy(dtype=np.float64)
            med = np.sort(v)[(len(v) - 1) // 2]
            ad = np.abs(v - med)
            mad = np.sort(ad)[(len(ad) - 1) // 2]
            out.append(g[ad > thresh * mad])
        return pd.concat(out) if out else df.iloc[0:0]

    return bucket_exchange(ds, keys, kernel, num_buckets)


def grouped_quantile(
    ds,
    keys: Sequence[str],
    col: str,
    quantiles: Sequence[float] = (0.5,),
    num_buckets: int | None = None,
    aliases: Sequence[str] | None = None,
):
    """Exact per-key quantiles (linear interpolation == SQL
    ``quantile_cont``). Quantiles are HOLISTIC — they cannot be
    pre-aggregated — so the value column shuffles whole: one bucket
    exchange co-locates each key's values and pandas computes the
    quantiles per key. At 100 TB prefer an approximate sketch (t-digest)
    upstream; this operator is the exact form for grading and for keys
    whose groups fit a worker."""
    from ..stages.partition import bucket_exchange

    keys = list(keys)
    quantiles = list(quantiles)
    names = list(aliases) if aliases else [
        f"{col}_p{int(q * 100)}" for q in quantiles
    ]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)[col]
        out = {}
        for q, name in zip(quantiles, names):
            out[name] = g.quantile(q, interpolation="linear")
        return pd.DataFrame(out).reset_index()

    return bucket_exchange(
        ds.select_columns([*keys, col]), keys, per_bucket, num_buckets
    )


def _quantile_from_centroids(v, w, qs):
    """numpy-``linear`` quantiles of the multiset where centroid value
    ``v[i]`` is repeated ``w[i]`` times — computed from the cumulative
    weights, never expanding. Exact when the centroids ARE the data
    (all weights 1)."""
    cum = np.cumsum(w)
    n = cum[-1]
    out = []
    for q in qs:
        p = q * (n - 1)
        lo, hi = int(np.floor(p)), int(np.ceil(p))
        vlo = v[np.searchsorted(cum, lo, side="right")]
        vhi = v[np.searchsorted(cum, hi, side="right")]
        out.append(vlo + (p - lo) * (vhi - vlo))
    return out


def approx_grouped_quantile(
    ds,
    keys: Sequence[str],
    col: str,
    quantiles: Sequence[float] = (0.5,),
    sketch_size: int = 256,
    num_buckets: int | None = None,
    aliases: Sequence[str] | None = None,
):
    """Per-key quantiles via a MERGEABLE equal-weight centroid sketch —
    the 100 TB companion to :func:`grouped_quantile` (which shuffles the
    whole value column because exact quantiles are holistic).

    Two levels, both vectorized:

    1. *Partial* (``map_batches``): per batch, sort ``(key, value)`` with
       one lexsort, assign each value to one of ``sketch_size``
       equal-count rank buckets inside its group (``floor((rank + 0.5)
       * m / group_size)``), and emit the per-bucket weighted mean +
       integer weight via two ``np.bincount`` calls. A group with ≤ m
       values maps each value to its own bucket, so small groups pass
       through EXACTLY. Shuffle volume is bounded at
       ``min(rows, m × keys × batches)`` — centroids move, not rows.
    2. *Combine* (one bucket exchange): per key, merge-sort the batch
       sketches' centroids, recompress to ≤ m equal-weight buckets
       (each centroid lands whole in one bucket, so weights stay
       integral), and read the quantiles off the cumulative weights with
       the same linear-interpolation convention as numpy / DuckDB
       ``quantile_cont``.

    Each compress pass merges values only within a ``total/m`` weight
    window, so the rank error after both levels is ≤ ``2n/m`` per key —
    and when every group has ≤ ``sketch_size`` values the result is
    bit-exact (pinned against :func:`grouped_quantile` in tests).
    """
    from ..stages.partition import bucket_exchange

    keys = list(keys)
    quantiles = list(quantiles)
    m = int(sketch_size)
    names = list(aliases) if aliases else [
        f"{col}_p{int(q * 100)}" for q in quantiles
    ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[col].notna()]
        if not len(df):
            return pd.DataFrame(
                {**{k: pd.Series(dtype=df[k].dtype) for k in keys},
                 "__qv": pd.Series(dtype="float64"),
                 "__qw": pd.Series(dtype="int64")})
        vals = df[col].to_numpy(dtype=np.float64)
        # int group codes in first-appearance order (null-safe, multi-key)
        codes = df.groupby(keys, sort=False, dropna=False).ngroup().to_numpy()
        firsts = np.flatnonzero(~pd.Series(codes).duplicated().to_numpy())
        keyframe = df[keys].iloc[firsts]  # row i <-> code i
        order = np.lexsort((vals, codes))
        gc, v = codes[order], vals[order]
        # within-group rank: position minus the group's start offset
        starts = np.flatnonzero(np.r_[True, gc[1:] != gc[:-1]])
        sizes = np.diff(np.r_[starts, len(gc)])
        rank = np.arange(len(gc)) - np.repeat(starts, sizes)
        bkt = ((rank + 0.5) * m // np.repeat(sizes, sizes)).astype(np.int64)
        slot = gc * m + np.minimum(bkt, m - 1)
        wsum = np.bincount(slot, minlength=len(sizes) * m)
        vsum = np.bincount(slot, weights=v, minlength=len(sizes) * m)
        nz = np.flatnonzero(wsum)
        out = pd.DataFrame({"__qv": vsum[nz] / wsum[nz],
                            "__qw": wsum[nz].astype(np.int64)})
        kf = keyframe.iloc[nz // m].reset_index(drop=True)
        return pd.concat([kf, out], axis=1)

    partials = ds.select_columns([*keys, col]).map_batches(
        partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in df.groupby(keys, sort=False, dropna=False):
            v = g["__qv"].to_numpy()
            w = g["__qw"].to_numpy(dtype=np.int64)
            order = np.argsort(v, kind="mergesort")
            v, w = v[order], w[order]
            if len(v) > m:  # recompress: whole centroids into rank buckets
                cum = np.cumsum(w)
                mid = cum - w / 2.0
                b = np.minimum((mid * m // cum[-1]).astype(np.int64), m - 1)
                wm = np.bincount(b, weights=w, minlength=m)
                vm = np.bincount(b, weights=v * w, minlength=m)
                nz = np.flatnonzero(wm)
                v, w = vm[nz] / wm[nz], wm[nz].astype(np.int64)
            qs = _quantile_from_centroids(v, w, quantiles)
            rows.append([*(kv if isinstance(kv, tuple) else (kv,)), *qs])
        return pd.DataFrame(rows, columns=[*keys, *names])

    return bucket_exchange(partials, keys, combine, num_buckets)


def hopping_window_agg(
    ds,
    key: str,
    ts: str,
    value: str,
    window_seconds: int,
    hop_seconds: int,
    id_col: str | None = None,
    num_buckets: int = 64,
):
    """Hopping (sliding) event-time windows: window length W, advancing
    by hop H (H divides W); every row lands in W/H windows. The explode
    is a vectorized ``np.repeat``/``tile`` inside ``map_batches`` —
    shuffle volume grows by the overlap factor W/H, which is the
    inherent cost of hopping windows — then the standard pre-aggregated
    ``grouped_agg`` combine. ``window_start`` is emitted as epoch
    SECONDS (int64) so results compare exactly across engines/SQL.
    """
    if window_seconds % hop_seconds:
        raise ValueError("hop_seconds must divide window_seconds")
    k = window_seconds // hop_seconds
    count_col = id_col or value

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ts_s = (
            df[ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
            // 1_000_000_000
        )
        base = (ts_s // hop_seconds) * hop_seconds
        offs = np.arange(k, dtype=np.int64) * hop_seconds
        ws = np.repeat(base, k) - np.tile(offs, n)
        out = df.loc[df.index.repeat(k), [key, count_col, value]].reset_index(
            drop=True
        )
        out["window_start"] = ws
        return out

    exploded = ds.select_columns(
        list(dict.fromkeys([key, ts, value, count_col]))
    ).map_batches(explode, batch_format="pandas")
    return grouped_agg(
        exploded, [key, "window_start"],
        {"n_events": (count_col, "count"), "sum_value": (value, "sum")},
        num_buckets=num_buckets,
    )


class HyperLogLog:
    """Vectorized numpy HyperLogLog (2^p registers, the standard bias
    correction for the 64-bit-hash variant): a fixed-size mergeable
    sketch for distinct counts — the scale path where COUNT(DISTINCT)'s
    full shuffle is not worth it. Deterministic (fixed-key siphash)."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, values: pd.Series) -> None:
        h = pd.util.hash_pandas_object(values, index=False).to_numpy()
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of `rest` + 1, capped at 64-p+1
        rank = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # float64 log2 is exact for the leading-bit position
            top = np.floor(np.log2(rest[nz].astype(np.float64))).astype(
                np.int64
            )
            rank[nz] = (63 - top + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def count(self) -> int:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        return int(round(est))


def approx_distinct(ds, col: str, p: int = 14) -> int:
    """Approximate COUNT(DISTINCT col): per-batch HLL sketches (one
    fixed-size register array each) merged on the driver — no shuffle,
    O(2^p) driver state regardless of cardinality. Typical error
    ~1.04/sqrt(2^p) ≈ 0.8% at p=14."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add(df[col].dropna())
        return pd.DataFrame({"registers": [h.registers.tobytes()]})

    parts = ds.select_columns([col]).map_batches(
        sketch, batch_format="pandas"
    ).to_pandas()
    merged = HyperLogLog(p)
    for raw in parts["registers"]:
        merged.registers = np.maximum(
            merged.registers, np.frombuffer(raw, dtype=np.uint8)
        )
    return merged.count()


def hll_md5_registers(ds, col: str, p: int = 12):
    """HyperLogLog register table with an md5 token hash — the sketch
    STATE itself is SQL-replayable (integer-exact), so the distributed
    sketch build gets a real DuckDB oracle instead of a rows-only check.

    Hash: first 8 bytes of ``md5(str(value))`` big-endian (DuckDB
    ``CAST(CONCAT('0x', substring(md5(v),1,16)) AS UBIGINT)``);
    ``register = h >> (64-p)``; ``rest = (h & (2^(64-p)-1)) << p`` (the
    masked form — identical on both sides, no wraparound semantics to
    trust); ``rank`` = leading-zero count of ``rest`` + 1, capped at
    ``64-p+1``, found by an exact vectorized bit scan (NOT float log2 —
    values within 2^11 of 2^64 round UP to 2^64 in float64 and misplace
    the leading bit). Returns a pandas frame of the NONZERO registers
    ``(register, max_rank)`` sorted by register; per-batch partial
    registers merge with a tiny ``max`` exchange (≤2^p rows per batch).
    The derived cardinality estimate is pinned separately in tests —
    its bias-correction branch needs ``ln``, which is not
    cross-engine-exact."""
    mask = np.uint64((1 << (64 - p)) - 1)
    cap = 64 - p + 1

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        vals = df[col].dropna()
        uniq = pd.unique(vals.astype(str))
        if len(uniq) == 0:
            return pd.DataFrame(
                {"register": pd.Series([], dtype="int64"),
                 "max_rank": pd.Series([], dtype="int64")}
            )
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
             for u in uniq),
            dtype=np.uint64, count=len(uniq),
        )
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h & mask) << np.uint64(p)
        # exact leading-bit scan: rank = first set bit position + 1
        rank = np.full(len(h), cap, dtype=np.int64)
        unset = np.ones(len(h), dtype=bool)
        for b in range(64 - p):
            hit = unset & (((rest >> np.uint64(63 - b)) & np.uint64(1)) == 1)
            rank[hit] = b + 1
            unset &= ~hit
            if not unset.any():
                break
        out = pd.DataFrame({"register": reg, "max_rank": rank})
        return out.groupby("register", as_index=False)["max_rank"].max()

    parts = ds.select_columns([col]).map_batches(sketch, batch_format="pandas")
    merged = grouped_agg(
        parts, ["register"], {"max_rank": ("max_rank", "max")}
    ).to_pandas()
    return merged.sort_values("register").reset_index(drop=True)


def hll_estimate_from_registers(regs: pd.DataFrame, p: int = 12) -> int:
    """Standard HLL estimate (with linear-counting small-range branch)
    from a :func:`hll_md5_registers` frame — driver-side, O(2^p)."""
    m = 1 << p
    registers = np.zeros(m, dtype=np.int64)
    registers[regs["register"].to_numpy()] = regs["max_rank"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -registers.astype(np.float64))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def topk(ds, by: Sequence[str] | str, k: int,
         descending: bool | Sequence[bool] = True):
    """Global top-k: per-batch prune to k rows, then one tiny sort.

    The shuffle sees at most ``k × num_batches`` rows regardless of input
    size. ``descending`` may be per-column (e.g. score DESC with an
    ascending string tiebreak).
    """
    by = [by] if isinstance(by, str) else list(by)
    desc = ([descending] * len(by) if isinstance(descending, bool)
            else list(descending))
    ascending = [not d for d in desc]

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=ascending,
                              kind="mergesort").head(k)

    pruned = ds.map_batches(local_prune, batch_format="pandas")
    return pruned.sort(by, descending=desc).limit(k)


def grouped_topk(
    ds,
    keys: Sequence[str] | str,
    by: str,
    k: int,
    descending: bool = True,
    tiebreak: Sequence[str] = (),
    num_buckets: int | None = None,
    exchange: str | None = None,
):
    """Top-k rows PER GROUP without a global sort (SQL ``ROW_NUMBER()
    OVER (PARTITION BY keys ORDER BY by) <= k``).

    Two-stage: each batch prunes every group it sees to its local top-k
    (so the shuffle carries at most ``k`` rows per group per batch —
    grouped-agg-style partial pre-aggregation, but for a holistic
    order statistic), then ONE bucket exchange co-locates each group's
    survivors and the same prune runs once more per bucket. No stage
    ever sorts more than a batch/bucket.

    NULL ``by`` values are dropped (SQL ``WHERE by IS NOT NULL`` —
    avoids engine-specific NULL-ordering divergence). Pass a total-order
    ``tiebreak`` (always ascending) for deterministic results under ties.
    """
    from ..stages.partition import BUCKET_COL, bucket_exchange

    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [by, *tiebreak]
    ascending = [not descending] + [True] * len(tiebreak)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[by].notna()]
        df = df.sort_values(order, ascending=ascending, kind="mergesort")
        out = df.groupby(keys, sort=False, dropna=False).head(k)
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    pruned = ds.map_batches(prune, batch_format="pandas")
    return bucket_exchange(pruned, keys, prune, num_buckets)


def unpivot(
    ds,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
):
    """Wide → long melt (SQL ``UNPIVOT``): each input row becomes
    ``len(value_cols)`` rows of (ids..., variable, value). Pure
    ``map_batches`` — zero shuffle, output streams at ``n × len(value_
    cols)`` rows regardless of scale."""
    id_cols, value_cols = list(id_cols), list(value_cols)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(id_vars=id_cols, value_vars=value_cols,
                       var_name=var_name, value_name=value_name)

    return ds.map_batches(melt, batch_format="pandas")


def exact_quantiles(
    ds,
    col: str,
    qs: Sequence[float],
    num_bins: int = 4096,
    driver_cap: int = 1_000_000,
    max_rounds: int = 8,
    ranks: Sequence[int] | None = None,
) -> list[float]:
    """EXACT global order statistics (DuckDB ``quantile_disc``: the
    element at 0-indexed rank ``ceil(q·n)−1`` — probed empirically
    against DuckDB 1.x; NOT ``floor(q·(n−1))``, which only coincides
    when ``q·n`` is an integer) without a global sort.

    Iterative histogram refinement: a first pass computes (n, min, max);
    each refinement pass streams the column once, counting values below
    the current search range and a ``num_bins`` histogram inside it, so
    the driver narrows each rank's candidate range by ~``num_bins``× per
    round while only ever receiving O(num_bins) counters per batch.
    When a range's candidate count fits ``driver_cap`` the (small)
    candidate values are pulled and selected exactly. Selecting an
    ACTUAL element makes the result float-bit-exact against SQL — no
    interpolation, no rounding pact needed.

    Cost: O(rounds) streaming scans of one column SHARED by all ranks
    (every round runs ONE scan computing per-rank histograms — k
    quantiles cost the same number of passes as one). NaN/NULL are
    ignored, like SQL aggregates.
    """
    qs = list(qs)
    if ranks is not None:
        ranks = list(ranks)

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"lo": [], "hi": [], "n": []})
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()],
                             "n": [np.int64(len(v))]})

    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        return [float("nan")] * len(qs if ranks is None else ranks)
    n = int(mm["n"].sum())
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())
    if ranks is None:
        # 0-indexed target ranks (quantile_disc convention)
        ranks = [min(max(int(np.ceil(q * n)) - 1, 0), n - 1) for q in qs]
    else:
        # caller-supplied 0-indexed ranks (e.g. quantile_cont needs the
        # two elements straddling the virtual index)
        ranks = [min(max(int(r), 0), n - 1) for r in ranks]

    states = [{"lo": glo, "hi": ghi, "prev": None, "done": False,
               "val": float("nan")} for _ in ranks]

    def _multi_hist(ranges):
        """ONE scan serving every active rank: per range (idx, lo, hi)
        emit (#values < lo, per-bin counts in [lo, hi]); the bin rule
        (trunc((v-lo)/width) clipped) is shared with the candidate pull
        so membership is identical."""
        specs = [(i, lo, hi, (hi - lo) / num_bins or 1.0)
                 for i, lo, hi in ranges]

        def hist(df: pd.DataFrame) -> pd.DataFrame:
            v = df[col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            idxs, bins, cnts = [], [], []
            for i, lo, hi, width in specs:
                below = np.int64((v < lo).sum())
                inr = v[(v >= lo) & (v <= hi)]
                b = np.minimum((inr - lo) / width,
                               num_bins - 1).astype(np.int64)
                cnt = np.bincount(b, minlength=num_bins)
                nz = np.flatnonzero(cnt)
                idxs.append(np.full(len(nz) + 1, i, dtype=np.int64))
                bins.append(np.r_[np.int64(-1), nz])
                cnts.append(np.r_[below, cnt[nz]])
            return pd.DataFrame({"i": np.concatenate(idxs),
                                 "bin": np.concatenate(bins),
                                 "cnt": np.concatenate(cnts)})

        parts = ds.map_batches(hist, batch_format="pandas").to_pandas()
        out = {}
        for i, lo, hi, width in specs:
            agg = parts[parts["i"] == i].groupby("bin")["cnt"].sum()
            below = int(agg.get(-1, 0))
            counts = np.zeros(num_bins, dtype=np.int64)
            present = agg.index[agg.index >= 0].to_numpy()
            counts[present] = agg.loc[present].to_numpy()
            out[i] = (below, counts, width)
        return out

    for _ in range(max_rounds):
        active = [(i, s["lo"], s["hi"]) for i, s in enumerate(states)
                  if not s["done"]]
        if not active:
            break
        hists = _multi_hist(active)
        pulls = []  # (idx, lo, hi, below) ready for exact selection
        for i, lo, hi in active:
            s = states[i]
            below, counts, width = hists[i]
            in_range = int(counts.sum())
            # a stalled range (no meaningful narrowing) means one
            # duplicated value owns the rank's neighborhood — bins can
            # never split a single value, so pull now: the pull is
            # bounded by that duplicate mass, which IS the candidate set
            stalled = (s["prev"] is not None
                       and in_range >= 0.9 * s["prev"])
            s["prev"] = in_range
            if in_range <= driver_cap or stalled:
                pulls.append((i, lo, hi, below))
                continue
            # locate the bin holding the rank; widen one bin each side —
            # the trunc-rule bin assignment and the next pass's
            # comparison-rule range test can disagree by one ulp at a
            # bin edge, and the slack makes that harmless
            cum = below + np.cumsum(counts)
            b = int(np.searchsorted(cum, ranks[i] + 1))
            new_lo = lo + (b - 1) * width if b > 0 else lo
            new_hi = lo + (b + 2) * width if b < num_bins - 1 else hi
            s["lo"], s["hi"] = max(lo, new_lo), min(hi, new_hi)
        if pulls:
            pspecs = [(i, lo, hi) for i, lo, hi, _ in pulls]

            def pull(df: pd.DataFrame) -> pd.DataFrame:
                v = df[col].to_numpy(dtype=np.float64)
                v = v[~np.isnan(v)]
                iarr, varr = [], []
                for i, lo, hi in pspecs:
                    m = (v >= lo) & (v <= hi)
                    iarr.append(np.full(int(m.sum()), i, dtype=np.int64))
                    varr.append(v[m])
                return pd.DataFrame({"i": np.concatenate(iarr),
                                     "v": np.concatenate(varr)})

            cands = ds.map_batches(pull, batch_format="pandas").to_pandas()
            for i, lo, hi, below in pulls:
                cv = np.sort(cands.loc[cands["i"] == i, "v"].to_numpy())
                states[i]["val"] = float(cv[ranks[i] - below])
                states[i]["done"] = True
    if any(not s["done"] for s in states):
        raise RuntimeError(
            f"exact_quantiles: range did not converge under "
            f"driver_cap={driver_cap} after {max_rounds} rounds "
            f"(heavily duplicated values?) — raise driver_cap"
        )
    return [s["val"] for s in states]


def sorted_neighborhood_pairs(
    ds,
    key_col: str,
    id_col: str,
    window: int,
    block: int = 4096,
    num_buckets: int | None = None,
):
    """Sorted-neighborhood blocking — the classic entity-resolution
    windowed SELF-JOIN: all (a, b) id pairs whose GLOBAL rank distance
    under ``ORDER BY key_col, id_col`` is < *window*, with no global
    sort and no all-pairs stage.

    Ranks come from the distributed ordered scan on a collision-free
    composite key (``key·2³¹ + id`` — both must be non-negative int64
    with ``id < 2³¹``); rows then route to rank-range buckets of size
    *block*, with the first ``window−1`` rows of each range ALSO
    borrowed by the previous bucket so cross-boundary pairs exist in
    exactly one bucket (pairs are generated only where the LOWER-rank
    row is bucket-owned — no pair dedup pass needed). The per-bucket
    kernel is vectorized: ranks inside a bucket are dense, so the
    off-by-k pair lists are plain array slices.
    """
    from ..stages.partition import bucket_exchange

    def key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        k = df[key_col].to_numpy(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 31)
                         or k.min() < 0):
            raise ValueError(
                "sorted_neighborhood_pairs needs 0 <= id < 2**31 and "
                "key >= 0 for the collision-free composite rank key"
            )
        return pd.DataFrame({
            id_col: ids,
            "_k": k * (1 << 31) + ids,
            "_one": np.ones(len(ids), np.int64),
        })

    scanned = ordered_scan(ds.map_batches(key, batch_format="pandas"),
                           "_k", "_one", out_col="_rn",
                           num_buckets=num_buckets or 16)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["_rn"].to_numpy(np.int64)
        prim = rn // block
        out = [pd.DataFrame({id_col: df[id_col], "_rn": rn, "_nb": prim,
                             "_own": np.int8(1)})]
        borrow = (rn % block) < (window - 1)
        if borrow.any():
            out.append(pd.DataFrame({
                id_col: df[id_col][borrow], "_rn": rn[borrow],
                "_nb": prim[borrow] - 1, "_own": np.int8(0)}))
        res = pd.concat(out, ignore_index=True)
        return res[res["_nb"] >= 0]

    routed = scanned.map_batches(assign, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        # distinct _nb ranges can hash-collide into one bucket frame:
        # the dense-rank slicing below is only valid WITHIN one range
        for _, g in df.groupby("_nb", sort=False):
            g = g.sort_values("_rn", kind="mergesort")
            ids = g[id_col].to_numpy()
            own = g["_own"].to_numpy()
            for off in range(1, window):
                if off >= len(ids):
                    break
                m = own[:-off] == 1  # pair owned by the lower-rank row
                out_a.append(ids[:-off][m])
                out_b.append(ids[off:][m])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    return bucket_exchange(routed, ["_nb"], pairs, num_buckets or 16)


def weighted_quantiles(
    ds,
    col: str,
    weight: str,
    qs: Sequence[float],
    num_bins: int = 4096,
    driver_cap: int = 1_000_000,
    max_rounds: int = 8,
) -> list[float]:
    """EXACT weighted quantiles without a global sort: the smallest
    value ``v`` whose cumulative weight reaches ``q·Σw`` (the standard
    weighted-median generalization; SQL mirror is
    ``MIN(v) WHERE SUM(w) OVER (ORDER BY v) >= q * total``).

    Same histogram-refinement scheme as :func:`exact_quantiles`, with
    weight MASS in place of row counts: each pass streams (col, weight)
    once and ships O(num_bins) weight sums; the candidate pull selects
    on an exact integer cumsum. Weights must be non-negative integers
    (int64 sums stay exact; the ``q·Σw`` threshold compare is exact in
    float for totals < 2^53). NULL values / weights are ignored.
    """
    qs = list(qs)

    def prep(df: pd.DataFrame):
        v = df[col].to_numpy(dtype=np.float64)
        w = df[weight].to_numpy(dtype=np.float64)
        ok = ~(np.isnan(v) | np.isnan(w))
        return v[ok], w[ok].astype(np.int64)

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        v, w = prep(df)
        if not len(v):
            return pd.DataFrame({"lo": [], "hi": [], "wsum": []})
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()],
                             "wsum": [np.int64(w.sum())]})

    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    if mm.empty or mm["wsum"].sum() == 0:
        return [float("nan")] * len(qs)
    total = int(mm["wsum"].sum())
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())
    thresholds = [q * total for q in qs]

    states = [{"lo": glo, "hi": ghi, "prev": None, "done": False,
               "val": float("nan")} for _ in thresholds]

    def _multi_hist(ranges):
        """ONE scan serving every active threshold: per range
        (idx, lo, hi) emit (weight below lo, per-bin weight sums)."""
        specs = [(i, lo, hi, (hi - lo) / num_bins or 1.0)
                 for i, lo, hi in ranges]

        def hist(df: pd.DataFrame) -> pd.DataFrame:
            v, w = prep(df)
            idxs, bins, cnts = [], [], []
            for i, lo, hi, width in specs:
                below = np.int64(w[v < lo].sum())
                m = (v >= lo) & (v <= hi)
                inr, winr = v[m], w[m]
                b = np.minimum((inr - lo) / width,
                               num_bins - 1).astype(np.int64)
                cnt = np.bincount(b, weights=winr,
                                  minlength=num_bins).astype(np.int64)
                nz = np.flatnonzero(cnt)
                idxs.append(np.full(len(nz) + 1, i, dtype=np.int64))
                bins.append(np.r_[np.int64(-1), nz])
                cnts.append(np.r_[below, cnt[nz]])
            return pd.DataFrame({"i": np.concatenate(idxs),
                                 "bin": np.concatenate(bins),
                                 "cnt": np.concatenate(cnts)})

        parts = ds.map_batches(hist, batch_format="pandas").to_pandas()
        out = {}
        for i, lo, hi, width in specs:
            agg = parts[parts["i"] == i].groupby("bin")["cnt"].sum()
            below = int(agg.get(-1, 0))
            counts = np.zeros(num_bins, dtype=np.int64)
            present = agg.index[agg.index >= 0].to_numpy()
            counts[present] = agg.loc[present].to_numpy()
            out[i] = (below, counts, width)
        return out

    for _ in range(max_rounds):
        active = [(i, s["lo"], s["hi"]) for i, s in enumerate(states)
                  if not s["done"]]
        if not active:
            break
        hists = _multi_hist(active)
        pulls = []
        for i, lo, hi in active:
            s = states[i]
            below, counts, width = hists[i]
            mass = int(counts.sum())
            stalled = s["prev"] is not None and mass >= 0.9 * s["prev"]
            s["prev"] = mass
            if mass <= driver_cap or stalled:
                pulls.append((i, lo, hi, below))
                continue
            cum = below + np.cumsum(counts)
            b = int(np.searchsorted(cum, thresholds[i], side="left"))
            new_lo = lo + (b - 1) * width if b > 0 else lo
            new_hi = lo + (b + 2) * width if b < num_bins - 1 else hi
            s["lo"], s["hi"] = max(lo, new_lo), min(hi, new_hi)
        if pulls:
            pspecs = [(i, lo, hi) for i, lo, hi, _ in pulls]

            def pull(df: pd.DataFrame) -> pd.DataFrame:
                v, w = prep(df)
                iarr, varr, warr = [], [], []
                for i, lo, hi in pspecs:
                    m = (v >= lo) & (v <= hi)
                    iarr.append(np.full(int(m.sum()), i, dtype=np.int64))
                    varr.append(v[m])
                    warr.append(w[m])
                return pd.DataFrame({"i": np.concatenate(iarr),
                                     "v": np.concatenate(varr),
                                     "w": np.concatenate(warr)})

            cands = ds.map_batches(pull, batch_format="pandas").to_pandas()
            for i, lo, hi, below in pulls:
                cand = (cands[cands["i"] == i]
                        .sort_values("v"))
                cw = below + cand["w"].cumsum().to_numpy()
                idx = int(np.searchsorted(cw, thresholds[i], side="left"))
                states[i]["val"] = float(
                    cand["v"].to_numpy()[min(idx, len(cw) - 1)])
                states[i]["done"] = True
    if any(not s["done"] for s in states):
        raise RuntimeError(
            "weighted_quantiles: range did not converge — raise "
            "driver_cap"
        )
    return [s["val"] for s in states]


def _frontier_2d(df: pd.DataFrame, x_col: str, y_col: str) -> pd.DataFrame:
    """Vectorized exact 2-D Pareto frontier (maximize both columns) of
    one in-memory frame. A row survives iff its ``y`` equals the max
    ``y`` among rows with the SAME ``x`` AND strictly exceeds the max
    ``y`` among rows with strictly GREATER ``x`` — duplicates of a
    frontier point all survive (neither dominates the other: dominance
    requires strict improvement in at least one dimension)."""
    if df.empty:
        return df
    d = df.sort_values([x_col, y_col], ascending=False, kind="mergesort")
    xv = d[x_col].to_numpy()
    yv = d[y_col].to_numpy()
    n = len(d)
    new_x = np.empty(n, dtype=bool)
    new_x[0] = True
    new_x[1:] = xv[1:] != xv[:-1]
    # y of the first row of each x-group == per-group max (sorted desc)
    gmax = yv[np.maximum.accumulate(np.where(new_x, np.arange(n), 0))]
    # running max of y over all rows of strictly-greater x-groups
    starts = np.flatnonzero(new_x)
    m1_group = np.full(len(starts), -np.inf)
    m1_group[1:] = np.maximum.accumulate(yv)[starts[1:] - 1]
    m1 = m1_group[np.cumsum(new_x) - 1]
    return d[(yv == gmax) & (yv > m1)]


def pareto_frontier(ds, x_col: str, y_col: str):
    """Exact distributed 2-D Pareto frontier: the rows not dominated by
    any other row, maximizing both *x_col* and *y_col*.

    Dominance is transitive, so a globally non-dominated row is also
    non-dominated inside its own block — the per-block vectorized
    frontier filter (:func:`_frontier_2d` in ``map_batches``) is a
    LOSSLESS prefilter that keeps ~O(log n) of n random rows per block.
    The exact frontier of the union of the local frontiers IS the
    global frontier, and that union is tiny (blocks × frontier size),
    so the final pass runs driver-side on the collected candidates —
    no shuffle, no all-pairs. NULLs in either column are dropped
    (SQL ``NOT EXISTS`` dominance treats them as incomparable; we
    exclude them like the oracle's WHERE clause)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[x_col].notna() & df[y_col].notna()]
        return _frontier_2d(df, x_col, y_col)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    return _frontier_2d(cand, x_col, y_col).reset_index(drop=True)


def audit_table(
    ds,
    null_cols: Sequence[str] = (),
    range_checks: Mapping[str, tuple] = None,
    set_checks: Mapping[str, Sequence] = None,
    unique_cols: Sequence[str] = (),
    num_buckets: int = 8,
):
    """Deequ-style single-pass data-quality audit: one row per check
    with its exact violation count.

    * ``null_cols`` — completeness: count of NULLs per column.
    * ``range_checks`` — ``{col: (lo, hi)}`` (either bound may be
      None): count of non-null values outside ``[lo, hi]``.
    * ``set_checks`` — ``{col: allowed_values}``: count of non-null
      values outside the allowed set.
    * ``unique_cols`` — uniqueness: ``COUNT(*) − COUNT(DISTINCT col)``
      (NULLs excluded from both, SQL COUNT semantics).

    Scale shape: every scalar check is a per-batch vectorized partial
    count (map-only — ONE pass over the data covers all of them
    together); uniqueness needs per-key counts, so each audited unique
    column adds one pre-aggregated exchange of (key, count) partials
    via :func:`grouped_agg`, never rows. The result is ≤ a few dozen
    rows regardless of input size."""
    range_checks = dict(range_checks or {})
    set_checks = {k: set(v) for k, v in (set_checks or {}).items()}

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        names, counts = [], []
        for c in null_cols:
            names.append(f"null:{c}")
            counts.append(int(df[c].isna().sum()))
        for c, (lo, hi) in range_checks.items():
            v = df[c].dropna()
            bad = pd.Series(False, index=v.index)
            if lo is not None:
                bad |= v < lo
            if hi is not None:
                bad |= v > hi
            names.append(f"range:{c}")
            counts.append(int(bad.sum()))
        for c, allowed in set_checks.items():
            v = df[c].dropna()
            names.append(f"in_set:{c}")
            counts.append(int((~v.isin(list(allowed))).sum()))
        return pd.DataFrame({"check_name": names,
                             "violations": np.asarray(counts, np.int64)})

    out = grouped_agg(ds.map_batches(partials, batch_format="pandas"),
                      ["check_name"], {"violations": ("violations", "sum")},
                      num_buckets=num_buckets).to_pandas()
    frames = [out[["check_name", "violations"]]]
    for c in unique_cols:
        per_key = grouped_agg(
            ds.map_batches(lambda df, c=c: df[[c]].dropna(),
                           batch_format="pandas"),
            [c], {"n": (c, "count")}, num_buckets=num_buckets)
        extra = per_key.map_batches(
            lambda df: pd.DataFrame(
                {"v": [int((df["n"] - 1).clip(lower=0).sum())]}),
            batch_format="pandas",
        ).to_pandas()["v"].sum()
        frames.append(pd.DataFrame({"check_name": [f"unique:{c}"],
                                    "violations": [int(extra)]}))
    res = pd.concat(frames, ignore_index=True)
    res["violations"] = res["violations"].astype("int64")
    return res.sort_values("check_name").reset_index(drop=True)


def grouped_linear_trend(
    ds,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    num_buckets: int | None = None,
):
    """Per-group least-squares TREND (slope of y over x) in EXACT
    integer arithmetic — the feature-engineering primitive ("is this
    customer's spend rising?") that naive float sums get wrong two ways
    at scale: catastrophic cancellation (``n·Σxy − Σx·Σy`` with
    ``Σx·Σy ≫ covariance``) and accumulation-order skew across blocks.

    Both inputs must be INTEGER columns (epoch days, cents). The slope
    is emitted as an exact rational — ``slope_num = n·Σxy − Σx·Σy`` and
    ``slope_den = n·Σx² − (Σx)²`` — as STRINGS (the values outgrow
    int64; the SQL mirror is HUGEINT cast to VARCHAR). A group with all
    x equal has ``slope_den = '0'`` (undefined trend, caller's choice).

    Distributed shape: each batch emits ONE sufficient-statistics row
    per group present (n, Σx, Σy, Σxy, Σx² — computed with Python
    unbounded ints so the map side is as overflow-proof as the
    combine), then one bucket exchange over the partials — shuffle
    volume is rows-per-key-per-batch, never data rows."""
    from ..stages.partition import bucket_exchange

    group_cols = list(group_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {**{c: df[c] for c in group_cols},
                 "n": pd.Series([], dtype="int64"),
                 **{c: pd.Series([], dtype=object)
                    for c in ("sx", "sy", "sxy", "sxx")}}
            )
        x = df[x_col].to_numpy(dtype=np.int64).astype(object)
        y = df[y_col].to_numpy(dtype=np.int64).astype(object)
        tmp = pd.DataFrame({
            **{c: df[c].to_numpy() for c in group_cols},
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
        })
        g = tmp.groupby(group_cols, sort=False)
        agg = g.agg(n=("sx", "size"), sx=("sx", "sum"), sy=("sy", "sum"),
                    sxy=("sxy", "sum"), sxx=("sxx", "sum")).reset_index()
        agg["n"] = agg["n"].astype("int64")
        for c in ("sx", "sy", "sxy", "sxx"):
            agg[c] = agg[c].map(lambda v: str(int(v)))
        return agg

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {**{c: df[c] for c in group_cols},
                 "n": pd.Series([], dtype="int64"),
                 "slope_num": pd.Series([], dtype=object),
                 "slope_den": pd.Series([], dtype=object)}
            )
        tmp = df.assign(**{c: df[c].map(int).astype(object)
                           for c in ("sx", "sy", "sxy", "sxx")})
        g = tmp.groupby(group_cols, sort=False)
        agg = g.agg(n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
                    sxy=("sxy", "sum"), sxx=("sxx", "sum")).reset_index()
        n = agg["n"].astype(object)
        num = n * agg["sxy"] - agg["sx"] * agg["sy"]
        den = n * agg["sxx"] - agg["sx"] * agg["sx"]
        out = agg[group_cols].copy()
        out["n"] = agg["n"].astype("int64")
        out["slope_num"] = num.map(lambda v: str(int(v)))
        out["slope_den"] = den.map(lambda v: str(int(v)))
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucket_exchange(partials, group_cols, combine, num_buckets)


def rrf_fuse(
    ds,
    group_cols: Sequence[str],
    id_col: str,
    metric_cols: Sequence[str],
    k: int = 60,
    top_n: int = 10,
    num_buckets: int | None = None,
):
    """Reciprocal-rank fusion (Cormack et al. 2009) of several ranked
    views of the same items: within each group, rank items by every
    metric independently (descending, ties broken by ascending id —
    ROW_NUMBER semantics) and fuse as ``score = Σ_m 1/(k + rank_m)``,
    keeping the ``top_n`` per group.

    Cross-engine float exactness: each term ``1.0/(k+rank)`` is ONE
    IEEE division of small ints and the terms are added strictly
    left-to-right in metric order — DuckDB evaluates the identical
    expression tree, so the binary64 score (and therefore the ordering
    and the driver value-hash) match bit-for-bit. ONE exchange keyed by
    group; only (group, id, metrics) tuples shuffle."""
    from ..stages.partition import BUCKET_COL, bucket_exchange

    group_cols = list(group_cols)
    metric_cols = list(metric_cols)

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        if len(df) == 0:
            return pd.DataFrame({
                **{c: df[c] for c in group_cols}, id_col: df[id_col],
                "rrf_score": pd.Series([], dtype="float64"),
            })
        df = df.reset_index(drop=True)
        score = np.zeros(len(df), dtype=np.float64)
        for m in metric_cols:
            s = df.sort_values(
                [*group_cols, m, id_col],
                ascending=[*([True] * len(group_cols)), False, True],
                kind="mergesort",
            )
            rank_sorted = (
                s.groupby(group_cols, sort=False).cumcount().to_numpy() + 1
            )
            rank = np.empty(len(df), dtype=np.int64)
            rank[s.index.to_numpy()] = rank_sorted
            score = score + 1.0 / (k + rank)
        out = df[[*group_cols, id_col]].copy()
        out["rrf_score"] = score
        out = out.sort_values(
            [*group_cols, "rrf_score", id_col],
            ascending=[*([True] * len(group_cols)), False, True],
            kind="mergesort",
        )
        return out.groupby(group_cols, sort=False).head(top_n)

    return bucket_exchange(ds, group_cols, per_group, num_buckets)


def join_delta(
    a_old,
    a_delta: pd.DataFrame,
    b_new,
    b_delta: pd.DataFrame,
    on: Sequence[str] | str,
):
    """Incremental JOIN view maintenance (insert-only IVM): given the
    PREVIOUS state of side A, this tick's inserts ΔA, the NEW state of
    side B and its inserts ΔB, emit exactly the join rows that are new
    this tick — ``ΔA ⋈ B_new  ∪  A_old ⋈ ΔB`` (the standard delta-rule
    identity: equals ``A_new⋈B_new − A_old⋈B_old`` for insert-only
    ticks, and the two parts are disjoint because every part-1 row has
    a new A and every part-2 row an old A). The maintained view is
    refreshed by appending the result — the old join NEVER re-runs.

    Scale shape: the deltas are the small sides — each is ``ray.put``
    once and probed inside ``map_batches`` while the big sides
    (``b_new``, ``a_old``) STREAM through map-only stages. Zero
    shuffle; the 100 TB base tables never move. Deltas must fit in a
    worker heap (they are one tick's inserts, not history).

    Key columns must carry the same names on both sides (rename
    upstream); non-key column names must be disjoint."""
    import ray

    on = [on] if isinstance(on, str) else list(on)
    a_ref = ray.put(a_delta)
    b_ref = ray.put(b_delta)

    def probe_with_a_delta(df: pd.DataFrame) -> pd.DataFrame:
        return ray.get(a_ref).merge(df, on=on)

    def probe_with_b_delta(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(b_ref), on=on)

    part1 = b_new.map_batches(probe_with_a_delta, batch_format="pandas")
    part2 = a_old.map_batches(probe_with_b_delta, batch_format="pandas")
    return part1.union(part2)


def seasonal_naive_backtest(
    ds,
    key_cols: Sequence[str],
    t_col: str,
    y_col: str,
    period: int,
    num_buckets: int | None = None,
):
    """Backtest of the seasonal-naive forecast ŷ(t) = y(t − period) on
    an integer-indexed series (key, t, y): per key, pair every point
    with the point one period earlier (JOIN on t − period, so gaps in
    the series skip a pair rather than silently comparing misaligned
    rows) and report n_pairs / sum-of-absolute-errors / max error —
    all exact BIGINT arithmetic (MAE = sae/n_pairs is the caller's one
    division). ONE exchange keyed by *key_cols*; the kernel groups by
    key internally, so a small key domain colliding into one bucket
    stays correct."""
    from ..stages.partition import BUCKET_COL, bucket_exchange

    key_cols = list(key_cols)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        empty = pd.DataFrame({
            **{c: df[c][:0] for c in key_cols},
            "n_pairs": pd.Series([], dtype="int64"),
            "sae": pd.Series([], dtype="int64"),
            "max_ae": pd.Series([], dtype="int64"),
        })
        if len(df) == 0:
            return empty
        cur = df[[*key_cols, t_col, y_col]]
        prev = cur.assign(**{t_col: cur[t_col] + period}).rename(
            columns={y_col: "_f"})
        j = cur.merge(prev, on=[*key_cols, t_col])
        if len(j) == 0:
            return empty
        j = j.assign(_ae=(j[y_col] - j["_f"]).abs().astype("int64"))
        out = (j.groupby(key_cols, sort=False)
               .agg(n_pairs=("_ae", "size"), sae=("_ae", "sum"),
                    max_ae=("_ae", "max")).reset_index())
        for c in ("n_pairs", "sae", "max_ae"):
            out[c] = out[c].astype("int64")
        return out

    return bucket_exchange(ds, key_cols, kernel, num_buckets)


__all__ = ["grouped_agg", "broadcast_join", "topk", "grouped_topk",
           "unpivot", "exact_quantiles", "grouped_mad_outliers",
           "grouped_quantile",
           "hopping_window_agg", "HyperLogLog", "approx_distinct",
           "range_join", "pivot_count", "grouped_corr", "set_op",
           "grouping_sets_agg", "rollup_agg", "cube_agg", "ordered_scan", "profile_table",
           "table_diff", "weighted_quantiles", "sorted_neighborhood_pairs",
           "pareto_frontier", "audit_table", "grouped_linear_trend",
           "rrf_fuse", "join_delta", "seasonal_naive_backtest"]
