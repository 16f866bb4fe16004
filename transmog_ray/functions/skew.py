"""Explicit skew handling for hot keys.

Two mechanisms (north_rule: "partitioning / shuffle / skew handled
explicitly"):

* **Aggregation paths** — :func:`salted_grouped_agg` splits each row's
  key into ``num_salts`` sub-keys before the exchange and merges the
  partials after, so a single hot key (one domain owning 30% of rows)
  spreads over ``num_salts`` reducers instead of melting one. The plain
  :func:`~transmog_ray.functions.relational.grouped_agg` already gets
  natural batch-level salting from partial pre-aggregation; explicit
  salting is for when per-batch partials are still too hot (few giant
  keys, many batches).
* **Order-sensitive paths** (as-of, lag, sessionize) CANNOT be salted —
  splitting a key breaks window semantics (SURVEY.md §7.4). There the
  lever is bucket count: a bucket holds whole key groups, so the widest
  single key bounds task memory, and :func:`detect_hot_keys` tells you
  which keys those are (cap them upstream or handle out-of-band).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd


def detect_hot_keys(
    ds, key: str, sample_fraction: float = 0.05, hot_share: float = 0.01,
    seed: int = 13,
) -> pd.DataFrame:
    """Estimate hot keys from a sample: keys whose sampled row share
    exceeds ``hot_share``. One cheap pass (sampled count groupby)."""
    sampled = ds.random_sample(sample_fraction, seed=seed)

    def count(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, sort=False).size().rename("n").reset_index()

    partials = sampled.map_batches(count, batch_format="pandas").to_pandas()
    totals = partials.groupby(key, sort=False)["n"].sum().reset_index()
    total = totals["n"].sum()
    if total == 0:
        return totals.assign(share=0.0).iloc[0:0]
    totals["share"] = totals["n"] / total
    return totals[totals["share"] >= hot_share].sort_values(
        "share", ascending=False
    ).reset_index(drop=True)


def heavy_hitters(
    ds,
    key: str,
    share: float,
    num_buckets: int = 16,
    exchange: str | None = None,
):
    """EXACT share-threshold heavy hitters (keys with ≥ ``share`` of all
    rows) without a full distinct-key shuffle — the deterministic
    complement of the sampled :func:`detect_hot_keys`.

    The pigeonhole guarantee: a key's global share is a weighted mean of
    its per-batch local shares, so global share ≥ t implies local share
    ≥ t in at least one batch. Pass 1 therefore emits, per batch, only
    the keys with LOCAL share ≥ t (≤ 1/t candidates per batch, one
    vectorized groupby) — no false negatives by construction. The driver
    holds just the deduped candidate set (≤ batches/t before dedup —
    tiny for any real t) plus the row count. Pass 2 recounts exactly:
    a broadcast-set semi-join keeps candidate rows, a partial-pre-agg
    grouped count gives exact totals (shuffle ≤ candidates × batches
    partial rows), and the final filter applies ``n ≥ ceil(t·N)``
    exactly as SQL ``HAVING COUNT(*) >= t * total``.

    Two passes over *ds* — pass it materialized. Returns (key, n) as a
    Ray Dataset — EXCEPT when the candidate pass proves the result empty,
    where a typed empty pandas DataFrame is returned instead (a zero-row
    Dataset loses its columns through ``to_pandas``); callers chaining
    Dataset ops must handle the DataFrame case.
    """
    from .relational import grouped_agg, semi_join

    def local_candidates(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL GROUP BY counts the NULL key group too
        c = df.groupby(key, sort=False, dropna=False).size()
        hot = c[c >= share * len(df)]
        return hot.index.to_frame(index=False, name=key)

    cand = (
        ds.map_batches(local_candidates, batch_format="pandas")
        .to_pandas().drop_duplicates()
    )
    if cand.empty or key not in cand.columns:
        # no key reached the local threshold in ANY batch → by the
        # pigeonhole bound the global result is exactly empty. Return a
        # TYPED empty pandas frame directly: a zero-row Ray Dataset
        # loses its columns through to_pandas() even when the schema is
        # known, which breaks both the recount path and schema compare.
        from ..stages.common import arrow_schema

        kdt = arrow_schema(ds).field(key).type.to_pandas_dtype()
        return pd.DataFrame(
            {key: pd.Series(dtype=kdt), "n": pd.Series(dtype="int64")}
        )
    n_total = ds.count()
    kept = semi_join(ds, cand, on=key)  # isin matches NaN keys too
    # COUNT(*) semantics (counts rows of a NULL key) needs a non-null
    # counter column — COUNT(key) would report 0 for the NULL group
    ones = kept.map_batches(
        lambda df: df.assign(__one=np.int64(1)), batch_format="pandas"
    )
    counted = grouped_agg(
        ones, [key], {"n": ("__one", "count")},
        num_buckets=num_buckets, exchange=exchange,
    )
    return counted.map_batches(
        lambda df: df[df["n"] >= share * n_total], batch_format="pandas"
    )


def salted_grouped_agg(
    ds,
    keys: Sequence[str],
    specs: Mapping[str, tuple[str, str]],
    num_salts: int = 8,
    num_buckets: int = 64,
    seed: int = 17,
):
    """Two-stage salted aggregation: stage 1 groups by (keys + salt) —
    spreading each key over ``num_salts`` reducers — stage 2 merges the
    per-salt partials. Same result as unsalted grouped_agg for every
    supported op (sum/count/min/max/mean decompose exactly)."""
    from .relational import _PARTIALS, grouped_agg
    from ..stages.partition import BUCKET_COL, add_bucket

    keys = list(keys)
    salt_col = "_salt"

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, len(df), int(df.index[0]) if len(df) else 0])
        )
        df[salt_col] = rng.integers(0, num_salts, len(df))
        return df

    # stage 1: aggregate per (keys, salt) — partial columns per op
    partial_specs: dict[str, tuple[str, str]] = {}
    for alias, (col, op) in specs.items():
        for p in _PARTIALS[op]:
            partial_specs[f"__{p}_{alias}"] = (col, p)
    salted = ds.map_batches(add_salt, batch_format="pandas")
    stage1 = grouped_agg(salted, [*keys, salt_col], partial_specs,
                         num_buckets=num_buckets)

    # stage 2: merge salt partials per key
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        merged: dict[str, pd.Series] = {}
        for alias, (col, op) in specs.items():
            if op == "mean":
                s = g[f"__sum_{alias}"].sum() / g[f"__count_{alias}"].sum()
            elif op == "sum":
                # min_count=1: an all-null group must stay SQL NULL when
                # the per-salt partials merge, matching grouped_agg
                s = g[f"__sum_{alias}"].sum(min_count=1)
            elif op == "count":
                s = g[f"__count_{alias}"].sum().astype("int64")
            else:
                s = getattr(g[f"__{op}_{alias}"], op)()
            merged[alias] = s
        return pd.DataFrame(merged).reset_index()

    bucketed = add_bucket(stage1, keys, num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return merge(df.drop(columns=[BUCKET_COL]))

    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def skew_join(
    left_ds,
    right_ds,
    on: str,
    hot_keys: Sequence | None = None,
    sample_fraction: float = 0.05,
    hot_share: float = 0.01,
    num_buckets: int | None = None,
    exchange: str | None = None,
):
    """Skew-aware inner hash join: hot keys bypass the shuffle.

    A partitioned hash join sends every row of a key to ONE reducer — a
    key owning 30% of the probe side melts that reducer. Here the hot
    keys (detected by :func:`detect_hot_keys` on a sample of the LEFT /
    probe side, or passed explicitly) take a BROADCAST path: the right
    side's hot-key rows are collected once, ``ray.put`` by
    :func:`~..functions.relational.broadcast_join`, and hot probe rows
    join map-side with no shuffle at all. The cold remainder goes
    through the regular partitioned
    :func:`~..functions.relational.hash_join`. Results are identical to
    a plain join regardless of which keys get classified hot — the
    split is a pure routing decision.

    Scale contract: the right side's HOT-key row set must fit in one
    worker's memory (hot keys are few by definition; a dimension-like
    or bounded-dup-factor right side). Inner joins only — an outer join
    would need cross-path bookkeeping for unmatched rows.
    """
    from .relational import broadcast_join, hash_join

    if hot_keys is None:
        hot_keys = detect_hot_keys(
            left_ds, on, sample_fraction=sample_fraction,
            hot_share=hot_share,
        )[on].tolist()
    hot = np.asarray(list(hot_keys))
    if len(hot) == 0:
        return hash_join(left_ds, right_ds, on=on,
                         num_buckets=num_buckets or 64, exchange=exchange)

    def keep_hot(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[on].isin(hot)]

    def drop_hot(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df[on].isin(hot)]

    right_hot = right_ds.map_batches(
        keep_hot, batch_format="pandas").to_pandas()
    hot_joined = broadcast_join(
        left_ds.map_batches(keep_hot, batch_format="pandas"),
        right_hot, on=on, how="inner",
    )
    cold_joined = hash_join(
        left_ds.map_batches(drop_hot, batch_format="pandas"),
        right_ds.map_batches(drop_hot, batch_format="pandas"),
        on=on, num_buckets=num_buckets or 64, exchange=exchange,
    )
    return hot_joined.union(cold_joined)


__all__ = ["detect_hot_keys", "salted_grouped_agg", "skew_join",
           "heavy_hitters", "count_min_sketch"]


class _CmsHasher:
    """Per-actor md5 bucket hasher with a key cache — the stateful part
    of the CMS map stage (``map_batches(Cls, concurrency=N)``): hash
    values are computed once per distinct key per actor, not per row."""

    def __init__(self, depth: int, width: int):
        import hashlib

        self._md5 = hashlib.md5
        self.depth = depth
        self.width = width
        self._cache: dict = {}

    def buckets(self, key) -> np.ndarray:
        got = self._cache.get(key)
        if got is None:
            got = np.array(
                [int(self._md5(f"{j}_{key}".encode()).hexdigest()[:8], 16)
                 % self.width for j in range(self.depth)],
                dtype=np.int64,
            )
            self._cache[key] = got
        return got


def count_min_sketch(
    ds,
    key: str,
    depth: int = 4,
    width: int = 512,
    num_buckets: int = 8,
):
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates: a ``depth × width`` counter grid where row *j* buckets
    key *k* at ``md5("{j}_{k}")[:8] % width`` — the repo's SQL-exact
    hash convention, so an oracle can replay the sketch cell-for-cell.
    Returns one row per distinct key: the EXACT count ``n`` and the
    sketch estimate ``cms_est = min_j cell[j][h_j(k)]`` (always ≥ n;
    equality iff no collision on some row).

    Scale shape — the reason sketches exist: the map side carries
    O(depth × width) fixed state per batch (never O(keys)); partial
    grids merge by addition through one tiny grouped exchange of
    (j, bucket, count) triples. The estimate pass broadcasts the merged
    grid (depth·width ints) via ``ray.put`` and maps over the distinct
    keys. Distinct keys come from the same exchange that computes the
    exact counts — at 100 TB the only key-proportional traffic is one
    pre-aggregated count per key per batch."""
    import ray

    from .relational import grouped_agg

    hasher = _CmsHasher(depth, width)

    def partial_grid(df: pd.DataFrame) -> pd.DataFrame:
        grid = np.zeros((depth, width), dtype=np.int64)
        counts = df.groupby(key, sort=False).size()
        for k, c in counts.items():
            grid[np.arange(depth), hasher.buckets(k)] += int(c)
        j, b = np.nonzero(grid)
        return pd.DataFrame({"j": j.astype(np.int64),
                             "b": b.astype(np.int64),
                             "cell": grid[j, b]})

    grid_ds = grouped_agg(
        ds.map_batches(partial_grid, batch_format="pandas"),
        ["j", "b"], {"cell": ("cell", "sum")}, num_buckets=num_buckets)
    grid_pd = grid_ds.to_pandas()
    merged = np.zeros((depth, width), dtype=np.int64)
    merged[grid_pd["j"].to_numpy(), grid_pd["b"].to_numpy()] = (
        grid_pd["cell"].to_numpy())
    grid_ref = ray.put(merged)

    exact = grouped_agg(ds, [key], {"n": (key, "count")},
                        num_buckets=num_buckets)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(grid_ref)
        h = _CmsHasher(depth, width)
        est = np.fromiter(
            (g[np.arange(depth), h.buckets(k)].min() for k in df[key]),
            np.int64, len(df))
        out = df[[key, "n"]].copy()
        out["cms_est"] = est
        return out

    return exact.map_batches(estimate, batch_format="pandas")
