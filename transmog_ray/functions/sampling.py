"""Deterministic sampling operators for corpus curation.

All sampling here is HASH-driven, never ``random()``: the same row set
in, the same sample out, on any cluster size, resumable mid-run — the
property a 100 TB curation pipeline needs (a re-run after a failure
must not re-draw the sample). The shared recipe is a Knuth
multiplicative hash of the integer id, ``(id * 2654435761) % 2**32``,
chosen because it is reproducible verbatim in ANSI SQL with plain
BIGINT arithmetic (contract: ids < 2**33 so the product can't overflow
BIGINT on the oracle side; cast to HUGEINT beyond that).

Three levels:

- :func:`hash_sample` — flat rate over the whole corpus; pure
  ``map_batches`` filter, embarrassingly parallel, zero shuffle.
- :func:`stratified_sample` — per-stratum rates (e.g. downsample
  dominant languages, keep the tail); still zero shuffle — each batch
  maps its strata to thresholds through one vectorized ``Series.map``.
- :func:`stratified_topn` — EXACTLY ``n`` rows per stratum (a
  deterministic distributed "reservoir"): the n smallest hash values
  within each stratum. Per-batch partial top-n bounds shuffle volume at
  ``n × strata × batches``; one bucket exchange finishes each stratum.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd

KNUTH = np.uint64(2654435761)
MOD32 = np.uint64(4294967296)


def knuth_hash(ids) -> np.ndarray:
    """``(id * 2654435761) % 2**32`` as uint64 — SQL-reproducible."""
    return (np.asarray(ids, dtype=np.uint64) * KNUTH) % MOD32


def hash_sample(ds, id_col: str, percent: int):
    """Keep rows whose ``knuth_hash(id) % 100 < percent``."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash(df[id_col].to_numpy())
        return df[(h % np.uint64(100)) < percent]

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample(ds, id_col: str, prob_fn, temperature: float = 1.0):
    """Deterministic per-row Bernoulli sampling with row-dependent keep
    probability — the corpus-MIXING primitive (keep high-quality docs
    at a higher rate; ``temperature`` flattens the mix: p^(1/T), T→∞ →
    uniform). ``prob_fn(df) -> Series in [0, 1]`` computes the base
    probability per row (e.g. from a quality score).

    Keep iff ``knuth_hash(id)/2^32 < p^(1/T)`` — no RNG state, the same
    rows survive on any cluster size and on re-run after failure, and
    the uniform-hash comparison is reproducible verbatim in SQL
    (``((id * 2654435761) % 4294967296) / 4294967296.0``). Zero
    shuffle; embarrassingly parallel.

    SQL-exactness caveat: ``temperature != 1`` routes through ``pow``,
    which is NOT correctly rounded and can differ by 1 ulp between
    numpy and an oracle's libm — for a bit-exact SQL pair keep T=1 and
    fold the exponent into *prob_fn* with correctly-rounded ops
    (``sqrt`` is IEEE-exact; see ``q_weighted_sample_docs``)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        p = np.clip(prob_fn(df).to_numpy(dtype=np.float64), 0.0, 1.0)
        if temperature != 1.0:
            p = p ** (1.0 / temperature)
        u = knuth_hash(df[id_col].to_numpy()).astype(np.float64) / 2**32
        return df[u < p]

    return ds.map_batches(keep, batch_format="pandas")


def assign_split(ds, key_col: str, splits, out_col: str = "split"):
    """Leakage-safe train/valid/test split: EVERY row sharing *key_col*
    (a user, url, document group...) lands in the same split — the
    entity, not the row, is hashed, so no entity leaks across splits.
    Deterministic (Knuth hash, SQL-reproducible), embarrassingly
    parallel, no shuffle, no RNG state.

    ``splits``: ordered mapping label -> integer percent, summing to
    100; hash buckets [0,100) are assigned to labels in iteration order.
    """
    labels = list(splits)
    cuts = np.cumsum(np.fromiter(splits.values(), dtype=np.int64))
    if cuts[-1] != 100:
        raise ValueError(f"split percents must sum to 100, got {cuts[-1]}")
    label_arr = np.array(labels, dtype=object)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = (knuth_hash(df[key_col].to_numpy()) % np.uint64(100)).astype(np.int64)
        df[out_col] = label_arr[np.searchsorted(cuts, h, side="right")]
        return df

    return ds.map_batches(fn, batch_format="pandas")


def assign_folds(ds, key_col: str, k: int, out_col: str = "fold"):
    """Leakage-safe k-fold assignment for cross-validation: the ENTITY
    is hashed (``knuth_hash(key) % k``), so every row of one entity
    lands in the same fold — no entity straddles train/holdout in any
    CV round. Deterministic, zero shuffle, SQL-reproducible."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = (
            knuth_hash(df[key_col].to_numpy()) % np.uint64(k)
        ).astype(np.int64)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def temporal_split(
    ds,
    ts_col: str,
    cutoff,
    embargo_seconds: float = 0.0,
    out_col: str = "split",
):
    """Embargo-aware temporal (purged) split: rows strictly before
    ``cutoff - embargo`` are ``train``, rows at/after ``cutoff`` are
    ``test``, and rows inside the embargo gap are labeled ``embargo``
    (drop them downstream). The gap prevents the classic temporal leak
    where features computed with trailing windows at the end of train
    overlap the start of test. Pure vectorized map — zero shuffle."""
    if embargo_seconds < 0:
        raise ValueError(
            f"embargo_seconds must be >= 0, got {embargo_seconds} "
            "(a negative embargo would label post-cutoff rows 'train')"
        )
    cutoff = pd.Timestamp(cutoff)
    lo = cutoff - pd.Timedelta(seconds=embargo_seconds)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col]
        df[out_col] = np.where(
            t < lo, "train", np.where(t >= cutoff, "test", "embargo")
        )
        return df

    return ds.map_batches(fn, batch_format="pandas")


def plan_mixture(
    ds,
    source_col: str,
    tokens_col: str,
    target_tokens: int,
    weights: Mapping[str, float],
):
    """Corpus mixture planning: the per-source sampling rates that hit a
    global token budget under target mixture weights —
    ``rate_s = min(1, target·(w_s/Σw) / available_s)`` (a source without
    enough tokens saturates at 1.0; its shortfall is reported, not
    silently reallocated). One distributed grouped aggregation (exact
    integer token sums via partial pre-agg) + driver arithmetic over the
    tiny per-source table. Returns a pandas frame
    ``(source, available_tokens, rate, planned_tokens)`` — feed the
    rates to :func:`stratified_sample` / :func:`weighted_sample` to
    EXECUTE the plan deterministically."""
    from .relational import grouped_agg

    avail = grouped_agg(
        ds, [source_col], {"available_tokens": (tokens_col, "sum")},
        num_buckets=8,
    ).to_pandas()
    missing = set(avail[source_col]) - set(weights)
    if missing:
        raise ValueError(f"no mixture weight for sources: {sorted(missing)}")
    total_w = float(sum(weights.values()))
    avail = avail.sort_values(source_col).reset_index(drop=True)
    avail["available_tokens"] = avail["available_tokens"].astype("int64")
    wt = avail[source_col].map(weights).to_numpy(np.float64)
    a = avail["available_tokens"].to_numpy(np.float64)
    rate = np.minimum(1.0, target_tokens * wt / total_w / a)
    avail["rate"] = rate
    avail["planned_tokens"] = rate * a
    return avail


def stratified_sample(
    ds,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, int],
    default_rate: int = 0,
):
    """Per-stratum hash sampling: row kept iff
    ``knuth_hash(id) % 100 < rates.get(stratum, default_rate)``.

    The canonical corpus-rebalancing op (downsample the head language,
    keep the tail): no shuffle, no state, deterministic, and each
    stratum's sample is a SUBSET of any higher rate's sample (nested
    samples for free, since the hash per row is fixed)."""
    rates = dict(rates)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash(df[id_col].to_numpy()) % np.uint64(100)
        thr = (
            df[strata_col]
            .map(rates)
            .fillna(default_rate)
            .to_numpy(dtype=np.uint64)
        )
        return df[h < thr]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_topn(
    ds,
    id_col: str,
    strata_col: str,
    n: int,
    num_buckets: int | None = None,
    extra_keys: Sequence[str] = (),
):
    """Exactly ``min(n, stratum size)`` rows per stratum — the ``n``
    smallest ``(knuth_hash(id), id)`` pairs, i.e. a deterministic
    uniform reservoir that any engine can reproduce
    (``ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY hash, id) <= n``).

    Two levels: per-batch partial top-n (vectorized sort + groupby
    head), then one bucket exchange keyed on the stratum finishes each
    group. Only candidate rows ever shuffle — volume is bounded at
    ``n × strata × batches`` regardless of corpus size."""
    from ..stages.partition import bucket_exchange

    keys = [strata_col, *extra_keys]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df["__h"] = pd.Series([], dtype="int64")
            return df
        df = df.assign(__h=knuth_hash(df[id_col].to_numpy()).astype(np.int64))
        df = df.sort_values(["__h", id_col], kind="mergesort")
        return df.groupby(keys, sort=False, dropna=False).head(n)

    candidates = ds.map_batches(partial, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__h", id_col], kind="mergesort")
        out = df.groupby(keys, sort=False, dropna=False).head(n)
        return out.drop(columns="__h")

    return bucket_exchange(candidates, keys, finish, num_buckets)


def temperature_resample(
    ds,
    group_col: str,
    id_col: str,
    coef: float = 0.5,
    num_buckets: int = 8,
):
    """Temperature-based (T=2, i.e. √-share) corpus-mix resampling —
    the multilingual-curation standard for up-weighting tail sources:
    source *l* with corpus share *s_l* keeps rows at rate
    ``p_l = min(1, coef · sqrt(s_l))``, flattening the mix toward the
    tail (p/s grows as 1/sqrt(s)). T=2 is the one temperature that is
    SQL-bit-exact: sqrt is IEEE correctly rounded everywhere, while
    general ``pow`` differs by 1 ulp across libms (see
    :func:`weighted_sample`'s caveat).

    Two passes: a count aggregate (one partial row per source per
    batch) derives the per-source rates driver-side — tiny,
    broadcast in the task closure — then a zero-shuffle deterministic
    Bernoulli filter via :func:`weighted_sample` (knuth-hash uniform,
    same rows survive at any cluster size)."""
    import math

    from .relational import grouped_agg

    counts = grouped_agg(ds, [group_col], {"n": (group_col, "count")},
                         num_buckets=num_buckets).to_pandas()
    total = float(int(counts["n"].sum()))
    rates = {
        g: min(1.0, coef * math.sqrt(float(int(n)) / total))
        for g, n in zip(counts[group_col], counts["n"])
    }

    return weighted_sample(
        ds, id_col, lambda df: df[group_col].map(rates), temperature=1.0)
