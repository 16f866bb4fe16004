"""Windowed feature operators over sorted partitions.

Each function here is a pure, vectorized pandas transform over ONE sorted
partition frame (all rows of each key, ordered by (key, ts)) — the frames
produced by :func:`transmog_ray.stages.partition.apply_sorted`. They
compose: a single partition pass can compute lag/lead + sessions +
backfill + rolling windows with no extra shuffle (north_star's "one fused
sorted pass").

None of these exist in the reference (SURVEY.md §2.5) — semantics are
defined here and pinned by the hand-computed oracle in tests plus DuckDB
window-function SQL in __ray_entry__.oracle_sql.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def with_lag(
    df: pd.DataFrame, key: str, cols: Sequence[str], lags: Sequence[int] = (1,)
) -> pd.DataFrame:
    """``<col>_lag<k>``: value k rows earlier within the key (None at the head).

    Frame must already be sorted by (key, ts). SQL: ``LAG(col, k) OVER
    (PARTITION BY key ORDER BY ts)``.
    """
    g = df.groupby(key, sort=False)
    for col in cols:
        for k in lags:
            df[f"{col}_lag{k}"] = g[col].shift(k)
    return df


def with_lead(
    df: pd.DataFrame, key: str, cols: Sequence[str], leads: Sequence[int] = (1,)
) -> pd.DataFrame:
    """``<col>_lead<k>``: value k rows later within the key."""
    g = df.groupby(key, sort=False)
    for col in cols:
        for k in leads:
            df[f"{col}_lead{k}"] = g[col].shift(-k)
    return df


def sessionize(
    df: pd.DataFrame,
    key: str,
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
    label_key: str | None = None,
) -> pd.DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous row of the same key exceeds ``gap_seconds``.

    Emits ``session_seq`` (0-based per key) and a deterministic
    ``session_id`` = ``"<label>|<epoch_us(session_start)>"`` — a plain
    concatenation, reproducible in ANSI SQL without hashing. ``label_key``
    lets a kernel group on a cheap surrogate (e.g. factorized int codes)
    while labeling sessions with the real key column.
    """
    gap = pd.Timedelta(seconds=gap_seconds)
    tcol = df[ts]
    prev = df.groupby(key, sort=False)[ts].shift(1)
    new_session = prev.isna() | ((tcol - prev) > gap)
    df["session_seq"] = (
        new_session.astype(np.int64).groupby(df[key], sort=False).cumsum() - 1
    )
    starts = tcol.where(new_session)
    session_start = starts.groupby(df[key], sort=False).ffill()
    # normalize to ns first — pandas keeps datetime64[us] for Arrow input,
    # so a bare astype(int64) would be unit-dependent
    epoch_us = session_start.astype("datetime64[ns]").astype("int64") // 1000
    df[session_col] = (
        df[label_key or key].astype(str) + "|" + epoch_us.astype(str)
    )
    return df


def backfill(
    df: pd.DataFrame, key: str, cols: Sequence[str], suffix: str = "_filled"
) -> pd.DataFrame:
    """Forward-fill nulls from the latest earlier non-null within the key.

    ("backfill" in the feature-store sense: fill the current row from the
    past — never from the future, so no temporal leakage.) SQL:
    ``LAST_VALUE(col IGNORE NULLS) OVER (PARTITION BY key ORDER BY ts)``.
    """
    g = df.groupby(key, sort=False)
    for col in cols:
        df[f"{col}{suffix}"] = g[col].ffill()
    return df


def rolling_agg(
    df: pd.DataFrame,
    key: str,
    ts: str,
    col: str,
    window_seconds: float,
    aggs: Sequence[str] = ("count", "mean"),
    prefix: str | None = None,
) -> pd.DataFrame:
    """Trailing time-window aggregates including the current row.

    Window is ``[t - window_seconds, t]`` with BOTH boundaries closed,
    matching SQL ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW``
    exactly — including on TIED timestamps: SQL RANGE frames are
    peer-inclusive, so every row of a (key, ts) tie group sees the whole
    group. pandas rolling is row-cumulative; at the LAST row of a tie
    group its cumulative window equals the SQL frame, so that value is
    broadcast back over the group's peers (one vectorized transform).
    """
    prefix = prefix or f"{col}_w{int(window_seconds)}s"
    if set(aggs) <= {"count", "sum", "mean"}:
        return _rolling_prefix_sums(df, key, ts, col, window_seconds, aggs, prefix)
    r = (
        df.groupby(key, sort=False)
        .rolling(pd.Timedelta(seconds=window_seconds), on=ts, closed="both")[col]
    )
    # peer broadcast is only needed when (key, ts) ties exist — the
    # duplicated() probe is one vectorized hash pass, far cheaper than an
    # unconditional transform on the (common) tie-free frame
    has_ties = bool(df.duplicated([key, ts]).any())
    for agg in aggs:
        # with on=ts the result is (key, ts)-indexed; the frame is sorted by
        # (key, ts) and groups are contiguous, so positions line up 1:1
        vals = getattr(r, agg)().to_numpy()
        if has_ties:
            vals = (
                pd.Series(vals, index=df.index)
                .groupby([df[key], df[ts]], sort=False)
                .transform("last")
                .to_numpy()
            )
        df[f"{prefix}_{agg}"] = vals
    return df


def running_agg(
    df: pd.DataFrame,
    key: str,
    col: str,
    aggs: Sequence[str] = ("sum", "count"),
    prefix: str | None = None,
) -> pd.DataFrame:
    """Expanding (cumulative) aggregates per key including the current
    row, over the already-sorted frame. SQL: ``AGG(col) OVER (PARTITION
    BY key ORDER BY ts, tiebreak ROWS BETWEEN UNBOUNDED PRECEDING AND
    CURRENT ROW)`` — a ROWS frame, so the deterministic (ts, tiebreak)
    sort order IS the accumulation order on both sides. SQL aggregate
    NULL semantics: nulls are skipped, and a prefix with zero non-null
    values yields NULL sum/mean/min/max and count 0.
    """
    prefix = prefix or f"{col}_run"
    vals = pd.to_numeric(df[col], errors="coerce")
    ok = vals.notna()
    gkey = df[key]
    cnt = ok.astype(np.int64).groupby(gkey, sort=False).cumsum()
    seen = cnt > 0
    for agg in aggs:
        if agg == "count":
            df[f"{prefix}_count"] = cnt
        elif agg == "sum":
            s = vals.fillna(0.0).groupby(gkey, sort=False).cumsum()
            df[f"{prefix}_sum"] = s.where(seen)
        elif agg == "mean":
            s = vals.fillna(0.0).groupby(gkey, sort=False).cumsum()
            df[f"{prefix}_mean"] = (s / cnt).where(seen)
        elif agg in ("min", "max"):
            g = vals.groupby(gkey, sort=False)
            r = g.cummax() if agg == "max" else g.cummin()
            # pandas leaves NaN at null rows; SQL carries the running
            # extremum over them — forward-fill within the key
            df[f"{prefix}_{agg}"] = r.groupby(gkey, sort=False).ffill()
        else:  # pragma: no cover — caller error
            raise ValueError(f"unsupported running agg: {agg}")
    return df


def rows_window_agg(
    df: pd.DataFrame,
    key: str,
    col: str,
    preceding: int,
    aggs: Sequence[str] = ("count", "sum", "mean"),
    prefix: str | None = None,
) -> pd.DataFrame:
    """Count-based sliding window per key over the already-sorted frame:
    SQL ``AGG(col) OVER (PARTITION BY key ORDER BY ts, tiebreak ROWS
    BETWEEN preceding PRECEDING AND CURRENT ROW)`` — the fixed-ROWS
    complement of the time-RANGE :func:`rolling_agg`. Prefix-sum
    differences (cumsum[i] − cumsum[i−k−1]) instead of a per-row window
    scan; SQL aggregate NULL semantics (nulls skipped, all-null window →
    NULL sum/mean, count 0)."""
    prefix = prefix or f"{col}_rows{preceding}"
    vals = pd.to_numeric(df[col], errors="coerce")
    ok = vals.notna()
    gkey = df[key]
    pos = df.groupby(gkey, sort=False).cumcount().to_numpy()
    csum = vals.fillna(0.0).groupby(gkey, sort=False).cumsum().to_numpy()
    ccnt = ok.astype(np.int64).groupby(gkey, sort=False).cumsum().to_numpy()
    # value of the running totals k+1 rows earlier WITHIN the key:
    # positional shift is safe because the frame is key-contiguous
    # (sorted by key first) — rows with pos <= k have no subtrahend
    k = preceding
    idx = np.arange(len(df)) - (k + 1)
    has_prev = pos > k
    prev_sum = np.where(has_prev, csum[np.maximum(idx, 0)], 0.0)
    prev_cnt = np.where(has_prev, ccnt[np.maximum(idx, 0)], 0)
    wsum = csum - prev_sum
    wcnt = (ccnt - prev_cnt).astype(np.int64)
    nz = wcnt > 0
    for agg in aggs:
        if agg == "count":
            df[f"{prefix}_count"] = wcnt
        elif agg == "sum":
            df[f"{prefix}_sum"] = pd.Series(wsum, index=df.index).where(nz)
        elif agg == "mean":
            df[f"{prefix}_mean"] = pd.Series(
                wsum / np.maximum(wcnt, 1), index=df.index
            ).where(nz)
        else:  # pragma: no cover — caller error
            raise ValueError(f"unsupported rows-window agg: {agg}")
    return df


def ewma(
    df: pd.DataFrame,
    key: str,
    col: str,
    alpha: float = 0.3,
    out_col: str | None = None,
) -> pd.DataFrame:
    """Exponential moving average per key over the sorted frame:
    ``y_t = alpha*x_t + (1-alpha)*y_{t-1}`` (``adjust=False`` recursion —
    the streaming decay feature a trailing-window mean approximates).
    Null inputs emit the carried state unchanged (``ignore_na=True``).
    Inherently recursive, so not ANSI-SQL expressible — pinned by the
    loop oracle in tests instead of a DuckDB twin."""
    out_col = out_col or f"{col}_ewma{alpha}"
    if not df.index.is_unique:
        df = df.reset_index(drop=True)
    r = (
        df.groupby(key, sort=False)[col]
        .ewm(alpha=alpha, adjust=False, ignore_na=True)
        .mean()
    )
    df[out_col] = r.droplevel(0)  # aligns on the original row index
    return df


def target_encode(
    df: pd.DataFrame,
    key: str,
    col: str,
    out_col: str | None = None,
) -> pd.DataFrame:
    """Point-in-time target encoding: the expanding mean of *col* per key
    over STRICTLY PRIOR rows in the sorted order — the leakage-free form
    of mean/target encoding (a row never sees its own target, and never
    a future one). SQL: ``AVG(col) OVER (PARTITION BY key ORDER BY ts,
    tiebreak ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    A key's first row — or any prefix whose prior values are all null —
    yields NULL (SQL AVG skips nulls; an empty frame is NULL)."""
    out_col = out_col or f"{col}_prior_mean"
    vals = pd.to_numeric(df[col], errors="coerce")
    ok = vals.notna()
    gkey = df[key]
    csum = vals.fillna(0.0).groupby(gkey, sort=False).cumsum()
    ccnt = ok.astype(np.int64).groupby(gkey, sort=False).cumsum()
    # shift the running totals one row WITHIN the key: prior-rows frame
    psum = csum.groupby(gkey, sort=False).shift(1)
    pcnt = ccnt.groupby(gkey, sort=False).shift(1).fillna(0).astype(np.int64)
    df[out_col] = (psum / pcnt).where(pcnt > 0)
    return df


def first_touch(
    df: pd.DataFrame,
    key: str,
    col: str,
    ts: str,
    value_out: str | None = None,
    since_out: str = "us_since_first",
) -> pd.DataFrame:
    """First-touch features per key over the sorted frame: the value at
    the key's FIRST row (SQL ``FIRST_VALUE(col) OVER w`` — respects
    nulls: it is the first ROW's value, null or not) and the elapsed
    microseconds since the key's first timestamp
    (``epoch_us(ts) - epoch_us(FIRST_VALUE(ts) OVER w)``). Integer
    microseconds are the one encoding that compares exactly across
    engine and SQL for sub-second timestamps."""
    value_out = value_out or f"{col}_first"
    n = len(df)
    if n == 0:
        df[value_out] = pd.Series([], dtype="float64")
        df[since_out] = pd.Series([], dtype="int64")
        return df
    codes = pd.factorize(df[key], use_na_sentinel=False)[0]
    seg_starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    seg_len = np.diff(np.r_[seg_starts, n])
    first_pos = np.repeat(seg_starts, seg_len)
    df[value_out] = df[col].to_numpy()[first_pos]
    t_us = (
        df[ts].to_numpy().astype("datetime64[ns]").astype(np.int64) // 1000
    )
    df[since_out] = t_us - t_us[first_pos]
    return df


def running_distinct(
    df: pd.DataFrame,
    key: str,
    col: str,
    out_col: str | None = None,
) -> pd.DataFrame:
    """Expanding COUNT(DISTINCT col) per key over the sorted frame —
    the behavioral NOVELTY feature (how many distinct event types /
    pages / products the entity has touched up to each row). Window
    ``COUNT(DISTINCT)`` isn't a SQL window aggregate, but it equals the
    running SUM of first-occurrence flags — one ``duplicated`` pass plus
    one grouped cumsum, fully vectorized. Null values count as one
    distinct value (pandas ``duplicated`` semantics; mirror with a
    COALESCE in SQL if nulls exist)."""
    out_col = out_col or f"{col}_n_distinct"
    first = (~df.duplicated([key, col])).astype(np.int64)
    df[out_col] = first.groupby(df[key], sort=False).cumsum()
    return df


def _rolling_prefix_sums(
    df: pd.DataFrame,
    key: str,
    ts: str,
    col: str,
    window_seconds: float,
    aggs: Sequence[str],
    prefix: str,
) -> pd.DataFrame:
    """count/sum/mean trailing windows via prefix sums on the sorted
    frame: ~20x faster than ``groupby().rolling`` and peer-inclusive on
    ties by construction. Per row the frame slice is
    ``[searchsorted(seg, t - w), end_of_tie_run]`` — one cumulative-sum
    pass plus one searchsorted per key segment."""
    n = len(df)
    out_cols = {a: np.empty(n, dtype=np.float64) for a in aggs}
    if n:
        t_ns = df[ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
        w_ns = np.int64(window_seconds * 1e9)
        vals = pd.to_numeric(df[col], errors="coerce").to_numpy(dtype=np.float64)
        ok = ~np.isnan(vals)
        cs = np.concatenate([[0.0], np.cumsum(np.where(ok, vals, 0.0))])
        cn = np.concatenate([[0], np.cumsum(ok.astype(np.int64))])
        codes = pd.factorize(df[key], use_na_sentinel=False)[0]
        seg_starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        seg_ends = np.r_[seg_starts[1:], n]
        # peer-inclusive upper bound: end of the (key, ts) tie run
        tie_start = np.flatnonzero(
            np.r_[True, (codes[1:] != codes[:-1]) | (t_ns[1:] != t_ns[:-1])]
        )
        tie_len = np.diff(np.r_[tie_start, n])
        hi = np.repeat(tie_start + tie_len, tie_len)  # exclusive
        lo = np.empty(n, dtype=np.int64)
        for s, e in zip(seg_starts, seg_ends):
            lo[s:e] = s + np.searchsorted(t_ns[s:e], t_ns[s:e] - w_ns, side="left")
        cnt = (cn[hi] - cn[lo]).astype(np.float64)
        if "count" in out_cols:
            out_cols["count"] = cnt
        if "sum" in out_cols or "mean" in out_cols:
            sm = cs[hi] - cs[lo]
            if "sum" in out_cols:
                out_cols["sum"] = np.where(cnt > 0, sm, np.nan)
            if "mean" in out_cols:
                with np.errstate(invalid="ignore", divide="ignore"):
                    out_cols["mean"] = np.where(cnt > 0, sm / cnt, np.nan)
    for a in aggs:
        df[f"{prefix}_{a}"] = out_cols[a]
    return df


def resample_ffill(
    df: pd.DataFrame,
    key: str,
    ts: str,
    value_col: str,
    every_s: int,
    order_col: str,
    out_ts: str = "grid_ts_s",
) -> pd.DataFrame:
    """Regularize each key's irregular series onto a fixed time grid
    with as-of forward fill (the feature-store "resample" step: one
    feature row per key per grid tick).

    For each key the grid runs from ``floor(min ts)`` to ``floor(max
    ts)`` in ``every_s`` steps (epoch-µs floor — mirrors SQL integer
    division); each grid point carries the value of the key's LAST
    observation at-or-before it (NULL when none — only the first tick
    can be null by construction). Duplicate (key, ts) observations
    resolve to the highest ``order_col`` (SQL ``arg_max(value,
    order_col)``). Grid timestamps are emitted as epoch-SECONDS int64
    (``every_s`` grids are always whole seconds) — the one encoding
    that hash-compares exactly across engine and SQL.

    Input frame must be sorted by (key, ts, order_col) — an
    ``apply_sorted`` kernel. Fully vectorized: grid construction is
    repeat/arange arithmetic over per-key bounds and the as-of is ONE
    ``merge_asof(by=key)`` over the ts-ordered grid, no per-key loop.
    """
    every_us = int(every_s) * 1_000_000
    obs = df.drop_duplicates([key, ts], keep="last")
    ts_us = (
        obs[ts].astype("datetime64[ns]").astype(np.int64) // 1000
    )
    obs = pd.DataFrame({
        key: obs[key].to_numpy(),
        "__ts_us": ts_us.to_numpy(),
        value_col: obs[value_col].to_numpy(),
    })

    bounds = obs.groupby(key, sort=False)["__ts_us"].agg(["min", "max"])
    g0 = (bounds["min"].to_numpy() // every_us) * every_us
    g1 = (bounds["max"].to_numpy() // every_us) * every_us
    counts = (g1 - g0) // every_us + 1
    total = int(counts.sum())
    offs = np.repeat(np.cumsum(counts) - counts, counts)
    ticks = np.arange(total, dtype=np.int64) - offs
    grid = pd.DataFrame({
        key: np.repeat(bounds.index.to_numpy(), counts),
        "__ts_us": np.repeat(g0, counts) + ticks * every_us,
    })

    # merge_asof needs a global on-column sort on BOTH sides
    grid = grid.sort_values("__ts_us", kind="mergesort")
    obs = obs.sort_values("__ts_us", kind="mergesort")
    out = pd.merge_asof(grid, obs, on="__ts_us", by=key,
                        direction="backward", allow_exact_matches=True)
    out[out_ts] = out["__ts_us"] // 1_000_000
    return out[[key, out_ts, value_col]].reset_index(drop=True)


def attribute_linear(
    df: pd.DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    purchase_type: str = "purchase",
    window_seconds: int = 7 * 86400,
) -> pd.DataFrame:
    """Linear (equal-split) multi-touch attribution kernel for one
    sorted partition (the :func:`~transmog_ray.stages.partition.apply_sorted`
    contract: sorted by (user, ts, id); groups by user internally, so
    hash-collided users stay correct). For each purchase, its touches
    are the user's NON-purchase events in [ts − window, ts); the
    purchase's integer cents split by LARGEST-REMAINDER: every touch
    gets cents // n and the first cents % n touches (by ts, id) get one
    extra cent — allocation is exact (credits sum to cents) and
    integer-only, so the SQL mirror (ROW_NUMBER + // and %) matches
    bit-for-bit. Cents = FLOOR(value·100) — both engines floor the SAME
    IEEE double, so no half-boundary risk on non-fixed-decimal values.
    Purchases with zero touches in window emit nothing (unattributed).
    Vectorized: per-purchase ranges explode via repeat + cumsum offsets,
    never a per-touch Python loop."""
    out_frames = []
    for _, g in df.groupby(user_col, sort=False):
        is_p = (g[type_col] == purchase_type).to_numpy()
        ts_ns = g[ts_col].astype("datetime64[ns]").astype("int64").to_numpy()
        ids = g[id_col].to_numpy()
        t_ts, t_ids = ts_ns[~is_p], ids[~is_p]
        p_ts, p_ids = ts_ns[is_p], ids[is_p]
        if len(p_ts) == 0 or len(t_ts) == 0:
            continue
        cents = np.floor(
            g.loc[is_p, value_col].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        lo = np.searchsorted(t_ts, p_ts - window_seconds * 1_000_000_000,
                             side="left")
        hi = np.searchsorted(t_ts, p_ts, side="left")
        n = hi - lo
        keep = n > 0
        lo, n, p_ids_k, cents_k = lo[keep], n[keep], p_ids[keep], cents[keep]
        if len(n) == 0:
            continue
        total = int(n.sum())
        # explode ranges lo_i .. lo_i + n_i - 1
        offs = np.repeat(np.cumsum(n) - n, n)
        pos = np.repeat(lo, n) + (np.arange(total) - offs)
        rank = np.arange(total) - offs + 1  # 1-based within purchase
        base = np.repeat(cents_k // n, n)
        rem = np.repeat(cents_k % n, n)
        out_frames.append(pd.DataFrame({
            "purchase_id": np.repeat(p_ids_k, n).astype(np.int64),
            "touch_id": t_ids[pos].astype(np.int64),
            "credit_cents": (base + (rank <= rem)).astype(np.int64),
        }))
    if not out_frames:
        return pd.DataFrame({
            "purchase_id": pd.Series([], dtype="int64"),
            "touch_id": pd.Series([], dtype="int64"),
            "credit_cents": pd.Series([], dtype="int64"),
        })
    return pd.concat(out_frames, ignore_index=True)


def attribute_decay(
    df: pd.DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    purchase_type: str = "purchase",
    window_seconds: int = 7 * 86400,
    max_halvings: int = 6,
) -> pd.DataFrame:
    """TIME-DECAY multi-touch attribution kernel (same
    :func:`apply_sorted` contract as :func:`attribute_linear`): touch
    weight halves per whole day of age — w = 2^(max_halvings − min(k,
    max_halvings)) for age-day k, a DYADIC weight, so every per-touch
    weight is a small exact integer and credits are assigned by integer
    largest-remainder over Σw: base = cents·w // Σw, plus one extra
    cent to the (Σ remainders)/Σw touches with the largest remainder
    (ties by recency rank). Fully integer — the SQL mirror (1 << …,
    //, %, ROW_NUMBER) matches bit-for-bit and credits sum to cents."""
    out_frames = []
    for _, g in df.groupby(user_col, sort=False):
        is_p = (g[type_col] == purchase_type).to_numpy()
        ts_ns = g[ts_col].astype("datetime64[ns]").astype("int64").to_numpy()
        ids = g[id_col].to_numpy()
        t_ts, t_ids = ts_ns[~is_p], ids[~is_p]
        p_ts, p_ids = ts_ns[is_p], ids[is_p]
        if len(p_ts) == 0 or len(t_ts) == 0:
            continue
        cents = np.floor(
            g.loc[is_p, value_col].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        lo = np.searchsorted(t_ts, p_ts - window_seconds * 1_000_000_000,
                             side="left")
        hi = np.searchsorted(t_ts, p_ts, side="left")
        n = hi - lo
        keep = n > 0
        lo, n, p_ids_k, cents_k, p_ts_k = (lo[keep], n[keep], p_ids[keep],
                                           cents[keep], p_ts[keep])
        if len(n) == 0:
            continue
        total = int(n.sum())
        offs = np.repeat(np.cumsum(n) - n, n)
        pos = np.repeat(lo, n) + (np.arange(total) - offs)
        rank = np.arange(total) - offs + 1  # 1-based within purchase
        seg = np.repeat(np.arange(len(n)), n)
        age_days = ((np.repeat(p_ts_k, n) - t_ts[pos])
                    // (86_400 * 1_000_000_000))
        w = np.int64(1) << (max_halvings
                            - np.minimum(age_days, max_halvings))
        starts = np.cumsum(n) - n
        sw = np.add.reduceat(w, starts)
        sw_x = np.repeat(sw, n)
        v_x = np.repeat(cents_k, n)
        base = v_x * w // sw_x
        rem = (v_x * w) % sw_x
        extra = np.repeat(np.add.reduceat(rem, starts) // sw, n)
        # within-purchase rank by (rem DESC, recency rank ASC)
        order = np.lexsort((rank, -rem, seg))
        rr = np.empty(total, dtype=np.int64)
        rr[order] = np.arange(total) - np.repeat(starts, n)[order] + 1
        out_frames.append(pd.DataFrame({
            "purchase_id": np.repeat(p_ids_k, n).astype(np.int64),
            "touch_id": t_ids[pos].astype(np.int64),
            "credit_cents": (base + (rr <= extra)).astype(np.int64),
        }))
    if not out_frames:
        return pd.DataFrame({
            "purchase_id": pd.Series([], dtype="int64"),
            "touch_id": pd.Series([], dtype="int64"),
            "credit_cents": pd.Series([], dtype="int64"),
        })
    return pd.concat(out_frames, ignore_index=True)


__all__ = [
    "with_lag", "with_lead", "sessionize", "backfill", "rolling_agg",
    "running_agg", "ewma", "target_encode", "first_touch",
    "running_distinct", "resample_ffill", "attribute_linear",
    "attribute_decay",
]
