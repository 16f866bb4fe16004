"""Leakage-safe feature scaling: fit normalization statistics on the
TRAIN split only, apply them everywhere.

The classic training-pipeline leak is fitting a scaler on the full
dataset — validation/test rows then influence the transform applied to
themselves. The safe recipe composes with
:func:`transmog_ray.functions.sampling.assign_split`:

    split = assign_split(ds, "doc_id", {"train": 80, "valid": 10, "test": 10})
    stats = fit_standardizer(train_rows_of(split), ["n_chars"])
    out   = apply_standardizer(split, stats)

Fit is ONE distributed pass with no shuffle: each batch emits a single
tiny sufficient-statistics row (n, Σx, Σx²) per column; the driver
combines them with Python unbounded ints (integer columns stay EXACT at
any corpus size — no overflow, no accumulation-order skew; float columns
accumulate in float64 with the usual ~1e-12 order sensitivity). The
mean/std are then derived deterministically as ``mean = Σx/n`` and
``std_pop = sqrt(Σx²/n - mean²)`` — the same closed form an oracle SQL
can compute from its own exact SUMs, so z-scores compare bit-identically
for integer features.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import numpy as np
import pandas as pd


def fit_standardizer(ds, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """Fit per-column ``(mean, std_pop)`` over *ds* (typically the train
    split) from map-side sufficient statistics. Nulls are skipped (SQL
    aggregate semantics). Raises on an all-null / empty column."""
    cols = list(cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in cols:
            v = df[c].dropna()
            if pd.api.types.is_integer_dtype(v):
                # object dtype → Python-int arithmetic: the EXACTNESS
                # guarantee must hold map-side too (int64 would silently
                # wrap on x² for |x| ≥ ~3.04e9 or on large batch sums).
                # Ship the unbounded ints as STRINGS — Arrow int64 would
                # overflow at the block boundary for huge partials.
                arr = v.to_numpy(dtype=np.int64).astype(object)
                sx, sxx = str(int(arr.sum())), str(int((arr * arr).sum()))
            else:
                sx = float(v.to_numpy(dtype=np.float64).sum())
                sxx = float((v.to_numpy(dtype=np.float64) ** 2).sum())
            out[f"{c}__n"] = [len(v)]
            out[f"{c}__sx"] = [sx]
            out[f"{c}__sxx"] = [sxx]
        return pd.DataFrame(out)

    def _num(x):
        return int(x) if isinstance(x, str) else x

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    stats: dict[str, tuple[float, float]] = {}
    for c in cols:
        n = sum(int(p[f"{c}__n"]) for p in parts)
        if n == 0:
            raise ValueError(f"fit_standardizer: column {c!r} has no values")
        # Python ints: exact at any scale for integer columns
        sx = sum(_num(p[f"{c}__sx"]) for p in parts)
        sxx = sum(_num(p[f"{c}__sxx"]) for p in parts)
        mean = float(sx) / float(n)  # mirrors SQL DOUBLE division
        if isinstance(sx, int) and isinstance(sxx, int):
            # var = (n·Σx² - (Σx)²) / n² with the numerator in EXACT
            # integer arithmetic — the closed form Σx²/n - mean² loses
            # all precision to cancellation once mean² ≫ variance
            # (e.g. values ~4e9: float64 ulp at 1.6e19 is ~2048)
            var_num = n * sxx - sx * sx
            var = float(var_num) / (float(n) * float(n))
        else:
            var = sxx / n - mean * mean
        stats[c] = (mean, math.sqrt(var) if var > 0 else 0.0)
    return stats


def apply_standardizer(
    ds,
    stats: Mapping[str, tuple[float, float]],
    suffix: str = "_z",
):
    """Z-score every fitted column: ``(x - mean) / std`` with the
    broadcast *stats* (tiny — ships in the task closure). A zero-std
    column emits NULL z-scores rather than ±inf."""
    items = dict(stats)

    def zscore(df: pd.DataFrame) -> pd.DataFrame:
        for c, (mean, std) in items.items():
            x = df[c].to_numpy(dtype=np.float64)
            df[f"{c}{suffix}"] = (x - mean) / std if std > 0 else np.nan
        return df

    return ds.map_batches(zscore, batch_format="pandas")


__all__ = ["fit_standardizer", "apply_standardizer"]
