"""Point-in-time (as-of) join: attach the latest feature row at or before
each observation timestamp — zero temporal leakage by construction.

Two physical strategies, same semantics:

* :func:`asof_join` — both sides large. Pad both sides to one common
  Arrow schema (typed nulls), tag, union, hash-bucket by key, then per
  bucket split + sort-merge (binary-search cursor via ``pd.merge_asof``).
  ONE shuffle total: the union is lazy block concatenation; the bucket
  groupby moves each row exactly once. Project the left side down to the
  columns you need BEFORE joining — wide payload columns (html) would
  ride the shuffle.
* :func:`asof_join_broadcast` — feature side small enough to broadcast.
  ``ray.put`` the sorted feature frame once; every left batch merges
  against it inside ``map_batches``. NO shuffle; the left side streams.

Semantics: backward join, ``right_ts <= left_ts`` (exact matches allowed),
optional tolerance; rows with null key/timestamp never match (left nulls
pass through with null features). The right side should be unique per
(key, ts) — run exact dedup first, otherwise the winner among equal
timestamps is unspecified.

No counterpart in the reference (SURVEY.md §2.5); pinned by the
hand-computed oracle tests and DuckDB ``ASOF JOIN`` SQL.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa

from .common import arrow_schema, pad_to
from .partition import BUCKET_COL, add_bucket

_SIDE = "_asof_side"


def _merge_asof(
    left: pd.DataFrame,
    right: pd.DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: float | None,
    direction: str = "backward",
) -> pd.DataFrame:
    """Sorted merge cursor; null-ts left rows pass through unmatched."""
    null_mask = left[left_ts].isna() | left[key].isna()
    left_ok = left[~null_mask].sort_values(left_ts, kind="mergesort")
    right_ok = right.dropna(subset=[key, right_ts]).sort_values(
        right_ts, kind="mergesort"
    )
    merged = pd.merge_asof(
        left_ok,
        right_ok[[key, right_ts, *right_cols]],
        left_on=left_ts,
        right_on=right_ts,
        by=key,
        direction=direction,
        allow_exact_matches=True,
        tolerance=(
            pd.Timedelta(seconds=tolerance_seconds)
            if tolerance_seconds is not None
            else None
        ),
        suffixes=("", "_feat"),
    )
    if null_mask.any():
        passthrough = left[null_mask].copy()
        for c in (right_ts, *right_cols):
            out_c = c if c not in left.columns else f"{c}_feat"
            passthrough[out_c] = None
        merged = pd.concat([merged, passthrough], ignore_index=True)
    return merged


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    num_buckets: int = 64,
    tolerance_seconds: float | None = None,
    exchange: str | None = None,
    direction: str = "backward",
):
    """Shuffle-based as-of join of two Datasets (both sides large).

    ``direction`` follows ``pd.merge_asof``: "backward" (default) is the
    leakage-free point-in-time join (latest right row at or before the
    left timestamp); "forward" attaches the EARLIEST right row at or
    after it — an intentional look-ahead for building prediction
    TARGETS (e.g. time-to-next-purchase labels), never features;
    "nearest" picks the closer of the two.

    Output = every left row + ``right_ts`` + ``right_cols`` (null when no
    feature row exists at or before the left timestamp). ``left_ts`` and
    ``right_ts`` must be distinct column names. ``exchange="tasks"``
    (default) runs the bucket exchange on raw Ray tasks (no sort
    coordination); ``"groupby"`` uses the Ray Data sort-based groupby.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    right_cols = list(right_cols)

    left_schema = arrow_schema(left_ds)
    right_schema = arrow_schema(right_ds)
    fields = list(left_schema)
    for name in (right_ts, *right_cols):
        if name in left_schema.names:
            raise ValueError(f"column {name!r} exists on both sides; rename first")
        fields.append(right_schema.field(name))
    fields.append(pa.field(_SIDE, pa.int8()))
    target = pa.schema(fields)

    left_pad = left_ds.map_batches(pad_to(target, _SIDE, 0), batch_format="pyarrow")
    right_pad = right_ds.map_batches(pad_to(target, _SIDE, 1), batch_format="pyarrow")
    unioned = left_pad.union(right_pad)

    # pandas upcasts int columns to float when the OTHER side's padding
    # nulls share the column; left rows themselves are never null there,
    # so the original integer dtypes are restored after the merge
    left_int_cols = {
        f.name: f.type.to_pandas_dtype()
        for f in left_schema
        if pa.types.is_integer(f.type)
    }

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        left = df[df[_SIDE] == 0].drop(columns=[_SIDE, right_ts, *right_cols])
        right = df[df[_SIDE] == 1]
        if left.empty:
            out = df.iloc[0:0].drop(columns=[_SIDE])
        else:
            out = _merge_asof(
                left, right, key, left_ts, right_ts, right_cols,
                tolerance_seconds, direction,
            )
        for col, dtype in left_int_cols.items():
            if col in out.columns and out[col].notna().all():
                out[col] = out[col].astype(dtype)
        return out


    from ..stages.partition import resolve_exchange

    if resolve_exchange(exchange) == "tasks":
        from .partition import bucket_exchange

        return bucket_exchange(unioned, [key], per_bucket, num_buckets)
    bucketed = add_bucket(unioned, [key], num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def asof_join_broadcast(
    left_ds,
    right_df: pd.DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: float | None = None,
    concurrency: int | None = None,
    direction: str = "backward",
):
    """Broadcast as-of join: small feature side shipped once via ``ray.put``,
    looked up inside every left batch — no shuffle, left side streams.
    ``direction`` as in :func:`asof_join`.
    """
    import ray

    right_cols = list(right_cols)
    right_sorted = right_df.sort_values(right_ts, kind="mergesort").reset_index(drop=True)
    right_ref = ray.put(right_sorted)

    def lookup(batch: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(right_ref)  # zero-copy view from local object store
        return _merge_asof(
            batch, right, key, left_ts, right_ts, right_cols,
            tolerance_seconds, direction,
        )

    kwargs = {"batch_format": "pandas"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return left_ds.map_batches(lookup, **kwargs)


def asof_join_multi(
    left_ds,
    rights: Sequence[tuple],
    key: str,
    left_ts: str,
    num_buckets: int = 64,
    tolerance_seconds: float | None = None,
    exchange: str | None = None,
):
    """Feature-store point-in-time join against SEVERAL feature tables
    in ONE exchange (the multi-table PIT read every feature platform
    serves): ``rights`` is a sequence of ``(right_ds, right_ts,
    right_cols)``; the output is every left row + each table's latest
    at-or-before feature columns.

    Chaining :func:`asof_join` once per table would shuffle the
    (growing) left side N times; here all sides are padded to one
    union schema, tagged 0..N, unioned, and hash-bucketed by ``key``
    ONCE — each feature row and each left row crosses the wire exactly
    once, and the per-bucket kernel runs N sorted merge cursors
    locally. Column names must be pairwise disjoint across all sides
    (except ``key``).
    """
    rights = [(rds, rts, list(rcols)) for rds, rts, rcols in rights]
    left_schema = arrow_schema(left_ds)
    fields = list(left_schema)
    seen = set(left_schema.names)
    right_schemas = []
    for rds, rts, rcols in rights:
        rs = arrow_schema(rds)
        right_schemas.append(rs)
        for name in (rts, *rcols):
            if name in seen:
                raise ValueError(
                    f"column {name!r} appears on more than one side; "
                    "rename first")
            seen.add(name)
            fields.append(rs.field(name))
    fields.append(pa.field(_SIDE, pa.int8()))
    target = pa.schema(fields)

    unioned = left_ds.map_batches(pad_to(target, _SIDE, 0),
                                  batch_format="pyarrow")
    for i, (rds, _, _) in enumerate(rights):
        unioned = unioned.union(
            rds.map_batches(pad_to(target, _SIDE, i + 1),
                            batch_format="pyarrow"))

    left_int_cols = {
        f.name: f.type.to_pandas_dtype()
        for f in left_schema
        if pa.types.is_integer(f.type)
    }
    feat_cols = [c for _, rts, rcols in rights for c in (rts, *rcols)]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        out = df[df[_SIDE] == 0].drop(columns=[_SIDE, *feat_cols])
        if out.empty:
            out = df.iloc[0:0].drop(columns=[_SIDE])
        else:
            for i, (_, rts, rcols) in enumerate(rights):
                right = df[df[_SIDE] == i + 1]
                out = _merge_asof(
                    out, right, key, left_ts, rts, rcols,
                    tolerance_seconds,
                )
        for col, dtype in left_int_cols.items():
            if col in out.columns and out[col].notna().all():
                out[col] = out[col].astype(dtype)
        return out

    from ..stages.partition import resolve_exchange

    if resolve_exchange(exchange) == "tasks":
        from .partition import bucket_exchange

        return bucket_exchange(unioned, [key], per_bucket, num_buckets)
    bucketed = add_bucket(unioned, [key], num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(
        per_bucket, batch_format="pandas")


__all__ = ["asof_join", "asof_join_broadcast", "asof_join_multi"]
