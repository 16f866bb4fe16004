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


def line_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    num_buckets: int | None = None,
    exchange: str | None = None,
):
    """Corpus-level exact LINE dedup (the C4/RefinedWeb cleanup): every
    line that occurs anywhere else in the corpus survives only in its
    first occurrence — lowest ``(id, line_no)`` — and each document is
    reassembled from its surviving lines in original order. Documents
    whose every line lost drop out entirely.

    Distributed shape: a vectorized explode (split + repeat, no row
    loop) inside ``map_batches``, then TWO bucket exchanges — (1) hash
    by line text, winner per distinct line; (2) regroup winners by doc
    id and rejoin. Line text crosses the wire once; at 100 TB both
    exchanges shuffle only (id, line_no, line) triples, never whole
    documents, and the winner rule needs no global sort.
    """

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, text_col]].dropna(subset=[text_col])
        lines = df[text_col].str.split(line_sep)
        lens = lines.str.len().to_numpy(dtype=np.int64, na_value=0)
        total = int(lens.sum())
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), lens),
            "line_no": np.arange(total, dtype=np.int64) - offs,
            "line": lines.explode().to_numpy(dtype=object)
            if total else np.array([], dtype=object),
        })

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["line", id_col, "line_no"], kind="mergesort")
        out = df.drop_duplicates(subset=["line"], keep="first")
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "line_no"], kind="mergesort")
        out = (
            df.groupby(id_col, sort=False)["line"]
            .agg(line_sep.join)
            .reset_index()
            .rename(columns={"line": text_col})
        )
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    from .partition import bucket_exchange, resolve_exchange

    exploded = ds.map_batches(explode, batch_format="pandas")
    if resolve_exchange(exchange) == "tasks":
        winners = bucket_exchange(exploded, ["line"], keep_first, num_buckets)
        return bucket_exchange(winners, [id_col], reassemble, num_buckets)
    bucketed = add_bucket(exploded, ["line"], num_buckets or 64)
    winners = bucketed.groupby(BUCKET_COL).map_groups(
        keep_first, batch_format="pandas"
    )
    bucketed2 = add_bucket(winners, [id_col], num_buckets or 64)
    return bucketed2.groupby(BUCKET_COL).map_groups(
        reassemble, batch_format="pandas"
    )


__all__ = ["dedup_exact", "line_dedup"]
