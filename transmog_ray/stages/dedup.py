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


def boilerplate_removal(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_df: int = 2,
    min_frac: float = 0.05,
    line_sep: str = "\n",
    num_buckets: int | None = None,
):
    """Per-group (host / source / template) boilerplate LINE removal —
    the crawl-cleanup complement of :func:`line_dedup`: a line that
    appears in ≥ ``min_df`` documents AND ≥ ``min_frac`` of the group's
    documents is a template line (nav bars, footers, cookie banners)
    and is removed from EVERY document of that group (keep-none, where
    line_dedup is keep-first). Documents whose every line is
    boilerplate drop out. Output: (id, text, n_kept).

    Distributed shape: (0) per-group doc totals — a tiny count
    aggregate, ``ray.put`` once; (1) vectorized line explode; (2) ONE
    exchange by (group, line): a bucket holds every occurrence of each
    of its lines, so document frequency, the boilerplate test, and the
    filtering of occurrence rows all happen IN-bucket — no second join
    to mark rows; (3) one exchange by doc id to reassemble. Only (id,
    line_no, line) triples ever shuffle, never whole documents.
    """
    import ray

    from .partition import bucket_exchange

    # (0) per-group document totals: tiny (one row per group)
    def count_docs(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(group_col, sort=False)[id_col].nunique()
            .rename("n").reset_index()
        )

    # exact because a document is exactly ONE input row (nunique per
    # batch can never split an id across batches)
    parts = ds.map_batches(count_docs, batch_format="pandas").to_pandas()
    totals_ref = ray.put(parts.groupby(group_col)["n"].sum().to_dict())

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, group_col, text_col]].dropna(subset=[text_col])
        lines = df[text_col].str.split(line_sep)
        lens = lines.str.len().to_numpy(dtype=np.int64, na_value=0)
        total = int(lens.sum())
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), lens),
            group_col: np.repeat(df[group_col].to_numpy(), lens),
            "line_no": np.arange(total, dtype=np.int64) - offs,
            "line": lines.explode().to_numpy(dtype=object)
            if total else np.array([], dtype=object),
        })

    def drop_boiler(df: pd.DataFrame) -> pd.DataFrame:
        totals = ray.get(totals_ref)
        g = df.groupby([group_col, "line"], sort=False)
        dfreq = g[id_col].transform("nunique")
        n_docs = df[group_col].map(totals)
        boiler = (dfreq >= min_df) & (dfreq / n_docs >= min_frac)
        return df.loc[~boiler, [id_col, "line_no", "line"]]

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "line_no"], kind="mergesort")
        g = df.groupby(id_col, sort=False)
        out = g["line"].agg(line_sep.join).rename(text_col).reset_index()
        out["n_kept"] = g.size().to_numpy().astype(np.int64)
        return out

    exploded = ds.map_batches(explode, batch_format="pandas")
    kept = bucket_exchange(exploded, [group_col, "line"], drop_boiler,
                           num_buckets)
    return bucket_exchange(kept, [id_col], reassemble, num_buckets)


def merge_upsert(
    base_ds,
    delta_ds,
    key: Sequence[str] | str,
    seq: Sequence[str] | str,
    op_col: str | None = None,
    delete_value: str = "delete",
    num_buckets: int | None = None,
):
    """CDC log compaction: apply a change log (*delta*) to a snapshot
    (*base*) — the crawl-store / feature-store refresh primitive.

    Winner per key = the LATEST row: base rows rank below every delta
    row of the same key (a snapshot is by definition older than its
    log), delta rows order by ``seq`` (pass a composite, e.g.
    ``["ts", "event_id"]``, for a total order). ``base_ds=None``
    compacts the log alone (bootstrap). If ``op_col`` is given
    and the winning row carries ``delete_value`` there, the key
    disappears from the output (tombstone). Base-won rows keep their
    state untouched.

    ONE exchange: both sides pad to a union schema, tag, union, and
    hash-bucket by key; the per-bucket kernel is a sort +
    ``drop_duplicates(keep="last")`` — each row crosses the wire once,
    the output is one row per surviving key.

    If every key is tombstoned the result Dataset is empty, and a
    zero-row Ray Dataset loses its columns through ``to_pandas()`` —
    callers selecting columns must guard that case.
    """
    from .common import arrow_schema, pad_to, union_schemas
    from .partition import bucket_exchange

    key = [key] if isinstance(key, str) else list(key)
    seq = [seq] if isinstance(seq, str) else list(seq)
    rank = "_upsert_rank"

    delta_schema = arrow_schema(delta_ds)
    base_schema = arrow_schema(base_ds) if base_ds is not None else delta_schema
    target = union_schemas(base_schema, delta_schema, rank)
    out_cols = [f.name for f in target if f.name != rank
                and f.name != op_col]

    unioned = delta_ds.map_batches(pad_to(target, rank, 1),
                                   batch_format="pyarrow")
    if base_ds is not None:
        unioned = base_ds.map_batches(
            pad_to(target, rank, 0), batch_format="pyarrow"
        ).union(unioned)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*key, rank, *seq], kind="mergesort")
        out = df.drop_duplicates(subset=key, keep="last")
        if op_col is not None:
            # base winners have a padded-null op: never tombstones
            out = out[out[op_col].astype(object).fillna("") != delete_value]
        return out[out_cols]

    return bucket_exchange(unioned, key, per_bucket, num_buckets)


__all__ = ["dedup_exact", "line_dedup", "boilerplate_removal",
           "merge_upsert"]
