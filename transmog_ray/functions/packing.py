"""Deterministic sequence packing for training-data assembly.

LLM training consumes fixed-size token sequences; packing many short
documents into each sequence (instead of padding) is the standard
throughput fix. At corpus scale the packing itself must be
deterministic and parallel: a re-run after a failure has to produce
byte-identical packs, and no single worker can see the whole corpus.

:func:`pack_offsets` uses the *boundary-start* assignment: documents are
routed to independent packing streams by a Knuth hash of their id
(embarrassingly parallel — each stream packs alone), ordered by id
within the stream, and assigned ``pack_no = prefix_tokens_before //
budget`` — a pure prefix sum, so the result is identical at any
parallelism and exactly SQL-reproducible (unlike first-fit bin packing,
which is inherently sequential). A document that straddles a boundary
belongs to the pack where it starts (its tail spills into the next
pack's stream — the "document-boundary-agnostic" packing most
pretraining pipelines use anyway).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sampling import knuth_hash


def pack_offsets(
    ds,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_streams: int = 8,
    exchange: str | None = None,
):
    """Assign every row a ``(stream, pack_no, pack_pos)`` packing
    address. One exchange: rows route by the precomputed stream id
    (``knuth_hash(id) % num_streams``), each stream sorts by id and
    runs one integer prefix sum — exact at any scale (int64 token
    counts, no float accumulation)."""
    from ..stages.partition import (
        BUCKET_COL, bucket_exchange, resolve_exchange,
    )

    def add_stream(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["stream"] = (
            knuth_hash(df[id_col].to_numpy()) % np.uint64(num_streams)
        ).astype(np.int64)
        return df

    routed = ds.map_batches(add_stream, batch_format="pandas")

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        # group by the STREAM, not the physical bucket: the groupby
        # exchange hash-buckets the stream id, so one bucket frame can
        # legitimately carry several streams — each must pack alone
        df = df.sort_values(["stream", id_col], kind="mergesort").reset_index(
            drop=True
        )
        tok = pd.Series(df[tokens_col].to_numpy(np.int64))
        cum = (tok.groupby(df["stream"], sort=False).cumsum() - tok).to_numpy()
        df["pack_no"] = cum // np.int64(budget)
        df["pack_pos"] = cum % np.int64(budget)
        return df.drop(columns=[BUCKET_COL], errors="ignore")

    if resolve_exchange(exchange) == "tasks":
        return bucket_exchange(routed, ["stream"], pack, num_streams,
                               bucket_col="stream")
    from ..stages.partition import add_bucket

    bucketed = add_bucket(routed, ["stream"], num_streams)
    return bucketed.groupby(BUCKET_COL).map_groups(pack, batch_format="pandas")


def concat_block_spans(
    ds,
    id_col: str,
    tokens_col: str,
    block_tokens: int,
    num_buckets: int = 16,
):
    """GPT-style concat-and-chunk packing: documents concatenate in
    ``id_col`` order into one global token stream that is cut into
    fixed ``block_tokens`` blocks; emits one span row per
    (document, block) overlap — ``(id, block_id, tok_start, tok_end)``,
    token offsets LOCAL to the document (half-open). Documents crossing
    a block boundary emit one span per block (the complement of the
    boundary-start :func:`pack_offsets` form, where no document ever
    crosses).

    The global cumulative token offset comes from the distributed
    ordered scan (:func:`~transmog_ray.functions.relational.ordered_scan`
    — range partition + broadcast offsets, NO global sort); the span
    explode is a pure vectorized map. All-integer output — SQL-exact
    (``SUM OVER (ORDER BY)`` + zipped unnest(range)).

    ``id_col`` must be unique and non-null (it defines the stream
    order)."""
    import numpy as np

    from .relational import ordered_scan

    scanned = ordered_scan(ds, id_col, tokens_col, out_col="_cend",
                           num_buckets=num_buckets)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[tokens_col] > 0]
        if not len(df):
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "block_id": pd.Series(dtype="int64"),
                "tok_start": pd.Series(dtype="int64"),
                "tok_end": pd.Series(dtype="int64"),
            })
        cend = df["_cend"].to_numpy(np.int64)
        n = df[tokens_col].to_numpy(np.int64)
        cstart = cend - n
        b0 = cstart // block_tokens
        b1 = (cend - 1) // block_tokens
        reps = (b1 - b0 + 1).astype(np.int64)
        row = np.repeat(np.arange(len(df), dtype=np.int64), reps)
        # per-row block sequence: b0[row] + position-within-row
        pos = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps)[:-1]]), reps
        )
        block = b0[row] + pos
        lo = np.maximum(block * block_tokens, cstart[row])
        hi = np.minimum((block + 1) * block_tokens, cend[row])
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[row],
            "block_id": block,
            "tok_start": lo - cstart[row],
            "tok_end": hi - cstart[row],
        })

    return scanned.map_batches(explode, batch_format="pandas")


__all__ = ["pack_offsets", "concat_block_spans"]
