"""Dead-letter-queue map stage: per-ROW error quarantine.

A 100-TB ingest cannot die on row 40-billion-and-three: a malformed
record must be routed aside with its error, not crash the task (the
reference's strict line-numbered ``ValidationError`` surface stays the
default for interactive use — this stage is the pipeline-mode
complement). ``quarantine_map`` applies a per-row parser and tags each
row ok/error in ONE pass; the two views filter the tagged stream, so
good rows flow on zero-copy and the DLQ keeps the offending payload +
exception text for replay.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

ERROR_COL = "_dlq_error"


def quarantine_map(ds, fn: Callable[[object], dict],
                   input_col: str):
    """Apply *fn* (one input value → dict of output columns) per row;
    rows where *fn* raises become DLQ rows carrying the raw input and
    the exception message. Returns the TAGGED dataset — filter with
    :func:`ok_rows` / :func:`dlq_rows`. Call ``.materialize()`` on the
    result before consuming both views or the parse re-executes per
    consumer (Ray re-runs lazy sub-DAGs)."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        outs, errs = [], []
        for v in df[input_col]:
            try:
                outs.append(fn(v))
                errs.append(None)
            except Exception as ex:  # noqa: BLE001 — the whole point
                outs.append(None)
                errs.append(f"{type(ex).__name__}: {ex}")
        cols: dict[str, list] = {}
        for o in outs:
            if o is not None:
                for k in o:
                    cols.setdefault(k, [])
        for o in outs:
            for k in cols:
                cols[k].append(None if o is None else o.get(k))
        out = pd.DataFrame({input_col: df[input_col].to_numpy(object)})
        for k, vals in cols.items():
            out[k] = pd.array(vals, dtype=object)
        out[ERROR_COL] = pd.array(errs, dtype=object)
        return out

    return ds.map_batches(per_batch, batch_format="pandas")


def ok_rows(tagged):
    """Successfully-parsed rows, error column dropped."""
    return tagged.map_batches(
        lambda df: df[df[ERROR_COL].isna()].drop(columns=[ERROR_COL]),
        batch_format="pandas")


def dlq_rows(tagged, input_col: str):
    """The dead-letter view: raw payload + error, nothing else."""
    return tagged.map_batches(
        lambda df: df.loc[df[ERROR_COL].notna(),
                          [input_col, ERROR_COL]],
        batch_format="pandas")
