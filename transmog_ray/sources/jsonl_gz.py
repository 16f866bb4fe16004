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
