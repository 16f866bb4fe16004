"""Distributed CSV source (RFC-4180 quoting, one parse task per file).

The reference only WRITES CSV (writers/csv.py); lake ingest also needs
the read side. CSV with quoted fields is not safely splittable mid-file
(a newline inside quotes looks like a record boundary), so — like gzip
JSONL — the FILE is the parallelism unit: one Ray task parses one shard
with pyarrow's vectorized CSV reader and the streaming executor
pipelines shards across cores.

Scale shape: at 100 TB the shard list streams from the catalog; parse
cost is per-file and embarrassingly parallel. ``columns=`` prunes right
after parse so only requested columns leave the task.
"""

from __future__ import annotations

from collections.abc import Sequence


def read_csv_files(paths: Sequence[str],
                   columns: Sequence[str] | None = None,
                   delimiter: str = ","):
    """Read CSV shards as a Ray Dataset, one vectorized parse per file.

    ``paths`` is an explicit file list (glob driver-side; directories
    are not accepted — same contract as ``read_jsonl_gz``/``read_ipc``).
    Quoted fields may contain the delimiter, double-quotes (``""``) and
    embedded newlines.
    """
    import ray.data as rd

    items = [{"path": str(p)} for p in paths]
    if not items:
        raise ValueError("read_csv_files needs at least one path")
    cols = list(columns) if columns is not None else None

    def load(df):
        import pyarrow as pa
        import pyarrow.csv as pacsv

        tables = []
        for path in df["path"]:
            t = pacsv.read_csv(
                path,
                parse_options=pacsv.ParseOptions(delimiter=delimiter))
            if cols is not None:
                t = t.select(cols)
            tables.append(t)
        return pa.concat_tables(
            tables, promote_options="default").combine_chunks()

    return rd.from_items(items).map_batches(load, batch_format="pandas")
