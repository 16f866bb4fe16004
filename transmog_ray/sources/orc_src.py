"""Distributed ORC source (one read task per file).

The reference WRITES ORC (writers/orc.py; our batch + streaming ORC
writers live in api.py) — lake ingest needs the read side too, and
pyarrow ships an ORC reader, so the format matrix closes without new
deps. ORC is stripe-structured and column-pruned at the reader, so
``columns=`` prunes I/O inside each task, like the parquet read path.

Scale shape: the FILE is the parallelism unit (same contract as
``read_csv_files`` / ``read_jsonl_gz`` / ``read_ipc``): at 100 TB the
shard list streams from the catalog and each task decodes one shard
with the vectorized Arrow ORC reader; the streaming executor pipelines
shards across cores. No driver-side materialization anywhere.

Note: ORC stores timestamps at ns resolution — a µs-timestamp table
round-trips value-exactly but comes back as ``timestamp[ns]``;
downstream epoch math must go through int64 ns (the repo-wide rule).
"""

from __future__ import annotations

from collections.abc import Sequence


def read_orc_files(paths: Sequence[str],
                   columns: Sequence[str] | None = None):
    """Read ORC shards as a Ray Dataset, one vectorized decode per file.

    ``paths`` is an explicit file list (glob driver-side; directories
    are not accepted). Column pruning happens inside the ORC reader —
    unrequested columns never decompress.
    """
    import ray.data as rd

    items = [{"path": str(p)} for p in paths]
    if not items:
        raise ValueError("read_orc_files needs at least one path")
    cols = list(columns) if columns is not None else None

    def load(df):
        import pyarrow as pa
        from pyarrow import orc

        tables = []
        for path in df["path"]:
            f = orc.ORCFile(path)
            tables.append(f.read(columns=cols))
        return pa.concat_tables(
            tables, promote_options="default").combine_chunks()

    return rd.from_items(items).map_batches(load, batch_format="pandas")
