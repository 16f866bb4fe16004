"""Distributed Arrow IPC (Feather V2) source.

Complements the IPC writers (api.py:189 ``_write_ipc_batch``,
api.py:702 ``StreamingIpcWriter``): the interchange files the engine
emits must also load back distributed. An IPC *file* is random-access
with a footer of record-batch offsets, so the natural parallelism unit
is the file — one Ray task memory-maps one shard and yields its record
batches zero-copy (no parse step at all, unlike JSONL/CSV).

Scale shape: at 100 TB the shard list itself streams from the object
store catalog; each task touches exactly one file, so the read scales
with file count and the streaming executor pipelines decode (a no-op
here) with downstream stages. ``columns=`` prunes at the reader so only
requested columns leave storage.
"""

from __future__ import annotations

from collections.abc import Sequence


def read_ipc(paths: Sequence[str], columns: Sequence[str] | None = None):
    """Read Arrow IPC files as a Ray Dataset, one task per file.

    ``paths`` is an explicit file list (glob driver-side; directories
    are not accepted — same contract as ``read_jsonl_gz``).
    """
    import pyarrow as pa
    import ray.data as rd

    items = [{"path": str(p)} for p in paths]
    if not items:
        raise ValueError("read_ipc needs at least one path")
    cols = list(columns) if columns is not None else None

    def load(df):
        import pyarrow as pa  # noqa: F811 — worker-side import

        tables = []
        for path in df["path"]:
            with pa.memory_map(path, "r") as src:
                t = pa.ipc.open_file(src).read_all()
            if cols is not None:
                t = t.select(cols)
            tables.append(t)
        out = pa.concat_tables(tables, promote_options="default")
        # detach from the (task-lifetime) memory map
        return out.combine_chunks()

    return rd.from_items(items).map_batches(load, batch_format="pandas")
