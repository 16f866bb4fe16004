"""Schema-evolution parquet reads: one Dataset over files whose schemas
drifted (columns added/dropped over time), harmonized by NAME to the
permissive union schema — the Ray-side equivalent of DuckDB/Spark
``union_by_name``.

Scale shape: files are grouped by their exact schema fingerprint, so the
driver creates ONE Ray read per DISTINCT schema (not per file — a 100 TB
lake has millions of files but a handful of schema versions); each
group's blocks are padded to the union schema with typed nulls in a
map-only stage and the groups union into a single streaming Dataset.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def read_parquet_union(paths, columns=None, override_num_blocks=None):
    """Read parquet files with heterogeneous schemas as ONE Dataset.

    ``paths``: a directory, a file, or a list of either (directories
    expand to their ``*.parquet`` members — Ray's ``read_parquet``
    rejects directories inside lists). Column types are unified with
    permissive promotion (int32+int64 → int64, missing → typed null);
    ``columns`` prunes the UNION schema (a column absent from some files
    is padded with nulls there, pruned at the read where present).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.common import pad_to

    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        else:
            files.append(p)
    if not files:
        raise ValueError("read_parquet_union: no parquet files found")

    # group by schema fingerprint: one Ray read per schema VERSION
    groups: dict[bytes, tuple[pa.Schema, list[str]]] = {}
    for f in files:
        s = pq.read_schema(f)
        key = s.serialize().to_pybytes()
        groups.setdefault(key, (s, []))[1].append(f)

    target = pa.unify_schemas([s for s, _ in groups.values()],
                              promote_options="permissive")
    if columns is not None:
        missing = [c for c in columns if c not in target.names]
        if missing:
            raise ValueError(f"columns not in any file: {missing}")
        target = pa.schema([target.field(c) for c in columns])

    parts = []
    for schema, group_files in groups.values():
        if columns is None:
            present = None
        else:
            present = [c for c in columns if c in schema.names]
            if not present:
                # no requested column exists in this schema version: read
                # one thin column for row COUNTS; pad_to drops it and
                # emits typed nulls for every target field
                present = [schema.names[0]]
        kwargs = {}
        if override_num_blocks is not None:
            kwargs["override_num_blocks"] = max(
                1, override_num_blocks * len(group_files) // len(files))
        ds = rd.read_parquet(group_files, columns=present, **kwargs)
        parts.append(ds.map_batches(pad_to(target), batch_format="pyarrow"))

    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out
