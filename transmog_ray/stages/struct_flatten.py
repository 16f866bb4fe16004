"""Vectorized flatten for Arrow STRUCT columns — the zero-Python fast path.

When nested data is already typed (Arrow ``struct`` columns from Parquet,
not JSON strings), flattening scalar paths needs NO per-record Python at
all: struct fields are recursively hoisted into top-level columns with
``_``-joined path names, zero-copy. Lists of structs (child tables) can
be exploded with Arrow ``list_flatten``/``list_parent_indices`` — also
vectorized.

This complements the JSON-string kernel (stages/flatten.py): same naming
convention (paths joined with ``_``, top-level keys bare), applied when
the schema is static. Differences from the record kernel are inherent to
typed columns and documented here:

* null-like handling is column-level (a struct field exists for every
  row; value nulls stay null) — there is no "drop this key" per row;
* empty-dict/empty-list elision does not apply (typed schemas cannot
  express "sometimes absent").
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def flatten_struct_columns(
    t: pa.Table, columns: Sequence[str] | None = None, sep: str = "_"
) -> pa.Table:
    """Hoist struct columns into flat columns, recursively, zero-copy.

    ``a: struct<b: struct<c: int>, d: string>`` → columns ``a_b_c, a_d``.
    Non-struct columns (including lists) pass through unchanged.
    """
    target = set(columns) if columns is not None else None
    names: list[str] = []
    arrays: list[pa.ChunkedArray | pa.Array] = []

    def emit(name: str, col):
        names.append(name)
        arrays.append(col)

    def walk(name: str, col):
        typ = col.type
        if pa.types.is_struct(typ):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            for i in range(typ.num_fields):
                fld = typ.field(i)
                # .field() propagates parent nulls into the child
                walk(f"{name}{sep}{fld.name}", pc.struct_field(col, fld.name))
        else:
            emit(name, col)

    for name in t.column_names:
        col = t[name]
        if (target is None or name in target) and pa.types.is_struct(col.type):
            walk(name, col)
        else:
            emit(name, col)
    return pa.table(dict(zip(names, arrays)))


def explode_list_column(
    t: pa.Table,
    list_col: str,
    parent_cols: Sequence[str] = (),
    sep: str = "_",
) -> pa.Table:
    """Child-table extraction, vectorized: one output row per list element
    of ``list_col``, carrying ``parent_cols`` from the owning row
    (Arrow ``list_parent_indices`` — no Python loop).

    Struct elements are hoisted with :func:`flatten_struct_columns`
    semantics; primitive elements land in a ``value`` column (mirroring
    the record kernel's mixed-array rule).
    """
    col = t[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
        raise TypeError(f"{list_col!r} is not a list column ({col.type})")

    parent_idx = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)

    out_cols: dict[str, pa.Array] = {}
    for pcol in parent_cols:
        parent = t[pcol]
        if isinstance(parent, pa.ChunkedArray):
            parent = parent.combine_chunks()
        out_cols[pcol] = parent.take(parent_idx)

    if pa.types.is_struct(flat.type):
        hoisted = flatten_struct_columns(
            pa.table({list_col: flat}), [list_col], sep=sep
        )
        for name in hoisted.column_names:
            # strip the list-column prefix: elements are rows of the child
            # table, named by their own fields
            short = name[len(list_col) + len(sep):] if name.startswith(
                f"{list_col}{sep}") else name
            out_cols[short] = hoisted[name].combine_chunks()
    else:
        out_cols["value"] = flat
    return pa.table(out_cols)


def flatten_struct_dataset(ds, columns: Sequence[str] | None = None, sep: str = "_"):
    """Dataset wrapper: vectorized struct hoisting per batch."""
    return ds.map_batches(
        lambda t: flatten_struct_columns(t, columns, sep),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


__all__ = [
    "flatten_struct_columns",
    "explode_list_column",
    "flatten_struct_dataset",
]
