"""Shared Dataset helpers: Arrow schema access and typed schema padding.

Used by every two-sided operator (as-of join, hash join) that unions
datasets: Ray union + groupby needs block-schema agreement, so both sides
are conformed to one target Arrow schema with TYPED null columns first.
"""

from __future__ import annotations

import pyarrow as pa


def arrow_schema(ds, sample_rows: int = 1000) -> pa.Schema:
    """Arrow schema of a Dataset regardless of its block format.

    ``ds.schema().base_schema`` is a ``PandasBlockSchema`` for
    pandas-backed datasets, so fall back to sampling rows: several batches
    are unified so a leading all-null column still gets a real type from
    later rows; columns null across the whole sample degrade to ``string``
    (the engine-wide all-null rule). Empty pandas datasets map their numpy
    dtypes.
    """
    schema = ds.schema()
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        # a null-typed field means the first block was an empty/all-null
        # slice (e.g. an empty bucket of the task exchange) — its schema
        # is arrival-order dependent, so fall through to sampling
        if not any(pa.types.is_null(f.type) for f in base):
            return base
    sampled = [
        b.schema
        for b in ds.limit(sample_rows).iter_batches(
            batch_size=sample_rows, batch_format="pyarrow"
        )
    ]
    if sampled:
        unified = pa.unify_schemas(sampled, promote_options="permissive")
        return pa.schema(
            [
                pa.field(f.name, pa.string() if pa.types.is_null(f.type) else f.type)
                for f in unified
            ]
        )
    fields = []
    for name, dtype in zip(schema.names, schema.types):
        if isinstance(dtype, pa.DataType):
            fields.append(pa.field(name, dtype))
        else:
            try:
                fields.append(pa.field(name, pa.from_numpy_dtype(dtype)))
            except pa.ArrowNotImplementedError:
                # empty pandas dataset with object dtype: nothing to
                # sample, no Arrow mapping — the engine-wide all-null
                # rule (degrade to string) applies
                fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


def pad_to(target: pa.Schema, tag_col: str | None = None, tag_value: int = 0):
    """pyarrow map fn conforming every batch to *target*: missing fields
    become typed nulls, mismatched types are cast, ``tag_col`` (if named
    in *target*) is filled with ``tag_value``."""

    def fn(t: pa.Table) -> pa.Table:
        arrays = []
        for fld in target:
            if tag_col is not None and fld.name == tag_col:
                arrays.append(pa.array([tag_value] * t.num_rows, fld.type))
            elif fld.name in t.column_names:
                col = t[fld.name]
                if col.type != fld.type:
                    try:
                        col = col.cast(fld.type)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        if pa.types.is_string(fld.type):
                            col = pa.array(
                                [None if v is None else str(v) for v in col.to_pylist()],
                                pa.string(),
                            )
                        else:
                            raise
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                arrays.append(col)
            else:
                arrays.append(pa.nulls(t.num_rows, fld.type))
        return pa.Table.from_arrays(arrays, schema=target)

    return fn


def union_schemas(
    left: pa.Schema, right: pa.Schema, tag_col: str
) -> pa.Schema:
    """Left fields + right-only fields + an int8 side tag."""
    fields = list(left)
    for fld in right:
        if fld.name not in left.names:
            fields.append(fld)
    fields.append(pa.field(tag_col, pa.int8()))
    return pa.schema(fields)


__all__ = ["arrow_schema", "pad_to", "union_schemas"]
