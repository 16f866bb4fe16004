"""Ray Data flatten stage: nested JSON/metadata columns → flat parent/child tables.

Ray-Data-first reimagination of the reference's batch loop (reference
api.py:182-281, streaming.py:16-117): the single-process ``iterator →
buffer → flatten → writer`` pipeline becomes

    read_parquet → map_batches(FlattenStage, batch_format="pyarrow",
                               concurrency=N) → downstream / write_parquet

with the per-record kernel from :mod:`transmog_ray.core.flatten` applied
inside each Arrow batch. Design points:

* **Two-phase schema**: the reference infers each table's schema from its
  first batch and freezes it (arrow_base.py:364-369) — racy under parallel
  blocks. Here :func:`compile_plan` discovers schemas from a driver-side
  sample ONCE, and every task conforms batches to the frozen plan
  (missing columns → null, unseen columns/tables → dropped, numeric
  promotions via cast). Deterministic across retries and block order.
* **Single flatten pass, many tables**: a Dataset has one schema, so the
  stage can emit either one table (``emit="main"`` / ``emit=<child>``)
  or — the scale path — a tagged union of all tables (``emit="tagged"``,
  adding a ``_table`` column). Tagged mode flattens ONCE and downstream
  consumers split with cheap vectorized filters instead of re-running the
  (expensive) JSON parse + flatten per table.
* **Passthrough is zero-copy**: wide payload columns (html/text) never
  enter Python — they are sliced from the input Arrow batch with a take()
  on the kept-row mask, so the byte-identity invariant on ``text`` holds
  structurally.
* **Determinism**: ``extract_time`` is a run constant injected at plan
  time; with hash/composite ID strategies the stage is idempotent under
  Ray task retries.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.config import FlattenConfig
from ..core.flatten import Flattener

try:  # optional fast JSON
    import orjson

    def _loads(s):
        return orjson.loads(s)
except ImportError:  # pragma: no cover
    def _loads(s):
        return json.loads(s)

#: canonical string form for timestamp columns entering the hash recipe
TS_CANON_FMT = "%Y-%m-%d %H:%M:%S.%f"

TABLE_TAG = "_table"


@dataclass(frozen=True)
class FlattenSpec:
    """What to flatten out of each input batch.

    The per-row record handed to the kernel is
    ``{col: canon(value) for col in record_cols} | {json_col: parse(json)}``
    so flattened columns from the nested tree are prefixed ``<json_col>_``
    and composite IDs can be computed over the scalar key columns.
    ``passthrough`` columns are copied from the input batch into the main
    output without touching Python.
    """

    entity: str
    config: FlattenConfig = field(default_factory=FlattenConfig)
    json_col: str | None = None
    record_cols: tuple = ()
    passthrough: tuple = ()
    #: input columns injected (typed, by source-record index) into every
    #: CHILD row — lets downstream ops key child tables by the natural key
    #: (e.g. url/warc_ts) without a join back through ``_parent_id``
    child_passthrough: tuple = ()
    #: column holding the FULL record as a JSON string — each row's parsed
    #: object IS the record (no key prefix), for flattening raw JSONL lines
    record_json_col: str | None = None
    #: tagged emission only: stamp every main/child row with ``_fp`` (a
    #: deterministic 64-bit content fingerprint of its SOURCE record over
    #: record_cols + json_col) and child rows with ``_seq`` (the row's
    #: ordinal within its record, per table). Lets downstream dedup pick a
    #: winner among rows sharing a natural key and keep exactly the
    #: winner's child rows — identical duplicate records collapse on
    #: (_fp, _seq) while genuinely repeated child items within one record
    #: stay distinct.
    provenance: bool = False
    #: per-record child-table aggregates PUSHED DOWN into the flatten pass:
    #: tuple of (child_table, alias, child_col, op) with op in
    #: count/sum/mean/min/max. A record's child rows never leave the task,
    #: so these are exact — and the child rows need not shuffle at all
    #: when the pipeline only needs the aggregates (scale lever).
    child_aggs: tuple = ()
    extract_time: str | None = None


@dataclass(frozen=True)
class FlattenPlan:
    """Frozen output schemas (discovered once, enforced everywhere)."""

    spec: FlattenSpec
    main_flat_schema: pa.Schema  # flattened-only columns of the main table
    child_schemas: dict  # table name -> pa.Schema

    @property
    def child_names(self) -> list[str]:
        return list(self.child_schemas)


# --------------------------------------------------------------- records


def _canonize_column(col: pa.ChunkedArray | pa.Array) -> list:
    """Values of a scalar key column in canonical hashable form.

    Timestamps become strings in :data:`TS_CANON_FMT` (the engine's
    documented canonical form — hashing a raw ``datetime`` would make IDs
    depend on repr details); other types pass through as Python values.
    """
    if pa.types.is_timestamp(col.type):
        return pc.strftime(col, format=TS_CANON_FMT).to_pylist()
    return col.to_pylist()


def build_records(batch: pa.Table, spec: FlattenSpec) -> list[dict]:
    if spec.record_json_col is not None:
        return [
            {} if (s is None or s == "") else _loads(s)
            for s in batch[spec.record_json_col].to_pylist()
        ]
    cols = {c: _canonize_column(batch[c]) for c in spec.record_cols}
    parsed = None
    if spec.json_col is not None:
        parsed = [
            None if (s is None or s == "") else _loads(s)
            for s in batch[spec.json_col].to_pylist()
        ]
    records: list[dict] = []
    for i in range(batch.num_rows):
        rec = {c: cols[c][i] for c in spec.record_cols}
        if parsed is not None and parsed[i] is not None:
            rec[spec.json_col] = parsed[i]
        records.append(rec)
    return records


# ------------------------------------------------------------- discovery


def rows_to_table(rows: list[dict]) -> pa.Table:
    """Rows → Arrow table over the UNION of keys, in first-seen order.

    ``pa.Table.from_pylist`` without a schema keys off the leading rows, so
    columns that first appear later in the sample would be silently dropped;
    flatten output is ragged by design (null-likes vanish), so the union must
    be explicit. All-null columns become ``string`` (the reference's
    all-null rule, arrow_base.py:274-349).
    """
    order: dict[str, None] = {}
    for row in rows:
        for k in row:
            if k not in order:
                order[k] = None
    arrays, fields = [], []
    for k in order:
        arr = pa.array([row.get(k) for row in rows])
        if pa.types.is_null(arr.type):
            arr = arr.cast(pa.string())
        arrays.append(arr)
        fields.append(pa.field(k, arr.type))
    if not fields:
        return pa.table({})
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _agg_values(values: list, op: str):
    vals = [v for v in values if v is not None and v == v]  # non-null, non-NaN
    if op == "count":
        return len(vals)
    if not vals:
        return None
    if op == "sum":
        return sum(vals)
    if op == "mean":
        return sum(vals) / len(vals)
    if op == "min":
        return min(vals)
    if op == "max":
        return max(vals)
    raise ValueError(f"unsupported child_agg op {op!r}")


def flatten_records(flattener: Flattener, records: list[dict], spec: FlattenSpec):
    """Shared record loop for plan discovery and the runtime stage:
    flatten each record, track child-row source indices, and append any
    pushed-down child aggregates to the main row."""
    rows: list[dict] = []
    keep_idx: list[int] = []
    children: dict[str, list[dict]] = {}
    child_src: dict[str, list[int]] = {}
    extract_time = spec.extract_time
    flatten_record = flattener.flatten_record
    for i, rec in enumerate(records):
        row, kids = flatten_record(rec, extract_time) if rec else (None, {})
        if row is not None:
            for table, alias, col, op in spec.child_aggs:
                row[alias] = _agg_values(
                    [r.get(col) for r in kids.get(table, ())], op
                )
            rows.append(row)
            keep_idx.append(i)
        for tname, trows in kids.items():
            children.setdefault(tname, []).extend(trows)
            child_src.setdefault(tname, []).extend([i] * len(trows))
    return rows, keep_idx, children, child_src


def compile_plan(sample: pa.Table, spec: FlattenSpec) -> FlattenPlan:
    """Discover frozen table schemas by flattening a driver-side sample.

    The sample must exercise every child table and column that production
    data will produce (like the reference's first-batch freeze, but explicit
    and deterministic); unseen columns/tables are dropped at runtime.
    """
    flattener = Flattener(spec.config, spec.entity)
    records = build_records(sample, spec)
    rows, _keep, children, _src = flatten_records(flattener, records, spec)

    main_tbl = rows_to_table(rows)
    drop = [c for c in main_tbl.column_names if c in spec.passthrough]
    main_schema = main_tbl.drop_columns(drop).schema

    child_schemas = {
        name: rows_to_table(rws).schema for name, rws in children.items()
    }
    return FlattenPlan(spec, main_schema, dict(sorted(child_schemas.items())))


def plan_from_dataset(ds, spec: FlattenSpec, sample_rows: int = 5000) -> FlattenPlan:
    """Compile the plan from the head of a Dataset (small, driver-side)."""
    import ray.data  # noqa: F401  (ds is a ray.data.Dataset)

    cols = list(dict.fromkeys([
        *spec.record_cols,
        *([spec.json_col] if spec.json_col else []),
        *([spec.record_json_col] if spec.record_json_col else []),
    ]))
    sample = ds.limit(sample_rows).select_columns(cols).to_arrow_refs()
    import ray

    tables = [t for t in ray.get(sample) if t.num_rows]
    merged = pa.concat_tables(tables) if tables else pa.table({})
    # passthrough columns are not needed for discovery; fake empty ones
    return compile_plan(merged, spec)


def _conform(rows: list[dict], schema: pa.Schema) -> pa.Table:
    """Rows → Arrow table under a frozen schema (missing → null, extras
    dropped, numerics promoted by cast)."""
    if not rows:
        return schema.empty_table()
    try:
        return pa.Table.from_pylist(rows, schema=schema)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        loose = rows_to_table(rows)
        arrays = []
        for fld in schema:
            if fld.name in loose.column_names:
                arrays.append(loose[fld.name].cast(fld.type))
            else:
                arrays.append(pa.nulls(len(rows), fld.type))
        return pa.Table.from_arrays(arrays, schema=schema)


def _record_fp(batch: pa.Table, spec: FlattenSpec) -> np.ndarray:
    """Deterministic int64 content fingerprint of each source record,
    hashed over the record/JSON columns (vectorized siphash — same
    recipe as stages.partition.key_hash; no PYTHONHASHSEED dependence)."""
    import pandas as pd

    from .partition import key_hash

    cols = [
        *spec.record_cols,
        *([spec.json_col] if spec.json_col else []),
        *([spec.record_json_col] if spec.record_json_col else []),
    ]
    frame = batch.select(list(dict.fromkeys(cols))).to_pandas()
    return key_hash(frame, list(frame.columns)).view(np.int64)


def _run_ordinal(src: np.ndarray) -> np.ndarray:
    """Position of each element within its contiguous run of equal source
    indices — the child row's ordinal within its record."""
    if len(src) == 0:
        return np.empty(0, dtype=np.int64)
    pos = np.arange(len(src), dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, np.diff(src) != 0])
    lengths = np.diff(np.r_[starts, len(src)])
    return pos - np.repeat(starts, lengths)


# ----------------------------------------------------------------- stage


class FlattenStage:
    """Callable-class stage for ``map_batches`` (actor pool when
    ``concurrency`` is set): compiles the kernel once per actor in
    ``__init__``, flattens per batch in ``__call__``.

    emit:
      * ``"main"``       → the flattened main table (+ passthrough columns)
      * ``"<child>"``    → one child table
      * ``"tagged"``     → all tables unioned, discriminated by ``_table``
    """

    def __init__(self, plan: FlattenPlan, emit: str = "main"):
        self.plan = plan
        self.spec = plan.spec
        self.emit = emit
        # main-only emission discards child rows (or aggregates them per
        # record), so their per-row metadata/ids are never observable —
        # skip the hashing
        self.flattener = Flattener(
            self.spec.config, self.spec.entity, child_metadata=(emit != "main")
        )
        if emit not in ("main", "tagged") and emit not in plan.child_schemas:
            raise ValueError(
                f"emit={emit!r} is not 'main', 'tagged' or a known child table "
                f"{plan.child_names}"
            )

    # -- per-batch work

    def __call__(self, batch: pa.Table) -> pa.Table:
        records = build_records(batch, self.spec)
        rows, keep_idx, children, child_src = flatten_records(
            self.flattener, records, self.spec
        )
        if self.emit == "main":
            return self._main_table(batch, rows, keep_idx)
        if self.emit == "tagged":
            return self._tagged_table(batch, rows, keep_idx, children, child_src)
        return self._child_table(batch, self.emit, children, child_src)

    def _child_table(self, batch, tname, children, child_src) -> pa.Table:
        out = _conform(children.get(tname, []), self.plan.child_schemas[tname])
        for pos, name in enumerate(self.spec.child_passthrough):
            idx = pa.array(np.asarray(child_src.get(tname, []), dtype=np.int64))
            out = out.add_column(pos, batch.schema.field(name), batch[name].take(idx))
        return out

    def _main_table(self, batch: pa.Table, rows, keep_idx) -> pa.Table:
        flat = _conform(rows, self.plan.main_flat_schema)
        idx = pa.array(np.asarray(keep_idx, dtype=np.int64))
        out = flat
        for pos, name in enumerate(self.spec.passthrough):
            out = out.add_column(
                pos, batch.schema.field(name), batch[name].take(idx)
            )
        return out


    def _tagged_table(self, batch, rows, keep_idx, children, child_src) -> pa.Table:
        fp = _record_fp(batch, self.spec) if self.spec.provenance else None
        main = self._main_table(batch, rows, keep_idx)
        main = main.add_column(0, TABLE_TAG, pa.array([self.spec.entity] * main.num_rows))
        if fp is not None:
            main = main.append_column(
                "_fp", pa.array(fp[np.asarray(keep_idx, dtype=np.int64)], pa.int64())
            )
        parts = [main]
        for tname in self.plan.child_schemas:
            child = self._child_table(batch, tname, children, child_src)
            child = child.add_column(0, TABLE_TAG, pa.array([tname] * child.num_rows))
            if fp is not None:
                src = np.asarray(child_src.get(tname, []), dtype=np.int64)
                child = child.append_column("_fp", pa.array(fp[src], pa.int64()))
                child = child.append_column(
                    "_seq", pa.array(_run_ordinal(src), pa.int64())
                )
            parts.append(child)
        return pa.concat_tables(parts, promote_options="permissive")


# ------------------------------------------------------------ dataset api


def flatten_json_file(
    path,
    out_dir: str,
    entity: str = "record",
    config: FlattenConfig | None = None,
    extract_time: str | None = None,
    **map_kwargs,
) -> dict:
    """Ray-native streaming flatten of JSONL file(s) → one parquet
    directory per table (the reference's ``flatten_stream`` at scale:
    read_text → FlattenStage → write_parquet; constant memory, parallel).

    Returns {table: output_dir}."""
    import os

    import ray.data as rd

    spec = FlattenSpec(
        entity=entity,
        config=config or FlattenConfig(),
        record_json_col="text",
        extract_time=extract_time,
    )
    ds = rd.read_text(path)
    plan = plan_from_dataset(ds, spec)
    # flatten ONCE in tagged mode and materialize; per-table writes are
    # then cheap vectorized filters over the same blocks — N tables cost
    # one JSON parse + flatten pass, not N
    tagged, _ = flatten_dataset(ds, spec, plan=plan, emit="tagged", **map_kwargs)
    tagged = tagged.materialize()
    out: dict[str, str] = {}
    for table, table_ds in split_tagged(tagged, plan).items():
        dest = os.path.join(out_dir, table)
        table_ds.write_parquet(dest)
        out[table] = dest
    return out


def flatten_dataset(ds, spec: FlattenSpec, plan: FlattenPlan | None = None,
                    emit: str = "main", **map_kwargs):
    """``map_batches`` wrapper: flatten a Dataset into one logical table.

    ``concurrency=N`` in map_kwargs turns the stage into an actor pool with
    the compiled plan held in actor state (north-star execution shape).
    """
    plan = plan or plan_from_dataset(ds, spec)
    map_kwargs.setdefault("batch_format", "pyarrow")
    map_kwargs.setdefault("zero_copy_batch", True)
    # whole-block batches: per-batch conform/concat overhead amortizes far
    # better than the 1024-row default (block size already bounds memory)
    map_kwargs.setdefault("batch_size", None)
    if map_kwargs.get("concurrency") is None:
        # Stateless tasks with the compiled stage baked into the closure:
        # elastic scheduling, no CPU reservation that could starve the read
        # stage on small machines. Explicit concurrency=N → true actor pool.
        map_kwargs.pop("concurrency", None)
        return ds.map_batches(FlattenStage(plan, emit), **map_kwargs), plan
    return ds.map_batches(
        FlattenStage,
        fn_constructor_kwargs={"plan": plan, "emit": emit},
        **map_kwargs,
    ), plan


def split_tagged(tagged_ds, plan: FlattenPlan):
    """Split a tagged union dataset into per-table datasets (cheap filters,
    no re-flattening)."""

    def extract(table_name: str, keep_cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            m = t.filter(pc.equal(t[TABLE_TAG], table_name))
            return m.select([c for c in keep_cols if c in m.column_names])
        return fn

    spec = plan.spec
    out = {}
    main_cols = [*spec.passthrough, *plan.main_flat_schema.names]
    out[spec.entity] = tagged_ds.map_batches(
        extract(spec.entity, main_cols), batch_format="pyarrow")
    for tname, schema in plan.child_schemas.items():
        child_cols = [*spec.child_passthrough, *schema.names]
        out[tname] = tagged_ds.map_batches(
            extract(tname, child_cols), batch_format="pyarrow")
    return out


__all__ = [
    "FlattenSpec",
    "flatten_json_file",
    "FlattenPlan",
    "FlattenStage",
    "compile_plan",
    "plan_from_dataset",
    "flatten_dataset",
    "split_tagged",
    "build_records",
    "TS_CANON_FMT",
    "TABLE_TAG",
]
