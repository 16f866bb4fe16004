"""Drop-in user API mirroring the reference's surface (reference
api.py:182-382): ``flatten`` for in-memory data, ``flatten_stream`` for
constant-memory file-to-file runs, ``FlattenResult.save`` for multi-table
output — so a reference user can switch imports and keep their pipeline.

Input dispatch mirrors the reference's iterator routing
(iterators.py:47-106): dict → single record, list → records, str/bytes →
JSON or JSONL (sniffed), Path → by extension. Small in-memory data runs
through the pure-Python kernel directly (no Ray session needed); file
inputs of any size stream through Ray Data when a session is available.
"""

from __future__ import annotations

import csv as _csv
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable

from .core.config import FlattenConfig
from .core.flatten import Flattener, run_timestamp

try:
    import orjson

    def _loads(s):
        return orjson.loads(s)
except ImportError:  # pragma: no cover
    def _loads(s):
        return json.loads(s)


# --------------------------------------------------------------- results


@dataclass
class FlattenResult:
    """Main table + child tables (the reference's result shape,
    api.py:26-64)."""

    entity: str
    main: list[dict] = field(default_factory=list)
    tables: dict[str, list[dict]] = field(default_factory=dict)

    @property
    def all_tables(self) -> dict[str, list[dict]]:
        return {self.entity: self.main, **self.tables}

    def save(self, path, output_format: str | None = None, **writer_options) -> list:
        """Multi-table → directory of one file per table; single table →
        one file. Format from extension when not given (parquet default).

        *path* may also be an open FILE-LIKE object (reference writer
        surface: CsvWriter/ParquetWriter accept file objects) — single
        (main) table only, and ``output_format`` is then required since
        there is no extension to sniff.

        ``**writer_options`` pass through to the format's batch writer
        (parquet: ``compression`` — default snappy — ``row_group_size``
        — default 10000 — and any ``pq.write_table`` kwarg; reference
        writers/parquet.py:38-66)."""
        if _is_file_like(path):
            if self.tables:
                raise ValueError(
                    "file-like destinations hold ONE table; this result has "
                    f"child tables {sorted(self.tables)} — save to a "
                    "directory instead"
                )
            if not output_format:
                raise ValueError(
                    "output_format is required for file-like destinations"
                )
            _write_table(self.main, path, output_format, **writer_options)
            return [path]
        path = Path(path)
        fmt = output_format or (path.suffix.lstrip(".") or "parquet")
        if self.tables:
            path.mkdir(parents=True, exist_ok=True)
            out = []
            for name, rows in self.all_tables.items():
                out.append(
                    _write_table(rows, path / f"{name}.{fmt}", fmt, **writer_options)
                )
            return out
        if not path.suffix:
            path = path.with_suffix(f".{fmt}")
        path.parent.mkdir(parents=True, exist_ok=True)
        return [_write_table(self.main, path, fmt, **writer_options)]


_CSV_DANGEROUS = ("=", "+", "-", "@", "|", "\t", "\r")


def _sanitize_csv_cell(v):
    """CSV cell sanitizer, reference parity: non-finite floats (NaN/Inf)
    normalize to ``""`` (writers/base.py:10-27 with null_replacement="",
    applied by writers/csv.py:60-74), and a quote is prefixed when the
    first character OR first non-whitespace character is
    spreadsheet-executable (leading-space bypass guard, csv.py:40-57)."""
    import math

    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return ""
    if isinstance(v, str) and v:
        stripped = v.lstrip()
        if v[0] in _CSV_DANGEROUS or (
            stripped and stripped[0] in _CSV_DANGEROUS
        ):
            return "'" + v
    return v


def _is_file_like(target) -> bool:
    return hasattr(target, "write") and not isinstance(target, (str, Path))


class MissingDependencyError(ImportError):
    """An output format's optional dependency is not installed
    (the reference's writer-factory UX, writers/__init__.py:46-130)."""


class ValidationError(ValueError):
    """Malformed input detected at PARSE time with its location — the
    reference's error surface (iterators.py:372-400): a bad JSONL line
    fails here with its line number, not later as an opaque TypeError
    deep inside flattening."""


def _write_parquet_batch(
    rows: list[dict],
    path: Path,
    compression: str = "snappy",
    row_group_size: int = 10_000,
    **options,
) -> None:
    """Reference writer defaults (writers/parquet.py:38-66): snappy
    compression, 10k-row row groups; both user-overridable so a tuned
    writer config migrates without silently reverting to pyarrow
    defaults."""
    import pyarrow.parquet as pq

    from .stages.flatten import rows_to_table

    pq.write_table(
        rows_to_table(rows), path,
        compression=compression, row_group_size=row_group_size, **options,
    )


def _write_csv_batch(rows: list[dict], path) -> None:
    """*path* may be a filesystem path or a text file-like object
    (reference CsvWriter.write accepts both, csv.py + test_writers_csv
    ``test_csv_writer_file_like_object``)."""
    keys = sorted({k for r in rows for k in r})

    def emit(f):
        w = _csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows:
            w.writerow({k: _sanitize_csv_cell(r.get(k)) for k in keys})

    if _is_file_like(path):
        emit(path)
    else:
        with open(path, "w", newline="") as f:
            emit(f)


def _write_json_batch(rows: list[dict], path) -> None:
    if _is_file_like(path):
        json.dump(rows, path, ensure_ascii=False, default=str)
    else:
        with open(path, "w") as f:
            json.dump(rows, f, ensure_ascii=False, default=str)


def _write_orc_batch(rows: list[dict], path) -> None:
    from pyarrow import orc

    from .stages.flatten import rows_to_table

    orc.write_table(
        rows_to_table(rows), path if _is_file_like(path) else str(path)
    )


def _write_ipc_batch(rows: list[dict], path) -> None:
    """Arrow IPC (Feather V2) batch sink — the zero-copy interchange
    format downstream Arrow/Polars/Ray readers memory-map directly; no
    optional dependency (ships with pyarrow)."""
    import pyarrow as pa

    from .stages.flatten import rows_to_table

    t = rows_to_table(rows)
    if _is_file_like(path):
        with pa.ipc.new_file(path, t.schema) as w:
            w.write_table(t)
    else:
        with pa.OSFile(str(path), "wb") as f, \
                pa.ipc.new_file(f, t.schema) as w:
            w.write_table(t)


def _write_avro_batch(rows: list[dict], path: Path) -> None:
    try:
        import fastavro  # noqa: F401
    except ImportError as exc:  # optional dependency, not in this env
        raise MissingDependencyError(
            "avro output requires the optional 'fastavro' package"
        ) from exc
    _write_avro(rows, path)  # pragma: no cover


#: format name → batch writer fn(rows, path). The extension surface for
#: custom sinks — see :func:`register_writer`.
BATCH_WRITERS = {
    "parquet": _write_parquet_batch,
    "csv": _write_csv_batch,
    "json": _write_json_batch,
    "orc": _write_orc_batch,
    "avro": _write_avro_batch,
    "ipc": _write_ipc_batch,
}


def register_writer(fmt: str, batch_fn=None, streaming_factory=None) -> None:
    """Register a custom output format (writer-registry extension surface,
    mirroring reference writers/__init__.py:30-43): ``batch_fn(rows,
    path)`` for :meth:`FlattenResult.save`, ``streaming_factory(out_dir,
    **opts) -> writer`` (write(table, rows)/close()) for
    :func:`flatten_stream`."""
    if batch_fn is not None:
        BATCH_WRITERS[fmt] = batch_fn
    if streaming_factory is not None:
        STREAMING_WRITERS[fmt] = streaming_factory


def _write_table(rows: list[dict], path: Path, fmt: str, **options) -> Path:
    writer = BATCH_WRITERS.get(fmt)
    if writer is None:
        raise ValueError(f"unsupported output format: {fmt!r}")
    writer(rows, path, **options)
    return path


def _avro_coerce_value(value, field_type):
    """Coerce one value to an Avro field type (reference
    avro.py:160-231 semantics, re-expressed): NaN/±Inf normalize to
    None first; union types try each non-null member IN ORDER and the
    first successful coercion wins (so a value mismatching the first
    union member is not silently dropped); an unconvertible value
    becomes None rather than raising."""
    if value is None or (isinstance(value, float) and
                         (value != value or value in (float("inf"), float("-inf")))):
        return None
    types = field_type if isinstance(field_type, list) else [field_type]
    for t in types:
        if t == "null":
            continue
        coerced = _avro_try_type(value, t)
        if coerced is not None:
            return coerced
    return None


def _avro_try_type(value, target: str):
    """One coercion attempt; None = this union member can't hold it."""
    if target == "string":
        return value if isinstance(value, str) else str(value)
    if target == "long":
        try:
            return int(value)
        except (ValueError, TypeError):
            return None
    if target == "double":
        try:
            return float(value)
        except (ValueError, TypeError):
            return None
    if target == "boolean":
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            return value.lower() in ("true", "1", "yes")
        return bool(value)
    if target == "bytes":
        return value if isinstance(value, bytes) else str(value).encode("utf-8")
    return value


def avro_schema_for(rows: list[dict]) -> dict:
    """Union-typed Avro record schema inferred from *rows* (reference
    avro.py:64-140 shape): every field nullable, observed python types
    mapped to avro primitives, unseen-type values fall back to string."""
    type_map = {bool: "boolean", int: "long", float: "double", str: "string",
                bytes: "bytes"}
    fields: dict[str, set] = {}
    for r in rows:
        for k, v in r.items():
            fields.setdefault(k, set())
            if v is not None:
                fields[k].add(type_map.get(type(v), "string"))
    return {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": k, "type": ["null", *sorted(ts or {"string"})]}
            for k, ts in fields.items()
        ],
    }


def coerce_rows_to_avro(rows: list[dict], schema: dict) -> list[dict]:
    """Coerce every row value to its field's (possibly union) schema type
    and fill absent fields with None, so fastavro never sees a mismatch.
    Pure python — testable without fastavro installed."""
    field_types = {f["name"]: f["type"] for f in schema["fields"]}
    return [
        {name: _avro_coerce_value(r.get(name), t)
         for name, t in field_types.items()}
        for r in rows
    ]


def _write_avro(rows: list[dict], path: Path) -> None:  # pragma: no cover
    """Avro with a union-typed inferred schema (the reference's Avro
    writer shape, avro.py:64-140) — only reachable when fastavro exists."""
    import fastavro

    schema = avro_schema_for(rows)
    with open(path, "wb") as f:
        fastavro.writer(f, fastavro.parse_schema(schema),
                        coerce_rows_to_avro(rows, schema))


# ---------------------------------------------------------------- inputs


def _sniff_format(text: str) -> str:
    """'jsonl' iff several leading '{'-lines parse as JSON objects
    (reference iterators.py:403-425)."""
    lines = [ln for ln in text.splitlines()[:5] if ln.strip()]
    hits = 0
    for ln in lines:
        if ln.lstrip().startswith("{"):
            try:
                _loads(ln)
                hits += 1
            except Exception:
                pass
    return "jsonl" if hits >= 2 else "json"


def _parse_optional(text: str, fmt: str):
    """JSON5/HJSON parsing behind optional dependencies (the reference's
    iterators.py:266-319 surface; neither package ships in this env)."""
    try:
        mod = __import__(fmt)
    except ImportError as exc:
        raise ImportError(
            f"{fmt} input requires the optional '{fmt}' package"
        ) from exc
    return mod.loads(text)


def _iter_jsonl_lines(lines: Iterable[str], source: str) -> Iterable[dict]:
    """Line-streamed JSONL with parse-time validation (reference
    iterators.py:372-400): invalid JSON or a non-object line raises
    :class:`ValidationError` naming the 1-based line number and source."""
    for index, raw in enumerate(lines, 1):
        line = raw.strip()
        if not line:
            continue
        try:
            record = _loads(line)
        except ValueError as exc:
            raise ValidationError(
                f"Invalid JSON on line {index} in {source}: {exc}"
            ) from exc
        if not isinstance(record, dict):
            raise ValidationError(
                f"Expected JSON object on line {index} in {source}, "
                f"got {type(record).__name__}"
            )
        yield record


def _iter_jsonl_file(p: Path) -> Iterable[dict]:
    """Line-streamed JSONL: one line parsed at a time, never the whole
    file (reference iterators.py:227-243)."""
    with open(p, "r") as f:
        yield from _iter_jsonl_lines(f, str(p))


def _iter_json_array_file(p: Path, chunk_size: int = 1 << 18) -> Iterable[dict]:
    """Constant-memory incremental parse of a file whose top level is a
    JSON ARRAY (the reference's ijson path, iterators.py:156-203, built on
    the stdlib instead): elements are decoded one at a time with
    ``JSONDecoder.raw_decode`` over a sliding buffer that is trimmed after
    every element — peak memory is O(largest element + chunk), not O(file).
    A file whose first byte is not ``[`` falls back to one whole-file load
    (first-byte sniff, reference iterators.py:179-189)."""
    dec = json.JSONDecoder()
    with open(p, "r") as f:
        buf = f.read(chunk_size)
        i = 0
        # skip leading whitespace (refill if the first chunk is all ws)
        while True:
            while i < len(buf) and buf[i].isspace():
                i += 1
            if i < len(buf):
                break
            chunk = f.read(chunk_size)
            if not chunk:
                return
            buf, i = chunk, 0
        if buf[i] != "[":
            text = buf[i:] + f.read()
            parsed = _loads(text)
            if isinstance(parsed, list):  # pragma: no cover (i=='[' above)
                yield from parsed
            else:
                yield parsed
            return
        i += 1
        while True:
            while True:
                while i < len(buf) and buf[i] in " \t\n\r,":
                    i += 1
                if i < len(buf):
                    break
                chunk = f.read(chunk_size)
                if not chunk:
                    raise ValueError(f"unterminated JSON array in {p}")
                buf, i = chunk, 0
            if buf[i] == "]":
                return
            if buf[i] in "-0123456789":
                # numbers are the one token the decoder parses GREEDILY
                # but can still extend past the buffer edge ("0" of
                # "0.5", "1e" of "1e9") — refill until a character that
                # terminates a number is in the buffer, so the number's
                # full text is guaranteed present before parsing
                while not any(c in ",]} \t\n\r" for c in buf[i + 1:]):
                    chunk = f.read(chunk_size)
                    if not chunk:
                        break  # EOF terminates the number
                    buf = buf[i:] + chunk
                    i = 0
            while True:
                try:
                    value, end = dec.raw_decode(buf, i)
                    break
                except json.JSONDecodeError:
                    chunk = f.read(chunk_size)
                    if not chunk:
                        raise
                    buf = buf[i:] + chunk
                    i = 0
            yield value
            buf = buf[end:]
            i = 0


def iter_records(data: Any, streaming: bool = True) -> Iterable[dict]:
    """Route any supported input to an iterator of record dicts
    (the reference's dispatcher surface, iterators.py:47-106):
    dict, list, iterator, JSON/JSONL str/bytes, or a path with format
    taken from the extension (.json/.jsonl/.ndjson/.json5/.hjson) or
    sniffed from a bounded head sample. File inputs stream — JSONL line
    by line, top-level JSON arrays element by element — so memory is
    bounded by one record, not the file."""
    if isinstance(data, dict):
        return [data]
    if isinstance(data, list):
        return data
    if isinstance(data, (str, bytes, Path)):
        if isinstance(data, Path) or (
            isinstance(data, str) and len(data) < 4096 and os.path.exists(data)
        ):
            p = Path(data)
            ext = p.suffix.lstrip(".")
            if ext in ("json5", "hjson"):
                parsed = _parse_optional(p.read_text(), ext)
                return parsed if isinstance(parsed, list) else [parsed]
            if ext in ("jsonl", "ndjson"):
                return _iter_jsonl_file(p)
            with open(p, "r") as f:
                head = f.read(8192)
            if _sniff_format(head) == "jsonl":
                return _iter_jsonl_file(p)
            return _iter_json_array_file(p)
        text = data.decode() if isinstance(data, bytes) else data
        if _sniff_format(text) == "jsonl":
            return _iter_jsonl_lines(text.splitlines(), "<string>")
        parsed = _loads(text)
        return parsed if isinstance(parsed, list) else [parsed]
    if hasattr(data, "__iter__"):
        return data
    raise TypeError(f"unsupported input type: {type(data).__name__}")


# ------------------------------------------------------------------ api


def flatten(
    data: Any,
    name: str = "record",
    config: FlattenConfig | None = None,
    progress_callback=None,
) -> FlattenResult:
    """In-memory flatten (reference api.py:182-281 semantics);
    ``progress_callback(processed, total_or_None)`` fires per config
    batch_size records."""
    from itertools import islice

    cfg = config or FlattenConfig()
    flattener = Flattener(cfg, name)
    ts = run_timestamp() if cfg.time_field else None
    records = iter_records(data)
    if progress_callback is None:
        rows, children = flattener.flatten_batch(records, extract_time=ts)
        return FlattenResult(entity=flattener.entity, main=rows, tables=children)

    # batch FROM the iterator — never list() it (a callback must not defeat
    # the streaming input path; reference buffers per batch and reports
    # total=None for unsized inputs, api.py:238-273)
    total = len(records) if isinstance(records, (list, tuple)) else None
    result = FlattenResult(entity=flattener.entity)
    processed = 0
    it = iter(records)
    while True:
        chunk = list(islice(it, cfg.batch_size))
        if not chunk:
            break
        rows, children = flattener.flatten_batch(chunk, extract_time=ts)
        result.main.extend(rows)
        for tname, trows in children.items():
            result.tables.setdefault(tname, []).extend(trows)
        processed += len(chunk)
        progress_callback(processed, total)
    return result


class StreamingCsvWriter:
    """Reference-style streaming CSV sink (writers/csv.py:239-461 shape):
    ONE file per table, header frozen from the table's first batch, later
    schema drift handled per policy — ``"drop"`` silently drops unseen
    fields, ``"strict"`` raises."""

    def __init__(self, out_dir, drift: str = "drop"):
        if drift not in ("drop", "strict"):
            raise ValueError("drift must be 'drop' or 'strict'")
        # out_dir: directory Path, or an open TEXT file-like object —
        # single-table mode (the reference's streaming writers accept
        # file objects); the caller owns (and closes) a provided handle
        self.out_dir = out_dir
        self._sink = out_dir if _is_file_like(out_dir) else None
        self.drift = drift
        self._writers: dict[str, _csv.DictWriter] = {}
        self._handles: dict[str, object] = {}
        self._fields: dict[str, list[str]] = {}

    def write(self, table: str, rows: list[dict]):
        if self._sink is not None:
            if table not in self._writers and self._writers:
                raise ValueError(
                    "a file-like streaming CSV destination holds ONE "
                    f"table; already writing {sorted(self._writers)}, got "
                    f"{table!r}"
                )
            path = self._sink
        else:
            path = self.out_dir / f"{table}.csv"
        if table not in self._writers:
            fields = sorted({k for r in rows for k in r})
            f = path if self._sink is not None else open(path, "w", newline="")
            w = _csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            w.writeheader()
            self._writers[table] = w
            if self._sink is None:
                self._handles[table] = f
            self._fields[table] = fields
        elif self.drift == "strict":
            unseen = {k for r in rows for k in r} - set(self._fields[table])
            if unseen:
                raise ValueError(
                    f"schema drift in table {table!r}: new fields {sorted(unseen)}"
                )
        w = self._writers[table]
        for r in rows:
            w.writerow({k: _sanitize_csv_cell(r.get(k)) for k in self._fields[table]})
        return path

    def close(self) -> None:
        for f in self._handles.values():
            f.close()
        self._handles.clear()
        self._writers.clear()


class StreamingArrowPartWriter:
    """Streaming Arrow-family sink: one part file per flush per table,
    with each table's schema FROZEN from its first batch — later flushes
    are conformed to it (missing fields → null, numeric promotions cast,
    unseen fields dropped under ``drift="conform"`` or rejected under
    ``drift="strict"``), so every part file of a table carries ONE
    schema even when the record stream drifts (the reference freezes on
    first batch too, arrow_base.py:364-369)."""

    def __init__(
        self,
        out_dir: Path,
        fmt: str = "parquet",
        drift: str = "conform",
        compression: str = "snappy",
        row_group_size: int = 10_000,
    ):
        if drift not in ("conform", "strict"):
            raise ValueError("drift must be 'conform' or 'strict'")
        self.out_dir = out_dir
        self.fmt = fmt
        self.drift = drift
        # reference streaming-writer defaults (writers/parquet.py:45-66)
        self.compression = compression
        self.row_group_size = row_group_size
        self._schemas: dict[str, object] = {}
        self._parts: dict[str, int] = {}

    def _conform_rows(self, table: str, rows: list[dict]):
        from .stages.flatten import _conform, rows_to_table

        if table not in self._schemas:
            t = rows_to_table(rows)
            self._schemas[table] = t.schema
            return t
        schema = self._schemas[table]
        if self.drift == "strict":
            unseen = {k for r in rows for k in r} - set(schema.names)
            if unseen:
                raise ValueError(
                    f"schema drift in table {table!r}: new fields {sorted(unseen)}"
                )
        return _conform(rows, schema)

    def _emit(self, table, arrow_table, path):
        import pyarrow.parquet as pq

        pq.write_table(
            arrow_table, path,
            compression=self.compression, row_group_size=self.row_group_size,
        )

    def write(self, table: str, rows: list[dict]) -> Path:
        t = self._conform_rows(table, rows)
        tdir = self.out_dir / table
        tdir.mkdir(exist_ok=True)
        part = self._parts.get(table, 0)
        self._parts[table] = part + 1
        path = tdir / f"part-{part:05d}.{self.fmt}"
        self._emit(table, t, path)
        return path

    def close(self) -> None:
        pass


class StreamingOrcWriter(StreamingArrowPartWriter):
    """Streaming ORC: ONE file per table (``pyarrow.orc.ORCWriter``
    appends a stripe per flush — reference orc.py:43-79 shape), frozen
    first-batch schema like the parquet part writer."""

    def __init__(self, out_dir: Path, drift: str = "conform",
                 compression: str | None = None):
        super().__init__(out_dir, "orc", drift)
        self._orc_compression = compression
        self._writers: dict[str, object] = {}

    def write(self, table: str, rows: list[dict]) -> Path:
        from pyarrow import orc

        t = self._conform_rows(table, rows)
        path = self.out_dir / f"{table}.orc"
        if table not in self._writers:
            kw = {}
            if self._orc_compression is not None:
                kw["compression"] = self._orc_compression
            self._writers[table] = orc.ORCWriter(str(path), **kw)
        self._writers[table].write(t)
        return path

    def close(self) -> None:
        for w in self._writers.values():
            w.close()
        self._writers.clear()


class StreamingIpcWriter(StreamingArrowPartWriter):
    """Streaming Arrow IPC: ONE ``.ipc`` file per table — the IPC file
    format appends a record batch per flush inside one open writer
    (the ORCWriter shape), with the frozen first-batch schema every
    flush conforms to. Readers get a seekable, memory-mappable file."""

    def __init__(self, out_dir: Path, drift: str = "conform"):
        super().__init__(out_dir, "ipc", drift)
        self._writers: dict[str, object] = {}
        self._files: dict[str, object] = {}

    def write(self, table: str, rows: list[dict]) -> Path:
        import pyarrow as pa

        t = self._conform_rows(table, rows)
        path = self.out_dir / f"{table}.ipc"
        if table not in self._writers:
            f = pa.OSFile(str(path), "wb")
            self._files[table] = f
            self._writers[table] = pa.ipc.new_file(f, t.schema)
        self._writers[table].write_table(t)
        return path

    def close(self) -> None:
        for w in self._writers.values():
            w.close()
        for f in self._files.values():
            f.close()
        self._writers.clear()
        self._files.clear()


class StreamingJsonPartWriter:
    """Streaming JSON sink: one part file per flush per table (schema-free)."""

    def __init__(self, out_dir: Path):
        self.out_dir = out_dir
        self._parts: dict[str, int] = {}

    def write(self, table: str, rows: list[dict]) -> Path:
        tdir = self.out_dir / table
        tdir.mkdir(exist_ok=True)
        part = self._parts.get(table, 0)
        self._parts[table] = part + 1
        path = tdir / f"part-{part:05d}.json"
        _write_json_batch(rows, path)
        return path

    def close(self) -> None:
        pass


class StreamingAvroWriter:  # pragma: no cover — fastavro absent in this env
    """Streaming Avro: one file per table, union schema inferred from the
    FIRST batch, later drift always raises and records are appended by
    reopening ``a+b`` (reference avro.py:357-648 semantics). Gated on the
    optional fastavro dependency."""

    def __init__(self, out_dir: Path):
        try:
            import fastavro  # noqa: F401
        except ImportError as exc:
            raise MissingDependencyError(
                "avro output requires the optional 'fastavro' package"
            ) from exc
        self.out_dir = out_dir
        self._schemas: dict[str, object] = {}
        self._raw_schemas: dict[str, dict] = {}
        self._fields: dict[str, set] = {}

    def write(self, table: str, rows: list[dict]) -> Path:
        import fastavro

        path = self.out_dir / f"{table}.avro"
        if table not in self._schemas:
            schema = avro_schema_for(rows)
            self._schemas[table] = fastavro.parse_schema(schema)
            self._raw_schemas[table] = schema
            self._fields[table] = {f["name"] for f in schema["fields"]}
            with open(path, "wb") as f:
                fastavro.writer(f, self._schemas[table],
                                coerce_rows_to_avro(rows, schema))
            return path
        unseen = {k for r in rows for k in r} - self._fields[table]
        if unseen:
            raise ValueError(
                f"schema drift in table {table!r}: new fields {sorted(unseen)}"
            )
        with open(path, "a+b") as f:
            fastavro.writer(f, self._schemas[table],
                            coerce_rows_to_avro(rows, self._raw_schemas[table]))
        return path

    def close(self) -> None:
        pass


def _known_opts(fmt: str, o: dict, allowed: tuple) -> dict:
    """A writer option the format cannot honor is an ERROR, not a silent
    drop — the exact silent-revert the parquet options were added to
    prevent."""
    unknown = set(o) - set(allowed)
    if unknown:
        raise ValueError(
            f"{fmt} streaming writer does not support options "
            f"{sorted(unknown)} (supported: {sorted(allowed)})"
        )
    return o


#: format name → streaming writer factory(out_dir, **opts); extension
#: point shared with :func:`register_writer`
STREAMING_WRITERS = {
    "parquet": lambda out_dir, **o: StreamingArrowPartWriter(
        out_dir, "parquet",
        _known_opts("parquet", o, ("drift", "compression", "row_group_size"))
        .get("drift", "conform"),
        compression=o.get("compression", "snappy"),
        row_group_size=o.get("row_group_size", 10_000)),
    "orc": lambda out_dir, **o: StreamingOrcWriter(
        out_dir,
        _known_opts("orc", o, ("drift", "compression")).get("drift", "conform"),
        compression=o.get("compression")),
    # "drift" is pipeline-level plumbing flatten_stream always passes;
    # schema-free sinks accept and ignore it
    "json": lambda out_dir, **o: (
        _known_opts("json", o, ("drift",)), StreamingJsonPartWriter(out_dir)
    )[1],
    "csv": lambda out_dir, **o: StreamingCsvWriter(
        out_dir, _known_opts("csv", o, ("drift",)).get("drift", "drop")),
    "avro": lambda out_dir, **o: (
        _known_opts("avro", o, ("drift",)), StreamingAvroWriter(out_dir)
    )[1],
    "ipc": lambda out_dir, **o: StreamingIpcWriter(
        out_dir, _known_opts("ipc", o, ("drift",)).get("drift", "conform")),
}


def create_streaming_writer(fmt: str, out_dir: Path, **opts):
    factory = STREAMING_WRITERS.get(fmt)
    if factory is None:
        raise ValueError(f"unsupported output format: {fmt!r}")
    return factory(out_dir, **opts)


def flatten_stream(
    data: Any,
    output_path: str | Path,
    name: str = "record",
    output_format: str = "parquet",
    config: FlattenConfig | None = None,
    batch_size: int = 4096,
    progress_callback=None,
    csv_drift: str = "drop",
    drift: str | None = None,
    **writer_options,
) -> list[Path]:
    """File/iterator → files without holding tables in memory.

    Input streams record by record (JSONL lines / JSON-array elements
    decoded incrementally); output goes through a streaming writer from
    the registry — parquet/json part files per flush, single-file ORC and
    CSV — with each table's schema frozen from its first batch.
    ``progress_callback(processed, total_or_None)`` fires per flush
    (reference ProgressCallback shape, types.py:9). ``**writer_options``
    reach the streaming writer factory (parquet: ``compression``,
    ``row_group_size`` — reference defaults snappy/10000).
    """
    cfg = config or FlattenConfig()
    flattener = Flattener(cfg, name)
    ts = run_timestamp() if cfg.time_field else None
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    records = iter_records(data)
    total = len(records) if isinstance(records, list) else None
    writer = create_streaming_writer(
        output_format, out_dir,
        drift=(drift or (csv_drift if output_format == "csv" else "conform")),
        **writer_options,
    )

    processed = 0
    batch: list[dict] = []

    def flush(batch_rows):
        nonlocal processed
        rows, children = flattener.flatten_batch(batch_rows, extract_time=ts)
        for tname, trows in {flattener.entity: rows, **children}.items():
            if trows:
                writer.write(tname, trows)
        processed += len(batch_rows)
        if progress_callback is not None:
            progress_callback(processed, total)

    try:
        for rec in records:
            batch.append(rec)
            if len(batch) >= batch_size:
                flush(batch)
                batch = []
        if batch:
            flush(batch)
    finally:
        writer.close()
    return sorted(out_dir.rglob(f"*.{output_format}"))


__all__ = [
    "flatten",
    "flatten_stream",
    "FlattenResult",
    "FlattenConfig",
    "MissingDependencyError",
    "ValidationError",
    "StreamingCsvWriter",
    "StreamingArrowPartWriter",
    "StreamingOrcWriter",
    "StreamingAvroWriter",
    "StreamingIpcWriter",
    "register_writer",
    "create_streaming_writer",
    "iter_records",
]
