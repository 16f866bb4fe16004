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

    def save(self, path: str | Path, output_format: str | None = None) -> list[Path]:
        """Multi-table → directory of one file per table; single table →
        one file. Format from extension when not given (parquet default)."""
        path = Path(path)
        fmt = output_format or (path.suffix.lstrip(".") or "parquet")
        if self.tables:
            path.mkdir(parents=True, exist_ok=True)
            out = []
            for name, rows in self.all_tables.items():
                out.append(_write_table(rows, path / f"{name}.{fmt}", fmt))
            return out
        if not path.suffix:
            path = path.with_suffix(f".{fmt}")
        path.parent.mkdir(parents=True, exist_ok=True)
        return [_write_table(self.main, path, fmt)]


def _sanitize_csv_cell(v):
    """Formula-injection guard (reference writers/csv.py:24-57): prefix a
    quote when a cell starts with a spreadsheet-executable character."""
    if isinstance(v, str) and v[:1] in ("=", "+", "-", "@", "|", "\t", "\r"):
        return "'" + v
    return v


def _write_table(rows: list[dict], path: Path, fmt: str) -> Path:
    from .stages.flatten import rows_to_table

    if fmt == "parquet":
        import pyarrow.parquet as pq

        pq.write_table(rows_to_table(rows), path)
    elif fmt == "csv":
        keys = sorted({k for r in rows for k in r})
        with open(path, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            for r in rows:
                w.writerow({k: _sanitize_csv_cell(r.get(k)) for k in keys})
    elif fmt == "json":
        with open(path, "w") as f:
            json.dump(rows, f, ensure_ascii=False, default=str)
    elif fmt == "orc":
        from pyarrow import orc

        orc.write_table(rows_to_table(rows), str(path))
    elif fmt == "avro":
        try:
            import fastavro  # noqa: F401
        except ImportError as exc:  # optional dependency, not in this env
            raise ImportError(
                "avro output requires the optional 'fastavro' package"
            ) from exc
        _write_avro(rows, path)  # pragma: no cover
    else:
        raise ValueError(f"unsupported output format: {fmt!r}")
    return path


def _write_avro(rows: list[dict], path: Path) -> None:  # pragma: no cover
    """Avro with a union-typed inferred schema (the reference's Avro
    writer shape, avro.py:64-140) — only reachable when fastavro exists."""
    import fastavro

    type_map = {bool: "boolean", int: "long", float: "double", str: "string"}
    fields = {}
    for r in rows:
        for k, v in r.items():
            fields.setdefault(k, set())
            if v is not None:
                fields[k].add(type_map.get(type(v), "string"))
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": k, "type": ["null", *sorted(ts or {"string"})]}
            for k, ts in fields.items()
        ],
    }
    with open(path, "wb") as f:
        fastavro.writer(f, fastavro.parse_schema(schema), rows)


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


def iter_records(data: Any) -> Iterable[dict]:
    """Route any supported input to an iterator of record dicts
    (the reference's dispatcher surface, iterators.py:47-106):
    dict, list, iterator, JSON/JSONL str/bytes, or a path with format
    taken from the extension (.json/.jsonl/.ndjson/.json5/.hjson) or
    sniffed from content."""
    if isinstance(data, dict):
        return [data]
    if isinstance(data, list):
        return data
    if isinstance(data, (str, bytes, Path)):
        if isinstance(data, Path) or (
            isinstance(data, str) and len(data) < 4096 and os.path.exists(data)
        ):
            p = Path(data)
            text = p.read_text()
            ext = p.suffix.lstrip(".")
            if ext in ("json5", "hjson"):
                parsed = _parse_optional(text, ext)
                return parsed if isinstance(parsed, list) else [parsed]
            fmt = {"jsonl": "jsonl", "ndjson": "jsonl"}.get(ext) or _sniff_format(text)
        else:
            text = data.decode() if isinstance(data, bytes) else data
            fmt = _sniff_format(text)
        if fmt == "jsonl":
            return (
                _loads(ln) for ln in text.splitlines() if ln.strip()
            )
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
    cfg = config or FlattenConfig()
    flattener = Flattener(cfg, name)
    ts = run_timestamp() if cfg.time_field else None
    records = iter_records(data)
    if progress_callback is None:
        rows, children = flattener.flatten_batch(records, extract_time=ts)
        return FlattenResult(entity=flattener.entity, main=rows, tables=children)

    records = list(records)
    result = FlattenResult(entity=flattener.entity)
    for start in range(0, len(records), cfg.batch_size):
        chunk = records[start : start + cfg.batch_size]
        rows, children = flattener.flatten_batch(chunk, extract_time=ts)
        result.main.extend(rows)
        for tname, trows in children.items():
            result.tables.setdefault(tname, []).extend(trows)
        progress_callback(min(start + cfg.batch_size, len(records)), len(records))
    return result


class StreamingCsvWriter:
    """Reference-style streaming CSV sink (writers/csv.py:239-461 shape):
    ONE file per table, header frozen from the table's first batch, later
    schema drift handled per policy — ``"drop"`` silently drops unseen
    fields, ``"strict"`` raises."""

    def __init__(self, out_dir: Path, drift: str = "drop"):
        if drift not in ("drop", "strict"):
            raise ValueError("drift must be 'drop' or 'strict'")
        self.out_dir = out_dir
        self.drift = drift
        self._writers: dict[str, _csv.DictWriter] = {}
        self._handles: dict[str, object] = {}
        self._fields: dict[str, list[str]] = {}

    def write(self, table: str, rows: list[dict]) -> Path:
        path = self.out_dir / f"{table}.csv"
        if table not in self._writers:
            fields = sorted({k for r in rows for k in r})
            f = open(path, "w", newline="")
            w = _csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            w.writeheader()
            self._writers[table], self._handles[table] = w, f
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


def flatten_stream(
    data: Any,
    output_path: str | Path,
    name: str = "record",
    output_format: str = "parquet",
    config: FlattenConfig | None = None,
    batch_size: int = 4096,
    progress_callback=None,
    csv_drift: str = "drop",
) -> list[Path]:
    """File/iterator → files without holding tables in memory.

    Parquet/orc/json emit one part file per flush batch per table
    (resumable-friendly layout); CSV streams into one file per table with
    a frozen header and a drift policy (reference streaming-writer
    semantics). ``progress_callback(processed, total_or_None)`` fires per
    flush (reference ProgressCallback shape, types.py:9).
    """
    cfg = config or FlattenConfig()
    flattener = Flattener(cfg, name)
    ts = run_timestamp() if cfg.time_field else None
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    records = iter_records(data)
    total = len(records) if isinstance(records, list) else None
    csv_writer = StreamingCsvWriter(out_dir, csv_drift) if output_format == "csv" else None

    part = 0
    processed = 0
    batch: list[dict] = []

    def flush(batch_rows):
        nonlocal part, processed
        rows, children = flattener.flatten_batch(batch_rows, extract_time=ts)
        for tname, trows in {flattener.entity: rows, **children}.items():
            if not trows:
                continue
            if csv_writer is not None:
                csv_writer.write(tname, trows)
            else:
                tdir = out_dir / tname
                tdir.mkdir(exist_ok=True)
                _write_table(trows, tdir / f"part-{part:05d}.{output_format}",
                             output_format)
        part += 1
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
        if csv_writer is not None:
            csv_writer.close()
    return sorted(out_dir.rglob(f"*.{output_format}"))


__all__ = [
    "flatten",
    "flatten_stream",
    "FlattenResult",
    "FlattenConfig",
    "StreamingCsvWriter",
    "iter_records",
]
