"""Pure-Python nested-record flattening — the engine's conformance anchor.

From-scratch implementation of the flattening semantics frozen in
SURVEY.md §2.2 (behavior pinned against /root/reference/src/transmog/
flattening.py by the parity suite in tests/test_flatten_parity.py).
No Ray here: this module is the per-record kernel that the Ray stages in
``transmog_ray.stages`` apply per Arrow batch.

Semantics contract (code-verified facts, reference file:line cited):

* DFS over dict keys; nested paths joined with ``"_"`` (flattening.py:326).
* Depth >= max_depth prunes silently (flattening.py:311).
* Empty dict / empty list values vanish entirely (flattening.py:318).
* Null-likes (None, "", NaN, ±Inf) are dropped, or emitted as None under
  ``include_nulls`` (flattening.py:25-41,394-409).
* Array modes: skip=drop; inline=json.dumps (no sort_keys); smart=keep
  simple arrays as native lists, extract complex ones; separate=always
  extract (flattening.py:344-392).
* Child table name = ``entity[_parentpath]_key`` where entity and key are
  sanitized but the parent path keeps raw key text; the path RESETS inside
  each dict array item, so grandchild tables are named ``entity_childkey``
  not ``entity_parent_childkey`` (flattening.py:226-230,267-270 — the
  reference docs claim otherwise; code wins).
* EVERY descendant row's parent id is the root record's id, not the
  enclosing array item's (flattening.py:236).
* The main row's id hashes the RAW nested record; an array item's id
  hashes its FLATTENED dict before metadata (flattening.py:506-514,259).
* Mixed arrays put primitive items into the same child table as dict items
  as ``{"value": item}`` rows (flattening.py:247-249).
* Metadata columns are appended in order id, parent, time
  (flattening.py:139-179).
"""

from __future__ import annotations

import json
import math
import uuid
from typing import Any, Mapping

from .config import FlattenConfig
from .hashing import hash_value, hash_fields, make_id

ChildTables = dict[str, list[dict]]


def is_null_like(value: Any) -> bool:
    """None, empty string, NaN and ±Inf all count as null (flattening.py:25-41)."""
    if value is None or value == "":
        return True
    return isinstance(value, float) and not math.isfinite(value)


def sanitize_name(name: str) -> str:
    """SQL-safe identifier: collapse non-alnum runs to ``_`` (flattening.py:419-446).

    Applied to entity and array-key components of TABLE names only; column
    names keep raw key text.
    """
    out: list[str] = []
    prev_us = False
    for ch in name.replace(" ", "_").replace("-", "_"):
        if ch.isalnum() or ch == "_":
            out.append(ch)
            prev_us = ch == "_"
        elif not prev_us:
            out.append("_")
            prev_us = True
    cleaned = "".join(out).strip("_")
    if cleaned and cleaned[0].isdigit():
        cleaned = "col_" + cleaned
    return cleaned or "unnamed_field"


def child_table_name(entity: str, array_key: str, parent_path: str) -> str:
    """``entity_key`` at the top, ``entity_path_key`` when nested under dicts
    (flattening.py:449-462)."""
    if parent_path:
        return f"{entity}_{parent_path}_{array_key}"
    return f"{entity}_{array_key}"


class Flattener:
    """Compiled per-entity flatten kernel.

    Construct once (per Ray actor / per run), call
    :meth:`flatten_record` / :meth:`flatten_batch` many times.
    ``extract_time`` is a run-level constant supplied by the caller so
    output is deterministic and retry-idempotent; it is never read from
    the wall clock inside the kernel.
    """

    def __init__(
        self,
        config: FlattenConfig | None = None,
        entity: str = "record",
        child_metadata: bool = True,
    ):
        self.cfg = config or FlattenConfig()
        self.entity = sanitize_name(entity) if entity else ""
        #: set False when child rows are consumed only by per-record
        #: aggregation (never emitted) — skips per-child-row id hashing,
        #: which otherwise dominates kernel CPU (~40%).
        self.child_metadata = child_metadata
        self._table_names: dict[tuple, str] = {}

    # ------------------------------------------------------------------ api

    def flatten_batch(
        self, records, extract_time: str | None = None
    ) -> tuple[list[dict], ChildTables]:
        """Flatten a sequence of nested records into (main_rows, child_tables)."""
        rows: list[dict] = []
        children: ChildTables = {}
        for record in records:
            row, kids = self.flatten_record(record, extract_time)
            if row:
                rows.append(row)
            for tname, krows in kids.items():
                children.setdefault(tname, []).extend(krows)
        return rows, children

    def flatten_record(
        self, record: Mapping[str, Any], extract_time: str | None = None
    ) -> tuple[dict | None, ChildTables]:
        """Flatten one nested record. Empty records yield ``(None, {})``."""
        if not isinstance(record, Mapping):
            raise TypeError(f"expected a mapping record, got {type(record).__name__}")
        if not record:
            return None, {}

        cfg = self.cfg
        # Root id covers the RAW nested record, before any flattening.
        root_id = make_id(record, cfg.id_generation, cfg.id_field)

        sink: ChildTables = {}
        row = self._walk(record, 0, (), root_id, sink, extract_time)
        self._annotate(row, parent_id=None, extract_time=extract_time, preset_id=root_id)
        return row, sink

    def flatten_tables(
        self, records, extract_time: str | None = None
    ) -> dict[str, list[dict]]:
        """All tables keyed by name, main table under the entity name —
        the shape of the reference's ``FlattenResult.all_tables``."""
        rows, children = self.flatten_batch(records, extract_time)
        return {self.entity or "main": rows, **children}

    # ---------------------------------------------------------------- walk

    def _walk(
        self,
        node: Mapping[str, Any],
        depth: int,
        path: tuple,
        root_id: str,
        sink: ChildTables,
        extract_time: str | None,
    ) -> dict:
        cfg = self.cfg
        out: dict = {}
        if depth >= cfg.max_depth:
            return out

        for key, value in node.items():
            if isinstance(value, dict):
                if not value:
                    continue
                out.update(
                    self._walk(value, depth + 1, path + (key,), root_id, sink, extract_time)
                )
                continue

            if isinstance(value, list):
                if not value:
                    continue
                mode = cfg.array_mode
                if mode == "skip":
                    continue
                column = "_".join(path + (key,))
                if mode == "inline":
                    out[column] = json.dumps(value, ensure_ascii=False)
                    continue
                simple, staged = self._explode(
                    value, key, depth, path, root_id, extract_time
                )
                if mode == "smart" and simple:
                    out[column] = self._inline_simple(value)
                else:  # separate, or smart with dict items
                    for tname, trows in staged.items():
                        sink.setdefault(tname, []).extend(trows)
                continue

            # scalar leaf
            if not is_null_like(value):
                if cfg.stringify_values and not isinstance(value, str):
                    value = str(value)
                out["_".join(path + (key,))] = value
            elif cfg.include_nulls:
                out["_".join(path + (key,))] = None

        return out

    def _inline_simple(self, array: list) -> list:
        """SMART keeps simple arrays native; stringify converts non-string,
        non-null items in place (flattening.py:360-370)."""
        if not self.cfg.stringify_values:
            return array
        return [
            v if isinstance(v, str) or is_null_like(v) else str(v)
            for v in array
        ]

    def _explode(
        self,
        array: list,
        key: str,
        depth: int,
        path: tuple,
        root_id: str,
        extract_time: str | None,
    ) -> tuple[bool, ChildTables]:
        """Single pass over an array: decide simplicity AND build child rows.

        Child rows of a dict item are appended after the item's own row;
        the item's recursive walk restarts the column path at () and keeps
        ``root_id`` as every descendant's parent (flattening.py:226-276).
        """
        cfg = self.cfg
        staged: ChildTables = {}
        simple = True
        tname = self._table_names.get((key, path))
        if tname is None:
            tname = child_table_name(self.entity, sanitize_name(key), "_".join(path))
            self._table_names[(key, path)] = tname

        for item in array:
            if is_null_like(item) and not cfg.include_nulls:
                continue
            nested: ChildTables = {}
            if isinstance(item, dict):
                simple = False
                if not item:
                    continue
                row = self._walk(item, depth + 1, (), root_id, nested, extract_time)
            elif cfg.stringify_values and not isinstance(item, str) and not is_null_like(item):
                row = {"value": str(item)}
            else:
                row = {"value": item}

            if self.child_metadata:
                if cfg.id_generation == "natural" and cfg.id_field not in row:
                    # the reference's non-deterministic fallback
                    # (flattening.py:254-258); avoided by using
                    # hash/composite strategies in pipelines.
                    row[cfg.id_field] = str(uuid.uuid4())
                self._annotate(row, parent_id=root_id, extract_time=extract_time)
            staged.setdefault(tname, []).append(row)
            for sub_name, sub_rows in nested.items():
                staged.setdefault(sub_name, []).extend(sub_rows)

        return simple, staged

    def _annotate(
        self,
        row: dict,
        parent_id: str | None,
        extract_time: str | None,
        preset_id: str | None = None,
    ) -> None:
        """Append metadata columns: id, then parent, then time.

        Child-row ids hash the flattened row as it stands here (data
        fields only — id/parent/time not yet present).
        """
        cfg = self.cfg
        row[cfg.id_field] = (
            preset_id if preset_id is not None
            else make_id(row, cfg.id_generation, cfg.id_field)
        )
        if parent_id is not None:
            row[cfg.parent_field] = parent_id
        if cfg.time_field:
            row[cfg.time_field] = extract_time


def run_timestamp() -> str:
    """UTC run timestamp in the reference's format (flattening.py:130-136).

    Captured ONCE per run on the driver and passed into every task —
    never called inside a Ray task.
    """
    from datetime import datetime, timezone

    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")


__all__ = [
    "Flattener",
    "ChildTables",
    "is_null_like",
    "sanitize_name",
    "child_table_name",
    "run_timestamp",
    "hash_value",
    "hash_fields",
]
