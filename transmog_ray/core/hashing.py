"""Deterministic ID generation.

Replicates the reference's hashing recipe exactly (reference
flattening.py:49-127) so that IDs — and therefore parent/child join keys —
are bit-identical between this engine and the reference:

    canonical(v) = json.dumps(v, sort_keys=True, ensure_ascii=False)   (dict/list)
                   str(v)                                              (otherwise)
    id(v)        = uuid5(NAMESPACE, canonical(v).strip().lower())

The ``.lower()`` makes hashing case-insensitive by design (pinned by the
reference's tests).  Composite-field hashing builds ``{field: value}`` with
missing fields as ``None``; ``sort_keys`` then makes it field-order
independent.
"""

from __future__ import annotations

import json
import uuid
from typing import Any, Iterable, Mapping

# Same namespace constant as the reference (flattening.py:22) — a published
# value, required for bit-identical IDs.
NAMESPACE = uuid.UUID("a9b8c7d6-e5f4-1234-abcd-0123456789ab")


class IdError(ValueError):
    """Record cannot satisfy the configured ID strategy."""


def canonical_repr(value: Any) -> str:
    if isinstance(value, (dict, list)):
        return json.dumps(value, sort_keys=True, ensure_ascii=False)
    return str(value)


_NAMESPACE_BYTES = NAMESPACE.bytes


def _uuid5_hex(name: str) -> str:
    """Exactly ``str(uuid.uuid5(NAMESPACE, name))`` without constructing a
    UUID object — the hashing hot path runs once per row AND per child row,
    so the ~2x speedup matters (equality pinned by tests)."""
    import hashlib

    d = bytearray(hashlib.sha1(_NAMESPACE_BYTES + name.encode("utf-8")).digest()[:16])
    d[6] = (d[6] & 0x0F) | 0x50
    d[8] = (d[8] & 0x3F) | 0x80
    x = d.hex()
    return f"{x[:8]}-{x[8:12]}-{x[12:16]}-{x[16:20]}-{x[20:]}"


def hash_value(value: Any) -> str:
    """uuid5 of the normalized canonical form of *value*."""
    return _uuid5_hex(canonical_repr(value).strip().lower())


def hash_fields(record: Mapping[str, Any], fields: Iterable[str]) -> str:
    """Composite ID over named fields; absent fields count as null."""
    return hash_value({f: record.get(f, None) for f in fields})


def make_id(record: Mapping[str, Any], strategy, id_field: str) -> str:
    """Resolve a record's ID under *strategy*.

    Unlike the reference (which returns ``None`` for the natural strategy
    and re-reads the field at the call site), this returns the final ID
    string in every case.
    """
    if isinstance(strategy, (list, tuple)):
        return hash_fields(record, strategy)
    if strategy == "hash":
        return hash_value(record)
    if strategy == "random":
        return str(uuid.uuid4())
    if strategy == "natural":
        if id_field not in record:
            raise IdError(
                f"id_generation='natural' requires field {id_field!r} in the "
                f"record; available fields: {list(record.keys())}"
            )
        natural = record[id_field]
        if natural is None or natural == "":
            raise IdError(
                f"id_generation='natural' requires a non-empty {id_field!r}, "
                f"got {natural!r}"
            )
        return natural
    raise IdError(f"unknown id_generation strategy: {strategy!r}")


__all__ = ["NAMESPACE", "IdError", "canonical_repr", "hash_value", "hash_fields", "make_id"]
