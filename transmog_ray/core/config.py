"""Flatten configuration for the Ray-Data-native engine.

Mirrors the user-facing semantics of the reference's ``TransmogConfig``
(/root/reference/src/transmog/config.py:9-113) without sharing its code:
same knobs, same validation rules, so a reference user can carry their
config over unchanged.  Array modes are plain strings here instead of an
Enum; ``FlattenConfig`` is hashable/frozen so it can ride inside Ray task
closures and actor constructors without copies drifting.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Union

ARRAY_MODES = ("smart", "separate", "inline", "skip")
_SCALAR_STRATEGIES = ("random", "natural", "hash")

IdStrategy = Union[str, tuple]


class ConfigError(ValueError):
    """Invalid engine configuration."""


@dataclass(frozen=True)
class FlattenConfig:
    """All user-tunable flattening semantics.

    Defaults follow the reference (reference config.py:18-60) except
    ``id_generation``: the engine defaults to deterministic ``"hash"``
    rather than ``"random"`` because Ray task retries must be
    idempotent (see SURVEY.md §4.2).  Pass ``id_generation="random"``
    explicitly for reference-default parity (shape-only — uuid4 values
    can never match across processes).
    """

    array_mode: str = "smart"
    include_nulls: bool = False
    stringify_values: bool = False
    max_depth: int = 100
    id_generation: IdStrategy = "hash"
    id_field: str = "_id"
    parent_field: str = "_parent_id"
    time_field: str | None = "_timestamp"
    batch_size: int = 1000

    def __post_init__(self) -> None:
        if self.array_mode not in ARRAY_MODES:
            raise ConfigError(
                f"array_mode must be one of {ARRAY_MODES}, got {self.array_mode!r}"
            )
        if self.batch_size < 1:
            raise ConfigError("batch_size must be >= 1")
        if self.max_depth < 1:
            raise ConfigError("max_depth must be >= 1")
        for flag in ("include_nulls", "stringify_values"):
            if not isinstance(getattr(self, flag), bool):
                raise ConfigError(f"{flag} must be a boolean")

        strategy = self.id_generation
        if isinstance(strategy, (list, tuple)):
            if len(strategy) == 0:
                raise ConfigError("id_generation field list cannot be empty")
            if not all(isinstance(f, str) for f in strategy):
                raise ConfigError("id_generation field list must contain only strings")
            # normalize to tuple so the config stays hashable
            object.__setattr__(self, "id_generation", tuple(strategy))
        elif isinstance(strategy, str):
            if strategy not in _SCALAR_STRATEGIES:
                raise ConfigError(
                    f"id_generation must be one of {_SCALAR_STRATEGIES} or a "
                    f"list of field names, got {strategy!r}"
                )
        else:
            raise ConfigError(
                f"id_generation must be a string or list of strings, "
                f"got {type(strategy).__name__}"
            )

        meta_fields = [f for f in (self.id_field, self.parent_field, self.time_field) if f]
        if len(meta_fields) != len(set(meta_fields)):
            raise ConfigError(
                "metadata field names must be unique: "
                f"id={self.id_field} parent={self.parent_field} time={self.time_field}"
            )

    @property
    def collects_arrays(self) -> bool:
        """Whether this mode extracts child tables (reference flattening.py:492-499)."""
        return self.array_mode in ("smart", "separate")

    def with_(self, **kwargs) -> "FlattenConfig":
        return replace(self, **kwargs)


__all__ = ["FlattenConfig", "ConfigError", "ARRAY_MODES"]
