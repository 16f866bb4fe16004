"""transmog_ray — a Ray-Data-native nested-data flattening and
point-in-time feature-engineering engine.

Public surface:
* :func:`flatten` / :func:`flatten_stream` / :class:`FlattenResult` —
  drop-in equivalents of the reference API (pure Python, no Ray needed
  for in-memory data).
* :mod:`transmog_ray.stages` — Ray Data operators (flatten stage, as-of
  join, windowed ops, dedup, partitioning).
* :mod:`transmog_ray.functions` — relational/text/near-dup/ANN function
  library.
* :mod:`transmog_ray.pipelines` — flagship page-features pipeline and
  the driver-contract query catalog.
"""

from .api import FlattenResult, flatten, flatten_stream
from .core.config import FlattenConfig

__version__ = "0.1.0"

__all__ = ["flatten", "flatten_stream", "FlattenResult", "FlattenConfig"]
