"""Distributed sources: file-sharded readers plus a format dispatcher.

``read_auto`` is the distributed twin of the reference's format sniffer
(iterators.py:403): it dispatches each path on its suffix to the right
file-sharded reader and unions the results, so a mixed-format landing
zone (yesterday's CSV backfill next to today's gzip-JSONL stream next
to Parquet compactions) reads as ONE Dataset.
"""

from __future__ import annotations

from collections.abc import Sequence

_SUFFIXES = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".jsonl": "jsonl",
    ".jsonl.gz": "jsonl_gz",
    ".ipc": "ipc",
    ".feather": "ipc",
    ".arrow": "ipc",
    ".xml": "xml",
}


def detect_format(path: str) -> str:
    """Suffix-based format detection (longest suffix wins)."""
    p = str(path).lower()
    for suf in sorted(_SUFFIXES, key=len, reverse=True):
        if p.endswith(suf):
            return _SUFFIXES[suf]
    raise ValueError(f"cannot detect source format of {path!r}")


def read_auto(paths: Sequence[str],
              columns: Sequence[str] | None = None,
              record_tag: str | None = None):
    """Read a mixed-format path list as ONE Ray Dataset.

    Paths group by detected format; each group reads through its own
    distributed reader (one task per file — none of these formats is
    splittable mid-file except Parquet, which Ray splits natively) and
    the per-format Datasets union. ``columns`` projects every branch to
    a common schema before the union — pass it whenever formats carry
    different extra columns, or the union schemas will not line up.
    ``record_tag`` is required when any path is XML.
    """
    import ray.data as rd

    groups: dict[str, list[str]] = {}
    for p in paths:
        groups.setdefault(detect_format(p), []).append(str(p))
    if not groups:
        raise ValueError("read_auto needs at least one path")

    parts = []
    for fmt, ps in groups.items():
        if fmt == "parquet":
            ds = rd.read_parquet(ps, columns=list(columns) if columns
                                 else None)
        elif fmt == "csv":
            from .csv_src import read_csv_files
            ds = read_csv_files(ps, columns=columns)
        elif fmt in ("jsonl", "jsonl_gz"):
            from .jsonl_gz import read_jsonl_gz
            ds = read_jsonl_gz(ps)
        elif fmt == "ipc":
            from .ipc import read_ipc
            ds = read_ipc(ps, columns=columns)
        else:  # xml
            from .xml_src import read_xml
            if record_tag is None:
                raise ValueError("record_tag is required for XML paths")
            ds = read_xml(ps, record_tag=record_tag)
        if columns is not None and fmt in ("jsonl", "jsonl_gz", "xml"):
            cols = list(columns)
            ds = ds.map_batches(lambda df, cols=cols: df[cols],
                                batch_format="pandas")
        parts.append(ds)

    out = parts[0]
    for ds in parts[1:]:
        out = out.union(ds)
    return out


__all__ = ["read_auto", "detect_format"]
