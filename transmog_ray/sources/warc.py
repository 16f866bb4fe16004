"""Minimal WARC/1.0 source — the Common-Crawl wire format.

A WARC file is a sequence of records: a version line, CRLF-terminated
``Name: value`` headers, a blank line, exactly ``Content-Length`` bytes
of payload, then a blank-line separator. Gzip members (``.warc.gz``)
are supported via gzip's multi-member streaming decode. Like the
gzip-JSONL source, the FILE is the parallelism unit (records are
variable-length and the stream is not splittable without an index):
one Ray task parses one shard and emits Arrow rows.

Only the fields a pipeline keys on are surfaced (record type, target
URI, date, payload bytes + length); unknown headers pass through in a
``headers`` JSON column so nothing is lost. Malformed records raise a
:class:`~transmog_ray.api.ValidationError` naming file and record
index (``on_error="raise"``) or are skipped (``"skip"``).
"""

from __future__ import annotations

import gzip
import io
import json
from collections.abc import Sequence

import pandas as pd


def _open_stream(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def parse_warc_stream(f: io.BufferedIOBase, source: str = "<stream>",
                      on_error: str = "raise"):
    """Yield dict records from a binary WARC stream."""
    from ..api import ValidationError

    idx = 0
    while True:
        line = f.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue  # inter-record separators
        idx += 1
        if not line.startswith(b"WARC/"):
            if on_error == "raise":
                raise ValidationError(
                    f"{source}: record {idx}: expected WARC/ version "
                    f"line, got {line[:40]!r}")
            # resync: skip to the next blank line
            while line and line not in (b"\r\n", b"\n"):
                line = f.readline()
            continue
        headers: dict[str, str] = {}
        while True:
            h = f.readline()
            if not h:
                if on_error == "raise":
                    raise ValidationError(
                        f"{source}: record {idx}: EOF inside headers")
                return
            if h in (b"\r\n", b"\n"):
                break
            if b":" not in h:
                if on_error == "raise":
                    raise ValidationError(
                        f"{source}: record {idx}: malformed header "
                        f"{h[:40]!r}")
                continue
            k, v = h.split(b":", 1)
            headers[k.decode("utf-8").strip()] = (
                v.decode("utf-8").strip())
        try:
            n = int(headers["Content-Length"])
        except (KeyError, ValueError):
            if on_error == "raise":
                raise ValidationError(
                    f"{source}: record {idx}: missing/invalid "
                    f"Content-Length") from None
            continue
        payload = f.read(n)
        if len(payload) != n:
            if on_error == "raise":
                raise ValidationError(
                    f"{source}: record {idx}: truncated payload "
                    f"({len(payload)}/{n} bytes)")
            return
        yield {
            "warc_type": headers.get("WARC-Type"),
            "url": headers.get("WARC-Target-URI"),
            "warc_date": headers.get("WARC-Date"),
            "length": n,
            "payload": payload,
            "headers": json.dumps(
                {k: v for k, v in headers.items()
                 if k not in ("WARC-Type", "WARC-Target-URI",
                              "WARC-Date", "Content-Length")},
                sort_keys=True),
        }


def read_warc(paths: Sequence[str], on_error: str = "raise"):
    """Read WARC shards as a Ray Dataset, one parse task per file."""
    import ray.data as rd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    items = [{"path": str(p)} for p in paths]
    if not items:
        raise ValueError("read_warc needs at least one path")

    def load(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path in df["path"]:
            with _open_stream(path) as f:
                rows.extend(parse_warc_stream(f, source=path,
                                              on_error=on_error))
        return pd.DataFrame(
            rows, columns=["warc_type", "url", "warc_date", "length",
                           "payload", "headers"])

    return rd.from_items(items).map_batches(load, batch_format="pandas")


def write_warc(records, path: str) -> None:
    """Write records (dicts with url, warc_date, payload bytes) as a
    WARC/1.0 response file — the fixture/export twin of :func:`read_warc`."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wb") as f:
        for r in records:
            payload = r["payload"]
            head = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {r['url']}\r\n".encode()
                + f"WARC-Date: {r['warc_date']}\r\n".encode()
                + f"Content-Length: {len(payload)}\r\n".encode()
                + b"\r\n")
            f.write(head)
            f.write(payload)
            f.write(b"\r\n\r\n")
