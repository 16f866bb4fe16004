"""Distributed XML source (stream parse, one task per file).

Complements the JSON-family readers (api.py:323 sniffer): legacy feeds
still arrive as XML shards. A well-formed XML document cannot be split
mid-file, so — like gzip JSONL and CSV-with-quoting — the FILE is the
parallelism unit: one Ray task stream-parses one shard with
``xml.etree.ElementTree.iterparse`` (elements are cleared as soon as
they close, so memory stays bounded by one record, not the file) and
emits the record elements' attributes as rows under the union-of-keys
schema (``rows_to_table`` — leading-row inference drops late columns).
"""

from __future__ import annotations

from collections.abc import Sequence


def read_xml(paths: Sequence[str], record_tag: str):
    """Read XML shards as a Ray Dataset, one streaming parse per file.

    Every element named ``record_tag`` becomes one row; its attributes
    become columns (all strings — cast downstream). ``paths`` is an
    explicit file list (glob driver-side; directories not accepted —
    same contract as the other file-sharded sources).
    """
    import ray.data as rd

    from ..stages.flatten import rows_to_table

    items = [{"path": str(p)} for p in paths]
    if not items:
        raise ValueError("read_xml needs at least one path")

    def load(df):
        import xml.etree.ElementTree as ET

        rows: list[dict] = []
        for path in df["path"]:
            for _, elem in ET.iterparse(path, events=("end",)):
                if elem.tag == record_tag:
                    rows.append(dict(elem.attrib))
                elem.clear()  # constant memory: drop parsed subtree
        return rows_to_table(rows)

    return rd.from_items(items).map_batches(load, batch_format="pandas")
