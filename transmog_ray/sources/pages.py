"""Deterministic synthetic Common-Crawl-style page table.

Schema exactly per BASELINE.json ``input_hint``:

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

plus a ``meta`` JSON-string column holding the page's "parsed HTML/metadata
tree" that exercises transmog-style flattening (nested headers dict, simple
``tags`` array, complex ``links``/``scripts`` arrays — see FIXTURES.md §A).

Everything derives from a seeded keyed RNG — per-shard generation is pure in
``(shard, seed)`` so any scale is reproducible and shards can be produced in
parallel Ray tasks with no coordination. Knobs: hot-domain skew (2 domains own
~30% of rows), out-of-order rows, duplicate ``(url, warc_ts)`` rows, warc_ts
ties, ~5% null text/lang, occasional missing meta keys / empty arrays /
NaN-Inf leaf values.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

WORDS = (
    "web page crawl data index link spark ray arrow batch stream merge sort "
    "key value table row column shard block store cache fetch parse render "
    "query join group window session lag lead fill dedup hash salt skew"
).split()

LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # skewed categorical
BASE_TS = np.int64(1_577_836_800_000_000)  # 2020-01-01 in µs
DAY_US = np.int64(86_400_000_000)


def _text_for(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), n_words))


def _meta_for(rng: np.random.Generator, url: str, snap: int) -> str:
    """Nested metadata tree; occasionally drops keys / emits empties / NaN."""
    meta: dict = {}
    if rng.random() > 0.05:
        meta["title"] = _text_for(rng, 4)
    meta["headers"] = {
        "content_type": "text/html",
        "server": rng.choice(["nginx", "apache", "caddy", ""]),
    }
    n_tags = int(rng.integers(0, 4))
    meta["tags"] = [str(rng.choice(WORDS)) for _ in range(n_tags)]  # may be []
    n_links = int(rng.integers(0, 5))
    links = []
    for i in range(n_links):
        # strict JSON cannot carry NaN/Inf; emit null / "" null-likes instead
        # (NaN/Inf leaf handling is covered by the dict-level parity tests)
        depth = float(rng.integers(0, 6))
        if rng.random() < 0.04:
            depth = None
        links.append(
            {
                "href": f"{url}/out/{i}",
                "rel": str(rng.choice(["follow", "nofollow"])),
                "depth": depth,
            }
        )
    meta["links"] = links
    if rng.random() < 0.5:
        meta["scripts"] = [
            {"src": f"{url}/s{i}.js", "attrs": {"async": bool(rng.random() < 0.5)}}
            for i in range(int(rng.integers(1, 3)))
        ]
    return json.dumps(meta, ensure_ascii=False, allow_nan=False)


def generate_pages_shard(
    shard: int,
    n_urls_per_shard: int = 200,
    seed: int = 42,
    hot_fraction: float = 0.3,
    dup_fraction: float = 0.02,
) -> pa.Table:
    """One shard of the page table — pure in (shard, seed).

    Each url gets a Zipf-ish number of snapshots (1..20); ~hot_fraction of
    urls live on 2 hot domains; rows are emitted shuffled (out of order) with
    occasional exact duplicate rows and warc_ts ties.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, shard]))
    rows_url, rows_ts, rows_html, rows_text, rows_lang, rows_meta = [], [], [], [], [], []

    for u in range(n_urls_per_shard):
        uid = shard * n_urls_per_shard + u
        if rng.random() < hot_fraction:
            domain = f"hot{uid % 2}.example.com"
        else:
            domain = f"site{uid}.example.org"
        url = f"https://{domain}/p/{uid}"
        n_snap = min(20, 1 + int(rng.zipf(1.6)))
        # snapshot times: sorted then independently jittered; inject ties
        offsets = np.sort(rng.integers(0, 365 * DAY_US, n_snap))
        tie = n_snap >= 3 and rng.random() < 0.3
        if tie:
            offsets[1] = offsets[0]  # warc_ts tie within a url
        base_text = _text_for(rng, int(rng.integers(20, 80)))
        for s, off in enumerate(offsets):
            ts = BASE_TS + np.int64(off)
            # text evolves across snapshots but is deterministic per
            # (url, ts). Tie-group invariant (keeps the engine/oracle
            # dedup winner well-defined): rows sharing (url, warc_ts)
            # either are byte-identical duplicates or differ in TEXT —
            # so the tie pair (s 0/1) never nulls its text, since two
            # NULL texts with different meta would make ROW_NUMBER()
            # ORDER BY text unspecified in the oracle SQL
            null_text = rng.random() < 0.05 and not (tie and s < 2)
            text = None if null_text else f"{base_text} snap{s}"
            lang = None if rng.random() < 0.05 else str(rng.choice(LANGS))
            html = None
            if text is not None:
                html = f"<html><body><p>{text}</p></body></html>".encode()
            rows_url.append(url)
            rows_ts.append(int(ts))
            rows_html.append(html)
            rows_text.append(text)
            rows_lang.append(lang)
            rows_meta.append(_meta_for(rng, url, s))
            if rng.random() < dup_fraction:  # exact duplicate row
                rows_url.append(url)
                rows_ts.append(int(ts))
                rows_html.append(html)
                rows_text.append(text)
                rows_lang.append(lang)
                rows_meta.append(rows_meta[-1])

    order = rng.permutation(len(rows_url))  # out-of-order on disk
    tbl = pa.table(
        {
            "url": pa.array(rows_url, pa.string()),
            "warc_ts": pa.array(rows_ts, pa.timestamp("us")),
            "html": pa.array(rows_html, pa.binary()),
            "text": pa.array(rows_text, pa.string()),
            "lang": pa.array(rows_lang, pa.string()),
            "meta": pa.array(rows_meta, pa.string()),
        }
    )
    return tbl.take(pa.array(order))


def write_pages(
    out_dir: str,
    n_shards: int = 4,
    n_urls_per_shard: int = 200,
    seed: int = 42,
) -> str:
    """Write the synthetic page table as one parquet file per shard.

    Shards are pure in (shard, seed), so they are generated as parallel
    Ray tasks when a session is live (large fixtures), else sequentially
    with plain pyarrow. Existing shard files are kept (idempotent).
    """
    import os
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    missing = [
        shard for shard in range(n_shards)
        if not os.path.exists(os.path.join(out_dir, f"pages-{shard:05d}.parquet"))
    ]
    if not missing:
        return out_dir

    def write_one(shard: int) -> None:
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(generate_pages_shard(shard, n_urls_per_shard, seed), tmp)
        os.replace(tmp, path)

    try:
        import ray

        live = ray.is_initialized()
    except ImportError:  # pragma: no cover
        live = False
    if live and len(missing) > 1:
        import ray

        task = ray.remote(num_cpus=1)(write_one)
        ray.get([task.remote(s) for s in missing])
    else:
        for shard in missing:
            write_one(shard)
    return out_dir


__all__ = ["generate_pages_shard", "write_pages"]
