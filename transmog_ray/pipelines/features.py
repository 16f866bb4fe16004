"""Flagship pipeline: Common-Crawl-style pages → point-in-time features.

The north-star shape (BASELINE.json), executed with exactly ONE shuffle:

    read_parquet(pages, columns pruned, html never read)
      → FlattenStage (tagged: main + child link rows in one pass; child
        rows carry url/warc_ts via typed child_passthrough — no join back
        through _parent_id is ever needed)
      → hash-bucket the tagged rows by url              [the ONE shuffle]
      → per bucket, one fused sorted pass:
           exact dedup of (url, warc_ts)                 (deterministic winner)
           link aggregates per snapshot → feature rows   (feature_ts = warc_ts)
           sort-merge as-of join (feature_ts <= warc_ts) (zero leakage)
           lag/lead + gap sessionization + backfill + trailing windows

``text`` rides as an untouched passthrough column end-to-end
(byte-identity invariant). Hot-domain skew is handled by bucket count
(num_buckets ≫ cores; a bucket holds whole url groups, so the widest url
bounds the minimum) — order-sensitive ops cannot be key-salted (SURVEY.md
§7.4); pure aggregations use the salted two-stage grouped_agg instead.

For resumable runs, the same fused per-bucket function can be executed
through state.checkpoint.checkpointed_sorted_run (see
pipelines.checkpointed_page_features).
"""

from __future__ import annotations

import pandas as pd

from ..core.config import FlattenConfig
from ..stages.flatten import FlattenSpec, TABLE_TAG, flatten_dataset
from ..stages.partition import BUCKET_COL, add_bucket
from ..stages.window import backfill, rolling_agg, sessionize, with_lag, with_lead

PAGE_SPEC = FlattenSpec(
    entity="pages",
    config=FlattenConfig(id_generation=("url", "warc_ts")),
    json_col="meta",
    record_cols=("url", "warc_ts"),
    passthrough=("url", "warc_ts", "text", "lang"),
    child_passthrough=("url", "warc_ts"),
    provenance=True,  # _fp/_seq: lets the fused pass keep only the dedup
                      # winner's link rows (exact pushdown parity)
    extract_time="2026-01-01 00:00:00.000000",  # run constant: deterministic
)

LINKS_TABLE = "pages_meta_links"

#: flagship spec: link aggregates pushed down into the flatten pass — a
#: record's child rows are task-local, so per-snapshot aggregates are
#: exact there, and the (3-5x larger) child rows never enter the shuffle
PAGE_SPEC_PUSHDOWN = FlattenSpec(
    entity="pages",
    config=FlattenConfig(id_generation=("url", "warc_ts")),
    json_col="meta",
    record_cols=("url", "warc_ts"),
    passthrough=("url", "warc_ts", "text", "lang"),
    child_aggs=(
        (LINKS_TABLE, "n_links", "href", "count"),
        (LINKS_TABLE, "mean_link_depth", "depth", "mean"),
    ),
    extract_time="2026-01-01 00:00:00.000000",
)


def page_feature_fn(session_gap_s: float, rolling_window_s: float):
    """The fused per-partition kernel: tagged rows of one url-bucket →
    feature rows. Pure pandas; reusable by both the streaming pipeline and
    the checkpointed runner."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        main = df[df[TABLE_TAG] == "pages"]
        links = df[df[TABLE_TAG] == LINKS_TABLE]

        # exact dedup of (url, warc_ts); winner = first by (text, _fp) — a
        # deterministic content tiebreak (the composite _id is constant
        # within a group, it hashes only the key fields)
        main = (
            main.sort_values(["url", "warc_ts", "text", "_fp"], kind="mergesort")
            .drop_duplicates(subset=["url", "warc_ts"], keep="first")
            .dropna(subset=["url", "warc_ts"])
        )

        # keep exactly the dedup WINNER's link rows (pushdown parity):
        # identical duplicate records collapse on (_fp, _seq) — same
        # fingerprint, same ordinals — while a losing snapshot that shares
        # (url, warc_ts) but differs in content has a different _fp and is
        # dropped. Genuinely repeated identical links within one record
        # keep distinct _seq and are counted, exactly like the pushdown
        # per-record aggregates. (NOT keyed on _id: composite-ID child
        # rows share one degenerate _id — parity-pinned quirk.)
        links = links.drop_duplicates(subset=["_fp", "_seq"])
        links = links[links["_fp"].isin(main["_fp"].to_numpy())]
        g = links.groupby(["url", "warc_ts"], sort=False)
        feats = pd.DataFrame(
            {"n_links": g["href"].count(), "mean_link_depth": g["depth"].mean()}
        ).reset_index().rename(columns={"warc_ts": "feature_ts"})
        feats = feats[feats["n_links"] > 0]

        # main rows drop link padding + provenance before the join
        main = main.drop(
            columns=[TABLE_TAG, "_parent_id", "href", "depth", "_fp", "_seq"],
            errors="ignore",
        )

        # sort-merge as-of: latest feature row with feature_ts <= warc_ts
        left = main.sort_values("warc_ts", kind="mergesort")
        right = feats.sort_values("feature_ts", kind="mergesort")
        out = pd.merge_asof(
            left, right, left_on="warc_ts", right_on="feature_ts", by="url",
            direction="backward", allow_exact_matches=True,
        )

        out = out.sort_values(["url", "warc_ts", "_id"], kind="mergesort").reset_index(
            drop=True
        )
        out = with_lag(out, "url", ["n_links"])
        out = with_lead(out, "url", ["n_links"])
        out = sessionize(out, "url", "warc_ts", gap_seconds=session_gap_s)
        out = backfill(out, "url", ["mean_link_depth"])
        out = rolling_agg(
            out, "url", "warc_ts", "n_links", rolling_window_s, aggs=("count", "mean")
        )
        return out

    return fn


def tagged_pages(pages_ds, flatten_concurrency: int | None = None):
    """Flatten pages into the tagged main+links dataset, pruned to the
    columns the feature pass needs (html/scripts never shuffle)."""
    tagged, plan = flatten_dataset(
        pages_ds, PAGE_SPEC, emit="tagged", concurrency=flatten_concurrency
    )
    keep = [
        TABLE_TAG, "url", "warc_ts", "text", "lang", "_id", "_parent_id",
        "href", "depth", "_fp", "_seq",
        *[c for c in plan.main_flat_schema.names if c.startswith("meta_")],
    ]

    def prune(t):
        cols = [c for c in keep if c in t.column_names]
        return t.select(cols)

    return tagged.map_batches(prune, batch_format="pyarrow"), plan


def page_features(
    pages_ds,
    session_gap_s: float = 7 * 86400,
    rolling_window_s: float = 30 * 86400,
    num_buckets: int = 64,
    flatten_concurrency: int | None = None,
    exchange: str | None = None,
):
    """Full feature pipeline over a pages Dataset → features Dataset:
    flatten (tagged: main + child link rows), then ONE url-hash shuffle
    feeding the fused sorted pass. Default exchange = the map-side
    bucket exchange on raw tasks (measured fastest at every level);
    ``exchange="groupby"`` keeps the fully-lazy Dataset sort fallback."""
    from ..stages.partition import resolve_exchange

    tagged, _plan = tagged_pages(pages_ds, flatten_concurrency)
    fn = page_feature_fn(session_gap_s, rolling_window_s)

    if resolve_exchange(exchange) == "tasks":
        from ..stages.partition import bucket_exchange

        return bucket_exchange(tagged, ["url"], fn, num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=[BUCKET_COL]))

    bucketed = add_bucket(tagged, ["url"], num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def page_feature_fn_pushdown(session_gap_s: float, rolling_window_s: float):
    """Fused kernel for the PUSHDOWN path: input rows are main rows that
    already carry per-snapshot link aggregates (child_aggs). Feature rows
    exist only for snapshots that observed links (n_links > 0), matching
    the tagged path where linkless snapshots emit no feature row — so the
    as-of join genuinely reaches back to the previous crawl for them.

    Hot-path shape (this kernel runs once per shuffle bucket, so its
    constants ARE the pipeline's reduce cost): urls are factorized to int
    codes and the single sort runs on (code, ts) int64 arrays — object
    (string) comparisons only happen inside the rare (url, warc_ts)
    duplicate runs when picking the dedup winner. Because the feature
    rows are derived from the SAME frame (feature_ts == a winner row's
    own warc_ts), the backward as-of join degenerates to a masked
    per-key forward fill — no merge, no re-sort."""
    import numpy as np

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.dropna(subset=["url", "warc_ts"])
        n = len(df)
        if n == 0:
            return df
        codes, _ = pd.factorize(df["url"], use_na_sentinel=False)
        ts_i = df["warc_ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        order = np.lexsort((ts_i, codes))  # stable: (code, ts, input order)
        codes_s, ts_s = codes[order], ts_i[order]

        # dedup winner per (url, warc_ts): first of each run; runs longer
        # than 1 re-ranked by (text asc, NaN last) on the tiny dup subset
        first = np.r_[True, (codes_s[1:] != codes_s[:-1]) | (ts_s[1:] != ts_s[:-1])]
        keep = first.copy()
        if not first.all():
            grp = np.cumsum(first) - 1
            sizes = np.bincount(grp)
            dup_pos = np.flatnonzero(sizes[grp] > 1)
            text_vals = df["text"].to_numpy()[order][dup_pos]
            sub = pd.DataFrame({"g": grp[dup_pos], "text": text_vals,
                                "pos": dup_pos})
            winners = (
                sub.sort_values(["g", "text"], na_position="last",
                                kind="mergesort")
                .drop_duplicates("g")["pos"].to_numpy()
            )
            keep[dup_pos] = False
            keep[winners] = True

        main = df.iloc[order[keep]].reset_index(drop=True)
        kc = codes_s[keep]
        main["_kc"] = kc

        # as-of attach of self-derived features == forward fill of the
        # latest feature ROW POSITION per key, then a gather — filling the
        # position (not the values) keeps a feature row's own NaN fields
        # (e.g. all-null depths) from being bridged by older features
        nm = len(main)
        has = main["n_links"].to_numpy() > 0
        pos = pd.Series(
            np.where(has, np.arange(nm, dtype=np.float64), np.nan),
            index=main.index,
        )
        posf = pos.groupby(kc, sort=False).ffill().to_numpy()
        valid = ~np.isnan(posf)
        src = posf[valid].astype(np.int64)

        feature_ts = np.full(nm, np.datetime64("NaT", "ns"))
        feature_ts[valid] = (
            main["warc_ts"].to_numpy().astype("datetime64[ns]")[src]
        )
        n_links_f = np.full(nm, np.nan)
        n_links_f[valid] = main["n_links"].to_numpy(dtype=np.float64)[src]
        depth_f = np.full(nm, np.nan)
        depth_f[valid] = main["mean_link_depth"].to_numpy(dtype=np.float64)[src]

        out = main.drop(columns=["n_links", "mean_link_depth"])
        out["feature_ts"] = pd.Series(feature_ts, index=main.index).astype(
            main["warc_ts"].dtype
        )
        out["n_links"] = n_links_f
        out["mean_link_depth"] = depth_f

        out = with_lag(out, "_kc", ["n_links"])
        out = with_lead(out, "_kc", ["n_links"])
        out = sessionize(out, "_kc", "warc_ts", gap_seconds=session_gap_s,
                         label_key="url")
        out = backfill(out, "_kc", ["mean_link_depth"])
        out = rolling_agg(
            out, "_kc", "warc_ts", "n_links", rolling_window_s,
            aggs=("count", "mean"),
        )
        return out.drop(columns=["_kc"])

    return fn


def page_features_pushdown(
    pages_ds,
    session_gap_s: float = 7 * 86400,
    rolling_window_s: float = 30 * 86400,
    num_buckets: int = 64,
    flatten_concurrency: int | None = None,
    exchange: str | None = None,
    plan=None,
):
    """THE flagship at scale: child aggregates computed inside the flatten
    task (exact — a record's child rows never span tasks), so only main
    rows enter the one url shuffle (3-5x less exchange volume than the
    tagged path). Default exchange = the map-side bucket exchange on raw
    tasks; ``exchange="groupby"`` keeps the fully-lazy Dataset sort
    fallback (stages.partition.resolve_exchange).
    Pass a precompiled ``plan`` (stages.flatten.plan_from_dataset) to skip
    the driver-side schema-discovery sample — discovery is a per-call
    constant that repeated/benchmarked runs should hoist."""
    from ..stages.partition import resolve_exchange

    flat, _plan = flatten_dataset(
        pages_ds, PAGE_SPEC_PUSHDOWN, emit="main",
        concurrency=flatten_concurrency, plan=plan,
    )
    fn = page_feature_fn_pushdown(session_gap_s, rolling_window_s)

    if resolve_exchange(exchange) == "tasks":
        from ..stages.partition import bucket_exchange

        return bucket_exchange(flat, ["url"], fn, num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=[BUCKET_COL]))

    bucketed = add_bucket(flat, ["url"], num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def page_features_pushdown_fused(
    pages_files,
    session_gap_s: float = 7 * 86400,
    rolling_window_s: float = 30 * 86400,
    num_buckets: int = 16,
    plan=None,
    columns=("url", "warc_ts", "text", "lang", "meta"),
):
    """Peak-throughput flagship: read + flatten + bucket-split FUSED into
    one Ray task per input shard (the classic map-side shuffle write), so
    flattened rows go to the object store already bucketed — no
    intermediate full-table materialization and no separate split hop.
    One reduce task per bucket runs the same fused feature kernel.

    Partitioning assumption (document per SURVEY §2 custom-operator rule):
    input shard count ≫ total cores (one task per shard is the map
    quantum), and a bucket must fit one worker's memory — identical to
    the Dataset path's bucket contract. Results are row-for-row equal to
    :func:`page_features_pushdown`; this variant exists because the
    all-to-all here is two task hops instead of a sort, which is what
    scales linearly with cores on a fixed cluster. Per-bucket fan-in is
    bounded: above ``GRAFT_REDUCE_FANIN`` (64) shards, intermediate
    concat tasks tree-reduce the parts so no task ever takes more than
    the cap in arguments (10^5 shards → 3 bounded hops)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..stages.partition import DEFAULT_MAX_FANIN, _tree_concat

    files = sorted(pages_files)
    if not files:  # mirror bucket_exchange's empty-upstream guard
        return rd.from_items([])
    cols = _fused_shard_matrix(files, plan, num_buckets, columns)
    fn = page_feature_fn_pushdown(session_gap_s, rolling_window_s)

    @ray.remote
    def reduce(*parts):
        live = [p for p in parts if p.num_rows]
        t = (
            next((p for p in parts if p.num_columns), parts[0])
            if not live
            else pa.concat_tables(live, promote_options="permissive")
        )
        return pa.Table.from_pandas(fn(t.to_pandas()), preserve_index=False)

    outs = [
        reduce.remote(*_tree_concat(cols[b], DEFAULT_MAX_FANIN))
        for b in range(num_buckets)
    ]
    return rd.from_arrow_refs(outs)


def _fused_shard_matrix(files, plan, num_buckets, columns):
    """Launch one fused read+flatten+bucket-split task per input shard;
    returns PER-BUCKET ref columns (full groups of GRAFT_REDUCE_FANIN
    shards fold into one concat ref per bucket as they launch, so the
    driver never holds the full [shards × buckets] matrix). Shared by
    the streaming and checkpointed fused flagship runners."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..stages.flatten import FlattenStage, plan_from_dataset
    from ..stages.partition import (
        DEFAULT_MAX_FANIN, _GroupedColumns, key_hash,
    )

    if plan is None:
        ds = rd.read_parquet(files, columns=list(columns))
        plan = plan_from_dataset(ds, PAGE_SPEC_PUSHDOWN)
    plan_ref = ray.put(plan)

    @ray.remote(num_returns=num_buckets)
    def map_shard(path, plan_obj):
        import pyarrow.parquet as pq

        block = pq.read_table(path, columns=list(columns))
        flat = FlattenStage(plan_obj, emit="main")(block)
        key_frame = flat.select(["url"]).to_pandas()
        h = (key_hash(key_frame, ["url"]) % np.uint64(num_buckets)).astype(
            np.int64
        )
        order = np.argsort(h, kind="stable")
        taken = flat.take(pa.array(order))
        bounds = np.searchsorted(h[order], np.arange(num_buckets + 1))
        parts = tuple(
            taken.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(num_buckets)
        )
        return parts if num_buckets > 1 else parts[0]

    grouped = _GroupedColumns(num_buckets, DEFAULT_MAX_FANIN)
    for f in files:
        refs = map_shard.remote(f, plan_ref)
        grouped.add([refs] if num_buckets == 1 else refs)
    return grouped.finish()


def checkpointed_page_features_fused(
    pages_files,
    out_dir: str,
    run_fingerprint: str,
    session_gap_s: float = 7 * 86400,
    rolling_window_s: float = 30 * 86400,
    num_buckets: int = 16,
    plan=None,
    columns=("url", "warc_ts", "text", "lang", "meta"),
) -> dict:
    """Resumable PEAK-path flagship: the fused map-side shuffle
    (:func:`page_features_pushdown_fused`) executed through the
    per-bucket checkpoint layer — each reduce task writes
    ``part=<bucket>/data.parquet`` + manifest atomically, and a rerun
    with the same ``run_fingerprint`` skips completed buckets
    DRIVER-side: neither their reduce nor any map work they alone would
    need is launched (map shards are shared across buckets, so maps run
    iff ANY bucket is pending). Returns run metrics; read results with
    ``ray.data.read_parquet(out_dir)``. Output is byte-identical to an
    uninterrupted run — every kernel is deterministic."""
    import json as _json
    import os as _os
    import time as _time

    import pyarrow as pa
    import ray

    from ..stages.partition import DEFAULT_MAX_FANIN, _tree_concat
    from ..state.checkpoint import _matching_manifest, persist_partition

    files = sorted(pages_files)
    _os.makedirs(out_dir, exist_ok=True)
    done, pending = [], []
    for b in range(num_buckets):
        m = _matching_manifest(out_dir, b, run_fingerprint)
        (done if m else pending).append((b, m))

    frames = [
        pd.DataFrame({"partition": [b], "rows_in": [m["rows_in"]],
                      "rows_out": [m["rows_out"]], "seconds": [0.0],
                      "skipped": [True]})
        for b, m in done
    ]
    if pending and files:
        fn = page_feature_fn_pushdown(session_gap_s, rolling_window_s)
        cols = _fused_shard_matrix(files, plan, num_buckets, columns)

        @ray.remote
        def reduce_ckpt(bucket: int, *parts):
            t0 = _time.time()
            live = [p for p in parts if p.num_rows]
            t = (
                next((p for p in parts if p.num_columns), parts[0])
                if not live
                else pa.concat_tables(live, promote_options="permissive")
            )
            frame = t.to_pandas()
            out = fn(frame)
            return persist_partition(
                out, len(frame), bucket, out_dir, run_fingerprint, t0
            )

        stat_refs = [
            reduce_ckpt.remote(b, *_tree_concat(cols[b], DEFAULT_MAX_FANIN))
            for b, _ in pending
        ]
        frames.extend(ray.get(stat_refs))

    stats = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["partition", "rows_in", "rows_out", "seconds", "skipped"]
    )
    run_meta = {
        "run_fingerprint": run_fingerprint,
        "num_buckets": num_buckets,
        "partitions_done": int(len(stats)),
        "partitions_skipped": int(stats["skipped"].sum()) if len(stats) else 0,
        "rows_in": int(stats["rows_in"].sum()) if len(stats) else 0,
        "rows_out": int(stats["rows_out"].sum()) if len(stats) else 0,
        "wall_seconds_sum": float(stats["seconds"].sum()) if len(stats) else 0.0,
    }
    with open(_os.path.join(out_dir, "_run.json"), "w") as f:
        _json.dump(run_meta, f, indent=1)
    return run_meta


def ingest_pages_increment(
    out_dir: str,
    new_files,
    session_gap_s: float = 7 * 86400,
    rolling_window_s: float = 30 * 86400,
    num_buckets: int = 16,
    columns=("url", "warc_ts", "text", "lang", "meta"),
) -> dict:
    """Incremental crawl-snapshot ingest: feature-store refresh that
    touches only the url-hash buckets the NEW shards hit.

    Layout under ``out_dir``:

    * ``input/part=<b>/ingest-<seq>-<i>.parquet`` — append-only cache of
      FLATTENED rows, bucketed by ``hash(url)`` at ingest time (the same
      fused read+flatten+split map as the batch flagship, run only over
      the new shards);
    * ``features/part=<b>/data.parquet`` + manifest — per-bucket feature
      output, recomputed ONLY for touched buckets from that bucket's
      accumulated input parts (dedup → as-of → windows need the bucket's
      full history, which is already flattened and co-located — history
      is never re-flattened);
    * ``_state.json`` — ingested file list (re-ingesting a file is a
      no-op) and the frozen flatten plan fingerprint;
    * ``_plan.pkl`` — the flatten plan FROZEN at first ingest so every
      increment emits the same schema (a later shard with extra meta
      keys must not fork the cache schema).

    Per-ingest cost is O(new data) map work + O(touched buckets'
    accumulated rows) reduce work — at web scale an increment touching
    k of B buckets leaves the other B−k feature partitions byte-
    untouched (asserted by tests). Equivalent by construction to the
    batch flagship over ALL ingested shards: the feature kernel is
    order-independent over each bucket frame (the tree-concat of the
    batch path already relies on that).

    Returns ingest metrics (files ingested, buckets touched/skipped,
    rows). Read features with ``ray.data.read_parquet(out_dir +
    "/features")``.
    """
    import glob as _glob
    import json as _json
    import os as _os
    import pickle as _pickle
    import time as _time

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..stages.flatten import FlattenStage, plan_from_dataset
    from ..stages.partition import key_hash
    from ..state.checkpoint import fingerprint, persist_partition

    _os.makedirs(out_dir, exist_ok=True)
    state_path = _os.path.join(out_dir, "_state.json")
    plan_path = _os.path.join(out_dir, "_plan.pkl")
    state = {"ingested": [], "num_buckets": num_buckets, "seq": 0}
    if _os.path.exists(state_path):
        with open(state_path) as f:
            state = _json.load(f)
        if state["num_buckets"] != num_buckets:
            raise ValueError(
                f"out_dir was bucketed with num_buckets="
                f"{state['num_buckets']}, got {num_buckets}"
            )
    todo = sorted(set(map(str, new_files)) - set(state["ingested"]))
    if not todo:
        return {"files_ingested": 0, "buckets_touched": 0,
                "buckets_reused": num_buckets,
                "rows_in": 0, "rows_out": 0}

    if _os.path.exists(plan_path):
        with open(plan_path, "rb") as f:
            plan = _pickle.load(f)
    else:  # first ingest freezes the schema for every later increment
        plan = plan_from_dataset(
            rd.read_parquet(todo, columns=list(columns)), PAGE_SPEC_PUSHDOWN
        )
        tmp = plan_path + f".tmp.{_os.getpid()}"
        with open(tmp, "wb") as f:
            _pickle.dump(plan, f)
        _os.replace(tmp, plan_path)
    plan_ref = ray.put(plan)
    seq = int(state["seq"])

    @ray.remote
    def map_ingest(path: str, i: int, plan_obj) -> list:
        """Fused read+flatten+split over ONE new shard; appends each
        non-empty bucket slice to that bucket's input cache. Returns the
        touched bucket ids."""
        import pyarrow.parquet as pq

        block = pq.read_table(path, columns=list(columns))
        flat = FlattenStage(plan_obj, emit="main")(block)
        h = (
            key_hash(flat.select(["url"]).to_pandas(), ["url"])
            % np.uint64(num_buckets)
        ).astype(np.int64)
        order = np.argsort(h, kind="stable")
        taken = flat.take(pa.array(order))
        bounds = np.searchsorted(h[order], np.arange(num_buckets + 1))
        touched = []
        for b in range(num_buckets):
            part = taken.slice(bounds[b], bounds[b + 1] - bounds[b])
            if part.num_rows == 0:
                continue
            pdir = _os.path.join(out_dir, "input", f"part={b}")
            _os.makedirs(pdir, exist_ok=True)
            dest = _os.path.join(pdir, f"ingest-{seq:05d}-{i:05d}.parquet")
            tmp = dest + f".tmp.{_os.getpid()}"
            pq.write_table(part, tmp)
            _os.replace(tmp, dest)
            touched.append(b)
        return touched

    touched_lists = ray.get(
        [map_ingest.remote(p, i, plan_ref) for i, p in enumerate(todo)]
    )
    touched = sorted({b for lst in touched_lists for b in lst})

    state["ingested"] = sorted(set(state["ingested"]) | set(todo))
    state["seq"] = seq + 1
    run_fp = fingerprint(tuple(state["ingested"]))
    fn = page_feature_fn_pushdown(session_gap_s, rolling_window_s)
    feat_dir = _os.path.join(out_dir, "features")
    _os.makedirs(feat_dir, exist_ok=True)

    @ray.remote
    def reduce_bucket(b: int, part_files: tuple):
        import pyarrow.parquet as pq

        t0 = _time.time()
        t = pa.concat_tables(
            [pq.read_table(p) for p in part_files],
            promote_options="permissive",
        )
        frame = t.to_pandas()
        return persist_partition(
            fn(frame), len(frame), b, feat_dir, run_fp, t0
        )

    stat_refs = []
    for b in touched:
        parts = tuple(sorted(_glob.glob(
            _os.path.join(out_dir, "input", f"part={b}", "ingest-*.parquet")
        )))
        stat_refs.append(reduce_bucket.remote(b, parts))
    stats = ray.get(stat_refs)

    tmp = state_path + f".tmp.{_os.getpid()}"
    with open(tmp, "w") as f:
        _json.dump(state, f, indent=1)
    _os.replace(tmp, state_path)

    rows_in = int(sum(s["rows_in"].iloc[0] for s in stats)) if stats else 0
    rows_out = int(sum(s["rows_out"].iloc[0] for s in stats)) if stats else 0
    return {
        "files_ingested": len(todo),
        "buckets_touched": len(touched),
        "buckets_reused": num_buckets - len(touched),
        "rows_in": rows_in,
        "rows_out": rows_out,
        "run_fingerprint": run_fp,
    }


def checkpointed_page_features(
    pages_ds,
    out_dir: str,
    run_fingerprint: str,
    session_gap_s: float = 7 * 86400,
    rolling_window_s: float = 30 * 86400,
    num_buckets: int = 64,
    exchange: str | None = None,
) -> dict:
    """Resumable flagship run: same fused kernel, executed through the
    per-partition checkpoint layer (atomic parquet + manifest per url
    bucket; rerun skips completed partitions — with ``exchange="tasks"``
    the skip happens driver-side and completed buckets never launch a
    reduce). Returns run metrics; read results with
    ``ray.data.read_parquet(out_dir)``."""
    from ..state.checkpoint import checkpointed_sorted_run

    tagged, _plan = tagged_pages(pages_ds)
    fn = page_feature_fn(session_gap_s, rolling_window_s)
    return checkpointed_sorted_run(
        tagged, ["url"], "warc_ts", fn, out_dir, run_fingerprint,
        num_buckets=num_buckets, tiebreak=[TABLE_TAG, "_id"],
        exchange=exchange,
    )


__all__ = [
    "page_features",
    "page_features_pushdown",
    "page_features_pushdown_fused",
    "page_feature_fn",
    "page_feature_fn_pushdown",
    "tagged_pages",
    "checkpointed_page_features",
    "checkpointed_page_features_fused",
    "ingest_pages_increment",
    "PAGE_SPEC",
    "PAGE_SPEC_PUSHDOWN",
    "LINKS_TABLE",
]
