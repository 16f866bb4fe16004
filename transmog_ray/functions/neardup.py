"""Near-duplicate detection: MinHash+LSH, SimHash, character-set Jaccard,
embedding-cosine.

Scale shapes:
* MinHash/LSH: per-batch shingle→minhash (numpy universal hashing), explode
  to (band, band_hash, doc_id) rows, ``groupby`` the band buckets, verify
  candidate pairs, then min-label propagation for clusters. Only bucketed
  candidates are ever compared pairwise.
* SimHash: 64-bit fingerprint per doc in one vectorized pass; near-dups =
  bucket by fingerprint prefix + Hamming check.
* char-Jaccard / cosine all-pairs: brute-force verification paths — one
  side broadcast via ``ray.put``, the other streamed per batch. These are
  the small-scale oracles that pin the LSH variants; definition matches
  DuckDB ``jaccard()`` (character sets, case-sensitive) and
  ``list_cosine_similarity`` (float64) exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _id_dtype(s: pd.Series):
    """Pair/cluster frames carry ids at the SOURCE column's dtype —
    integer ids stay integer, string/other ids ride as object (they were
    rejected with ValueError when the int64 coercion was unconditional)."""
    return s.dtype if pd.api.types.is_integer_dtype(s) else object

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """n_perm universal-hash minhash signatures; bands for LSH.

    Stateful stage: permutation coefficients are derived ONCE from a seed
    in ``__init__`` (actor-pool friendly) and identical on every actor.
    """

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        """Single-doc signature — delegates to the batch kernel so both
        APIs use the identical shingle fallback for empty/short texts."""
        return self.sign_batch([text])[0]

    def sign_batch(self, texts) -> list[np.ndarray]:
        """Whole-batch signatures: hash every shingle of the batch in ONE
        pandas siphash call, then segment-min with ``minimum.reduceat``."""
        k = self.shingle_k
        all_sh: list[str] = []
        starts = [0]
        for t in texts:
            t = t or ""
            if len(t) < k:
                views = [t] if t else ["\0"]
            else:
                views = list({t[i : i + k] for i in range(len(t) - k + 1)})
            all_sh.extend(views)
            starts.append(len(all_sh))
        hashed = pd.util.hash_pandas_object(
            pd.Series(all_sh), index=False
        ).to_numpy()
        starts_arr = np.asarray(starts[:-1], dtype=np.int64)
        sig = np.empty((len(texts), self.n_perm), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.n_perm):
                sig[:, i] = np.minimum.reduceat(
                    self.a[i] * hashed + self.b[i], starts_arr
                )
        return list(sig)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df["minhash"] = self.sign_batch(df["text"])
        return df


def lsh_bands(df: pd.DataFrame, n_bands: int, id_col: str = "doc_id") -> pd.DataFrame:
    """Explode signatures into (band, band_hash, id) rows for the bucket
    groupby — fully vectorized: the whole batch's signature matrix is
    reshaped to (docs, bands, rows_per_band) and each band chunk is mixed
    into one 64-bit FNV-1a-style hash with ``rows_per_band`` numpy passes
    (no per-(doc, band) hashlib calls). A 64-bit collision merely adds a
    candidate pair that the exact-Jaccard verify rejects, so output
    clusters are unaffected by the hash choice."""
    n_docs = len(df)
    if n_docs == 0:
        return pd.DataFrame({
            "band": pd.Series([], dtype="int64"),
            "band_hash": pd.Series([], dtype="int64"),
            id_col: df[id_col],
        })
    sigs = np.asarray(list(df["minhash"]), dtype=np.uint64)  # (docs, n_perm)
    rows_per_band = sigs.shape[1] // n_bands
    chunks = sigs[:, : n_bands * rows_per_band].reshape(
        n_docs, n_bands, rows_per_band
    )
    with np.errstate(over="ignore"):
        h = np.full((n_docs, n_bands), 0xCBF29CE484222325, dtype=np.uint64)
        for r in range(rows_per_band):
            h = (h ^ chunks[:, :, r]) * np.uint64(0x100000001B3)
    return pd.DataFrame({
        "band": np.tile(np.arange(n_bands, dtype=np.int64), n_docs),
        "band_hash": h.reshape(-1).view(np.int64),
        id_col: np.repeat(df[id_col].to_numpy(), n_bands),
    })


def _shingle_jaccard(a: str, b: str, k: int) -> float:
    sa = {a[i : i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i : i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _union_find_labels(a, b) -> dict:
    """Connected-component labels (label = min member) by path-halving
    union-find — the driver-side fast path under
    ``driver_edge_limit``; output contract identical to
    :func:`_min_label_propagation` (pinned by tests)."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[ry] = rx
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    return {x: comp_min[find(x)] for x in parent}


def _min_label_propagation(edges_ds, num_buckets: int = 16,
                           max_iters: int = 50,
                           id_is_int: bool = True):
    """Distributed connected components by iterative min-label
    propagation over an edge Dataset (id_a, id_b) → label-map DATASET
    (node, label) where label = min node id of the component.

    Each iteration is two bucket exchanges: (1) route current labels and
    edges by source node so every edge emits its source's label to its
    destination; (2) route messages + labels by destination node and take
    the min. Converges in O(component diameter) rounds — near-dup
    components are small cliques, so a handful. The driver only ever
    holds per-iteration changed COUNTS — never the pair stream and never
    the label map (write it back onto members with
    :func:`_labels_write_back`).

    ``id_is_int`` pins every id-carrying column to one dtype (int64 or
    object) in EVERY emitted frame: null-padding promotes ints to float
    inside bucket frames, and a float-vs-int dtype split across blocks
    would hash the same node to different buckets."""
    from ..stages.partition import bucket_exchange

    cast = (lambda s: s.astype("int64")) if id_is_int else (
        lambda s: s.astype(object)
    )

    # symmetric edge list: propagate both directions
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [df[["id_a", "id_b"]],
             df.rename(columns={"id_a": "id_b", "id_b": "id_a"})[
                 ["id_a", "id_b"]]],
            ignore_index=True,
        ).rename(columns={"id_a": "src", "id_b": "dst"})
        return out.assign(src=cast(out["src"]), dst=cast(out["dst"]))

    edges = edges_ds.map_batches(sym, batch_format="pandas").materialize()

    # initial labels: label(node) = node, one row per distinct node
    labels = bucket_exchange(
        edges, ["src"],
        lambda df: pd.DataFrame(
            {"node": cast(df["src"].drop_duplicates())}
        ).assign(label=lambda d: d["node"]),
        num_buckets,
    ).materialize()

    def emit_msgs(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["_is_edge"] == 0]
        lut = dict(zip(cast(lab["node"]), cast(lab["label"])))
        e = df[df["_is_edge"] == 1]
        msgs = pd.DataFrame({
            "node": cast(e["dst"]),
            "label": cast(e["node"].map(lut)),
            "_old": np.int64(0),
        })
        own = pd.DataFrame({
            "node": cast(lab["node"]), "label": cast(lab["label"]),
            "_old": np.int64(1),
        })
        return pd.concat([own, msgs], ignore_index=True)

    def take_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(node=cast(df["node"]), label=cast(df["label"]))
        new = df.groupby("node", sort=False)["label"].min().reset_index()
        old = df[df["_old"] == 1][["node", "label"]].rename(
            columns={"label": "_oldlab"}
        )
        out = new.merge(old, on="node", how="left")
        out["changed"] = (out["label"] != out["_oldlab"]).astype("int64")
        return pd.DataFrame({
            "node": cast(out["node"]), "label": cast(out["label"]),
            "changed": out["changed"],
        })

    for _ in range(max_iters):
        # exchange 1 (route by node/src): every edge emits its source's
        # current label toward its destination; labels ride along tagged
        lab_part = labels.map_batches(
            lambda df: pd.DataFrame({
                "node": cast(df["node"]), "label": cast(df["label"]),
                "dst": cast(df["node"]),  # self-placeholder, never read
                "_is_edge": np.int64(0),
            }),
            batch_format="pandas",
        )
        edge_part = edges.map_batches(
            lambda df: pd.DataFrame({
                "node": cast(df["src"]), "label": cast(df["src"]),
                "dst": cast(df["dst"]), "_is_edge": np.int64(1),
            }),
            batch_format="pandas",
        )
        routed = bucket_exchange(
            lab_part.union(edge_part), ["node"], emit_msgs, num_buckets
        )
        # exchange 2 (route by destination node): new label = min of own
        # label and incoming messages; flag changes for convergence
        labels = bucket_exchange(
            routed, ["node"], take_min, num_buckets
        ).materialize()
        if labels.sum("changed") == 0:
            break

    # the label map stays DISTRIBUTED (a Dataset of (node, label)) — at
    # corpus scale a dup-family graph can hold billions of nodes, so the
    # driver never pulls it; callers write labels back onto members via
    # the co-bucketed join in :func:`_labels_write_back`
    return labels.map_batches(
        lambda df: df[["node", "label"]], batch_format="pandas"
    )


def _labels_write_back(base_ds, id_col: str, labels_ds, num_buckets: int,
                       id_is_int: bool):
    """Distributed cluster-label write-back: co-bucket the (node, label)
    map with the base ids on ``hash(id)`` and resolve per bucket — one
    exchange, driver memory O(buckets), never the whole label map.
    Unlabeled ids are their own cluster. Bucket-local dict lookup keeps
    int64 ids out of float64 (no NaN upcast from a left-merge). Base
    rows pass through 1:1 (dup base ids emit dup output rows)."""
    from ..stages.partition import bucket_exchange

    cast = (lambda s: s.astype("int64")) if id_is_int else (
        lambda s: s.astype(object)
    )
    id_dt = "int64" if id_is_int else object

    def _typed_empty() -> pd.DataFrame:
        return pd.DataFrame({
            id_col: pd.Series([], dtype=id_dt),
            "_lab": pd.Series([], dtype=id_dt),
            "_side": pd.Series([], dtype="int64"),
        })

    def _tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        if "node" not in df.columns:  # zero-column filler block
            return _typed_empty()
        return pd.DataFrame({
            id_col: cast(df["node"]), "_lab": cast(df["label"]),
            "_side": np.int64(0)})

    def _tag_base(df: pd.DataFrame) -> pd.DataFrame:
        if id_col not in df.columns:
            return _typed_empty()
        return pd.DataFrame({
            id_col: cast(df[id_col]), "_lab": cast(df[id_col]),
            "_side": np.int64(1)})

    lab_part = labels_ds.map_batches(_tag_labels, batch_format="pandas")
    base_part = base_ds.map_batches(_tag_base, batch_format="pandas")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        if "_side" not in df.columns:
            return pd.DataFrame({id_col: pd.Series([], dtype=id_dt),
                                 "cluster": pd.Series([], dtype=id_dt)})
        lab = df[df["_side"] == 0]
        base = df[df["_side"] == 1]
        lut = dict(zip(lab[id_col], lab["_lab"]))
        ids = base[id_col].reset_index(drop=True)
        cluster = base["_lab"].reset_index(drop=True)  # own id default
        mask = ids.isin(lut)
        if mask.any():
            cluster = cluster.copy()
            cluster[mask] = ids[mask].map(lut)
        return pd.DataFrame({id_col: cast(ids), "cluster": cast(cluster)})

    return bucket_exchange(lab_part.union(base_part), [id_col], resolve,
                           num_buckets)


def _bucketed_text_verify(
    pairs,
    sub,
    id_col: str,
    text_col: str,
    shingle_k: int,
    jaccard_threshold: float,
    num_buckets: int,
    sim_fn=None,
    emit_sim: bool = False,
):
    """Distributed exact-Jaccard verify of candidate pairs: build a
    bucketed TEXT TABLE once (candidate texts split by ``hash(id) % B``),
    then probe it twice — pairs route by ``id_a`` to attach text_a, and
    the same task re-splits its output by ``id_b`` so the second hop
    attaches text_b and verifies. Texts cross the wire ONCE, pairs twice,
    with no pad/union passes — cheaper than two generic hash joins and
    the same asymptotics. Returns a Dataset of verified (id_a, id_b).

    ``sim_fn(text_a, text_b) -> float`` overrides the default
    char-shingle Jaccard (PPJoin reuses this machinery with a word
    n-gram similarity); ``emit_sim=True`` adds the similarity as a
    ``jac`` column (rounded to 6, matching the all-pairs oracles)."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..stages.partition import DEFAULT_MAX_FANIN, _tree_concat, key_hash

    def _split_table(t: pa.Table, col: str):
        if t.num_rows == 0 or t.num_columns == 0:
            return tuple(t for _ in range(num_buckets))
        h = (
            key_hash(t.select([col]).to_pandas(), [col])
            % np.uint64(num_buckets)
        ).astype(np.int64)
        order = np.argsort(h, kind="stable")
        taken = t.take(pa.array(order))
        bounds = np.searchsorted(h[order], np.arange(num_buckets + 1))
        return tuple(
            taken.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(num_buckets)
        )

    def _as_table(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        return block

    @ray.remote(num_returns=max(2, num_buckets))
    def split_texts(block):
        return _split_table(_as_table(block), id_col)

    @ray.remote(num_returns=max(2, num_buckets))
    def split_pairs(block):
        return _split_table(_as_table(block), "id_a")

    @ray.remote(num_returns=max(2, num_buckets))
    def attach_a(texts: pa.Table, *parts: pa.Table):
        live = [p for p in parts if p.num_rows]
        if not live:
            empty = pa.table({})
            return tuple(empty for _ in range(num_buckets))
        df = pa.concat_tables(live, promote_options="permissive").to_pandas()
        tdf = texts.to_pandas().rename(
            columns={id_col: "id_a", text_col: "_text_a"}
        )
        out = df.merge(tdf, on="id_a", how="inner")
        return _split_table(
            pa.Table.from_pandas(out, preserve_index=False), "id_b"
        )

    sim = sim_fn or (lambda a, b: _shingle_jaccard(a, b, shingle_k))
    out_cols = ["id_a", "id_b"] + (["jac"] if emit_sim else [])

    @ray.remote
    def attach_b_verify(texts: pa.Table, *parts: pa.Table):
        live = [p for p in parts if p.num_rows]
        if not live:
            cols = {"id_a": pa.array([]), "id_b": pa.array([])}
            if emit_sim:
                cols["jac"] = pa.array([], type=pa.float64())
            return pa.table(cols)
        df = pa.concat_tables(live, promote_options="permissive").to_pandas()
        tdf = texts.to_pandas().rename(
            columns={id_col: "id_b", text_col: "_text_b"}
        )
        df = df.merge(tdf, on="id_b", how="inner")
        sims = [
            sim(a or "", b or "")
            for a, b in zip(df["_text_a"], df["_text_b"])
        ]
        if emit_sim:
            df["jac"] = [round(float(s), 6) for s in sims]
        ok = [s >= jaccard_threshold for s in sims]
        return pa.Table.from_pandas(
            df.loc[ok, out_cols], preserve_index=False
        )

    # stage A: the text table, bucketed once
    tmat = []
    for bundle in sub.iter_internal_ref_bundles():
        tmat.extend(split_texts.remote(r) for r in bundle.block_refs)

    @ray.remote
    def concat(*parts: pa.Table) -> pa.Table:
        live = [p for p in parts if p.num_rows]
        if not live:
            return next((p for p in parts if p.num_columns), parts[0])
        return pa.concat_tables(live, promote_options="permissive")

    text_refs = [
        concat.remote(
            *_tree_concat([row[b] for row in tmat], DEFAULT_MAX_FANIN)
        )
        for b in range(num_buckets)
    ]

    # stage B: pairs split by id_a
    pmat = []
    for bundle in pairs.iter_internal_ref_bundles():
        pmat.extend(split_pairs.remote(r) for r in bundle.block_refs)
    # stage C: probe text_a, re-split by id_b (fused — no extra hop)
    cmat = [
        attach_a.remote(
            text_refs[b],
            *_tree_concat([row[b] for row in pmat], DEFAULT_MAX_FANIN),
        )
        for b in range(num_buckets)
    ]
    # stage D: probe text_b + verify
    outs = [
        attach_b_verify.remote(
            text_refs[c],
            *_tree_concat([row[c] for row in cmat], DEFAULT_MAX_FANIN),
        )
        for c in range(num_buckets)
    ]
    return rd.from_arrow_refs(outs)


def minhash_clusters(
    ds,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    driver_edge_limit: int = 100_000,
):
    """Full MinHash-LSH near-dup pipeline → Dataset of (id, cluster).

    Every wide step is distributed — texts, signatures, and the candidate
    PAIR STREAM never land on the driver:

      sign (map_batches) → band-bucket groupby → per-group candidate
      pairs → ONE bucket-exchange dedup of pairs (distributed) →
      semi-join texts down to candidate ids → two distributed hash joins
      attach both texts to each pair → exact shingle-Jaccard VERIFY per
      batch → distributed min-label propagation over the verified edges
      (:func:`_min_label_propagation`) → labels written back onto doc
      ids by ONE co-bucketed exchange (:func:`_labels_write_back`).

    Scale shape: above ``driver_edge_limit`` the driver never holds the
    label map (memory O(buckets)); below the gate a local union-find of
    the gate-bounded edge set is broadcast instead (cheaper than ~6
    distributed propagation waves for small dup families).
    """
    from ..stages.partition import bucket_exchange

    hasher = MinHasher(n_perm, shingle_k)
    docs = ds.select_columns([id_col, text_col]).materialize()
    with_sig = docs.map_batches(
        lambda df: hasher(df[[id_col, text_col]].rename(columns={text_col: "text"})),
        batch_format="pandas",
    )
    bands = with_sig.map_batches(
        lambda df: lsh_bands(df, n_bands, id_col), batch_format="pandas"
    )

    # one Ray group per COARSE bucket of band-hashes (not per band bucket —
    # millions of tiny groups would drown in per-group overhead); the fine
    # (band, band_hash) grouping happens in pandas inside each task
    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        dt = _id_dtype(g[id_col])
        parts_a, parts_b = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            ids = np.unique(grp[id_col].to_numpy())  # sorted + deduped
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)  # vectorized all-pairs
            parts_a.append(ids[ai])
            parts_b.append(ids[bi])
        if not parts_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=dt),
                                 "id_b": pd.Series([], dtype=dt)})
        return pd.DataFrame(
            {"id_a": pd.Series(np.concatenate(parts_a), dtype=dt),
             "id_b": pd.Series(np.concatenate(parts_b), dtype=dt)}
        )

    def coarse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_cand_bucket"] = (
            pd.util.hash_pandas_object(df["band_hash"], index=False)
            % np.uint64(64)
        ).astype(np.int64)
        return df

    # distributed pair DEDUP: one bucket exchange keyed on the pair —
    # the un-deduped candidate stream never lands on the driver. The
    # coarse-bucket hop runs on the raw-task exchange (bucket_col routes
    # by the precomputed bucket) — no sort coordination.
    cand = bucket_exchange(
        bands.map_batches(coarse_bucket, batch_format="pandas"),
        ["_cand_bucket"], candidates, 64, bucket_col="_cand_bucket",
    )
    pairs = bucket_exchange(
        cand, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
        num_buckets,
    ).materialize()

    import pyarrow as pa

    from ..stages.common import arrow_schema

    id_is_int = pa.types.is_integer(arrow_schema(docs).field(id_col).type)
    edges = None
    if pairs.count() > 0:
        edges = _verify_pairs(pairs, docs, id_col, text_col, shingle_k,
                              jaccard_threshold, num_buckets)
    return _cluster_assign(edges, docs.select_columns([id_col]), id_col,
                           id_is_int, num_buckets, driver_edge_limit)


def _verify_pairs(pairs, docs, id_col, text_col, shingle_k,
                  jaccard_threshold, num_buckets):
    """Exact-Jaccard verify of a candidate-pair Dataset against the doc
    texts: the candidate-id key set dedups distributed (O(candidate
    ids)), a semi-join prunes texts to those ids, and the build-once /
    probe-twice bucketed text table verifies every pair (texts cross the
    exchange once, pairs twice). Returns the materialized verified edge
    Dataset."""
    from ..stages.partition import bucket_exchange
    from .relational import semi_join

    ids_pd = bucket_exchange(
        pairs.map_batches(
            lambda df: pd.DataFrame({
                id_col: pd.concat([df["id_a"], df["id_b"]],
                                  ignore_index=True)
            }),
            batch_format="pandas",
        ),
        [id_col],
        lambda df: df.drop_duplicates(id_col),
        num_buckets,
    ).to_pandas()
    sub = semi_join(docs, ids_pd, on=id_col)
    return _bucketed_text_verify(
        pairs, sub, id_col, text_col, shingle_k, jaccard_threshold,
        num_buckets,
    ).materialize()


def _cluster_assign(edges, base_ids_ds, id_col, id_is_int, num_buckets,
                    driver_edge_limit):
    """Gate-hybrid component labeling + member assignment shared by the
    batch and incremental MinHash paths: below ``driver_edge_limit`` a
    local union-find of the gate-bounded VERIFIED edge set (O(true
    dups)) broadcasts — cheaper than ~6 distributed propagation waves
    for small dup families; above it labels converge by distributed
    min-label propagation and write back via one co-bucketed exchange
    (driver memory O(buckets), never the label map)."""
    import ray

    n_edges = edges.count() if edges is not None else 0
    if n_edges == 0:
        label_ref = ray.put({})
    elif n_edges <= driver_edge_limit:
        e = edges.to_pandas()
        label_ref = ray.put(_union_find_labels(e["id_a"], e["id_b"]))
    else:
        # graph-size-adaptive parallelism: each propagation round is a
        # fixed number of task waves, so a small edge set (the common
        # case — LSH keeps edges ≪ docs) wants few buckets; a
        # dup-saturated corpus scales the bucket count back up
        nb = int(min(num_buckets, max(2, n_edges // 50_000 + 2)))
        labels_ds = _min_label_propagation(
            edges, num_buckets=nb, id_is_int=id_is_int
        )
        return _labels_write_back(base_ids_ds, id_col, labels_ds,
                                  num_buckets, id_is_int)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        labels = ray.get(label_ref)
        ids = df[id_col]
        return pd.DataFrame(
            {id_col: ids,
             "cluster": [labels.get(i, i) for i in ids]}
        )

    return base_ids_ds.map_batches(assign, batch_format="pandas")


def minhash_ingest(
    cache_dir: str,
    delta_ds,
    corpus_ds,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    driver_edge_limit: int = 100_000,
):
    """INCREMENTAL MinHash-LSH near-dup maintenance: ingest ONE new
    corpus shard against a persistent band/edge cache and return the
    cluster assignment for the whole corpus ingested so far.

    Per ingest only the DELTA is shingled/signed/banded — the expensive
    text work is proportional to new data, not corpus size. Candidate
    pairs are generated only inside band groups touched by a new doc and
    only for pairs involving ≥1 new doc: every final pair (a, b) with b
    ingested no earlier than a materializes exactly once, at b's ingest,
    so the CUMULATIVE verified edge set equals the one-shot batch run's
    (:func:`minhash_clusters`) — pinned by tests. Exact-Jaccard verify
    runs on just the new pairs (texts pruned by semi-join from
    ``corpus_ds``); verified edges append to the cache; labels re-derive
    from the cumulative edge set (small by the LSH contract, cheap
    relative to signing).

    ``corpus_ds`` must be the full corpus ingested so far INCLUDING this
    delta (the verify needs old candidate texts, and the assignment
    covers everything). Cache layout: ``meta.json`` (parameter
    fingerprint + ingest count; a parameter change errors rather than
    silently mixing band spaces), ``bands-<k>/`` and ``edges-<k>/``
    parquet per ingest — band rows re-read per ingest are (band,
    band_hash, id) triples, never text.
    """
    import glob as _glob
    import hashlib
    import json as _json
    import os

    import pyarrow as pa
    import ray.data as rd

    from ..stages.common import arrow_schema
    from ..stages.partition import bucket_exchange

    os.makedirs(cache_dir, exist_ok=True)
    params = {"n_perm": n_perm, "n_bands": n_bands, "shingle_k": shingle_k,
              "jaccard_threshold": jaccard_threshold, "id_col": id_col,
              "text_col": text_col}
    params_fp = hashlib.sha256(
        _json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]
    meta_path = os.path.join(cache_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = _json.load(f)
        if meta["params_fp"] != params_fp:
            raise ValueError(
                "minhash_ingest cache was built with different parameters "
                "— use a fresh cache_dir (mixing band spaces would "
                "silently miss duplicates)")
        k = int(meta["n_ingests"])
    else:
        k = 0

    id_is_int = pa.types.is_integer(
        arrow_schema(corpus_ds).field(id_col).type)

    # 1) sign + band ONLY the delta; persist its band rows
    hasher = MinHasher(n_perm, shingle_k)
    new_bands = delta_ds.select_columns([id_col, text_col]).map_batches(
        lambda df: lsh_bands(
            hasher(df[[id_col, text_col]].rename(columns={text_col: "text"})),
            n_bands, id_col),
        batch_format="pandas",
    ).materialize()
    bands_dir = os.path.join(cache_dir, f"bands-{k:05d}")
    new_bands.write_parquet(bands_dir)

    # 2) candidates: only band groups touched by a new doc, only pairs
    # with ≥1 new member (old-old pairs came from earlier ingests)
    def tag(new: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["band", "band_hash", id_col]].copy()
            out["_new"] = np.int64(new)
            return out
        return fn

    tagged = new_bands.map_batches(tag(1), batch_format="pandas")
    # read_parquet wants FILES when given a list — expand each dir
    old_files = sorted(
        f for d in _glob.glob(os.path.join(cache_dir, "bands-*"))
        if not d.endswith(f"bands-{k:05d}")
        for f in _glob.glob(os.path.join(d, "*.parquet"))
    )
    if old_files:
        old = rd.read_parquet(old_files)
        tomb = _load_tombstones(cache_dir, id_col)
        if tomb is not None and len(tomb):
            tomb_set = set(tomb.tolist())
            old = old.map_batches(
                lambda df: df[~df[id_col].isin(tomb_set)],
                batch_format="pandas")
        tagged = tagged.union(old.map_batches(tag(0),
                                              batch_format="pandas"))

    def coarse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_cand_bucket"] = (
            pd.util.hash_pandas_object(df["band_hash"], index=False)
            % np.uint64(64)
        ).astype(np.int64)
        return df

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        dt = _id_dtype(g[id_col])
        parts_a, parts_b = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            if len(grp) < 2 or not grp["_new"].any():
                continue
            per_id = grp.groupby(id_col, sort=True)["_new"].max()
            ids = per_id.index.to_numpy()
            is_new = per_id.to_numpy(bool)
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            keep = is_new[ai] | is_new[bi]
            if keep.any():
                parts_a.append(ids[ai][keep])
                parts_b.append(ids[bi][keep])
        if not parts_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=dt),
                                 "id_b": pd.Series([], dtype=dt)})
        return pd.DataFrame(
            {"id_a": pd.Series(np.concatenate(parts_a), dtype=dt),
             "id_b": pd.Series(np.concatenate(parts_b), dtype=dt)}
        )

    cand = bucket_exchange(
        tagged.map_batches(coarse_bucket, batch_format="pandas"),
        ["_cand_bucket"], candidates, 64, bucket_col="_cand_bucket",
    )
    pairs = bucket_exchange(
        cand, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
        num_buckets,
    ).materialize()

    # 3) verify the new pairs, append the verified edges to the cache
    if pairs.count() > 0:
        docs = corpus_ds.select_columns([id_col, text_col]).materialize()
        delta_edges = _verify_pairs(pairs, docs, id_col, text_col,
                                    shingle_k, jaccard_threshold,
                                    num_buckets)
        if delta_edges.count() > 0:
            delta_edges.write_parquet(
                os.path.join(cache_dir, f"edges-{k:05d}"))

    tmp_meta = meta_path + f".tmp.{os.getpid()}"
    prior_retracts = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prior_retracts = int(_json.load(f).get("n_retracts", 0))
    with open(tmp_meta, "w") as f:
        _json.dump({"params_fp": params_fp, "params": params,
                    "n_ingests": k + 1,
                    "n_retracts": prior_retracts}, f)
    os.replace(tmp_meta, meta_path)

    # 4) labels over the CUMULATIVE edge set (minus any retracted docs),
    # assignment over the corpus
    edges = _cache_edges(cache_dir, id_col)
    return _cluster_assign(edges, corpus_ds.select_columns([id_col]),
                           id_col, id_is_int, num_buckets,
                           driver_edge_limit)


def _load_tombstones(cache_dir: str, id_col: str):
    """Cumulative retracted-id array from ``tombstones-*.parquet``
    (None when nothing was ever retracted). Tombstones are id-only and
    small relative to the corpus — they broadcast in task closures the
    way semi-join key sets do; swap for a Bloom filter at extreme
    retraction volume."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    files = sorted(
        f for d in _glob.glob(os.path.join(cache_dir, "tombstones-*"))
        for f in _glob.glob(os.path.join(d, "*.parquet")))
    files += sorted(_glob.glob(
        os.path.join(cache_dir, "tombstones-*.parquet")))
    if not files:
        return None
    import pyarrow as _pa

    t = _pa.concat_tables([_pq.read_table(f, columns=[id_col])
                           for f in files])
    return pd.unique(t[id_col].to_pandas())


def _cache_edges(cache_dir: str, id_col: str):
    """The cache's cumulative verified edge Dataset with every edge
    touching a tombstoned id dropped (edge validity is pairwise, so
    retraction is a pure filter — no re-verification needed)."""
    import glob as _glob
    import os

    import ray.data as rd

    edge_files = sorted(
        f for d in _glob.glob(os.path.join(cache_dir, "edges-*"))
        for f in _glob.glob(os.path.join(d, "*.parquet"))
    )
    if not edge_files:
        return None
    edges = rd.read_parquet(edge_files)
    tomb = _load_tombstones(cache_dir, id_col)
    if tomb is not None and len(tomb):
        tomb_set = set(tomb.tolist())

        def drop(df: pd.DataFrame) -> pd.DataFrame:
            keep = ~(df["id_a"].isin(tomb_set)
                     | df["id_b"].isin(tomb_set))
            return df[keep]

        edges = edges.map_batches(drop, batch_format="pandas")
    return edges.materialize()


def minhash_retract(
    cache_dir: str,
    forget_ids,
    corpus_ds,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    driver_edge_limit: int = 100_000,
):
    """DECREMENTAL near-dup maintenance — the right-to-be-forgotten
    path of :func:`minhash_ingest`: retract a doc-id set from the
    persistent cache and return the cluster assignment for the
    REMAINING corpus (``corpus_ds`` must already exclude the forgotten
    docs). Because band membership and verified-Jaccard edges are both
    per-doc/pairwise properties, retraction never re-signs or
    re-verifies anything: forgotten ids append to a tombstone file,
    the cumulative edge set is filtered at label time, and FUTURE
    ingests skip tombstoned band rows — so the state after any
    ingest/retract interleaving equals a fresh batch run over the
    surviving corpus (pinned by tests)."""
    import hashlib
    import json as _json
    import os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from ..stages.common import arrow_schema

    params = {"n_perm": n_perm, "n_bands": n_bands,
              "shingle_k": shingle_k,
              "jaccard_threshold": jaccard_threshold, "id_col": id_col,
              "text_col": text_col}
    params_fp = hashlib.sha256(
        _json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]
    meta_path = os.path.join(cache_dir, "meta.json")
    if not os.path.exists(meta_path):
        raise ValueError("minhash_retract needs an existing ingest cache")
    with open(meta_path) as f:
        meta = _json.load(f)
    if meta["params_fp"] != params_fp:
        raise ValueError(
            "minhash_retract called with different parameters than the "
            "cache was built with")
    r = int(meta.get("n_retracts", 0))

    ids = pd.Series(list(forget_ids)).drop_duplicates()
    tmp = os.path.join(cache_dir, f".tmp-tombstones-{r:05d}.parquet")
    _pq.write_table(
        pa.table({id_col: pa.array(ids.to_numpy())}), tmp)
    os.replace(tmp, os.path.join(cache_dir,
                                 f"tombstones-{r:05d}.parquet"))
    meta["n_retracts"] = r + 1
    tmp_meta = meta_path + f".tmp.{os.getpid()}"
    with open(tmp_meta, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp_meta, meta_path)

    id_is_int = pa.types.is_integer(
        arrow_schema(corpus_ds).field(id_col).type)
    edges = _cache_edges(cache_dir, id_col)
    return _cluster_assign(edges, corpus_ds.select_columns([id_col]),
                           id_col, id_is_int, num_buckets,
                           driver_edge_limit)


_SIMHASH_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash_batch(texts, seed: int = 11) -> np.ndarray:
    """64-bit SimHash per text over single-space tokens — fully batch-
    vectorized: ONE fixed-key siphash call for every token in the batch
    (seed mixed in arithmetically), bit matrix + ``add.reduceat`` segment
    sums. Process-stable (no PYTHONHASHSEED dependence)."""
    toks: list[str] = []
    starts: list[int] = []
    for t in texts:
        starts.append(len(toks))
        if t:
            toks.extend(t.split(" "))
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if not toks:
        return out
    hashed = pd.util.hash_pandas_object(pd.Series(toks), index=False).to_numpy()
    with np.errstate(over="ignore"):
        hashed = hashed * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)
    # (n_tokens, 64) sign matrix, segment-summed per doc
    bits = ((hashed[:, None] >> _SIMHASH_SHIFTS[None, :]) & np.uint64(1)).astype(
        np.int32
    ) * 2 - 1
    lengths = np.diff(np.r_[starts, len(toks)])
    nonempty = np.flatnonzero(lengths > 0)
    if len(nonempty) == 0:
        return out
    acc = np.add.reduceat(bits, np.asarray(starts)[nonempty], axis=0)
    sig = ((acc > 0).astype(np.uint64) << _SIMHASH_SHIFTS[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = sig
    return out


def simhash64(text: str, seed: int = 11) -> int:
    """Single-doc SimHash (delegates to the batch kernel)."""
    return int(simhash_batch([text], seed)[0])


def add_simhash(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df["simhash"] = [str(s) for s in simhash_batch(list(df[text_col]))]
    return df


def simhash_md5_batch(texts) -> np.ndarray:
    """64-bit SimHash with the token hash = first 8 bytes of md5 —
    bit-for-bit replayable in ANSI SQL (DuckDB:
    ``CAST(CONCAT('0x', substring(md5(tok),1,16)) AS UBIGINT)``), unlike
    the siphash kernel above. Semantics mirror SQL ``string_split``:
    NULL text is treated as ``''`` and ``''.split(' ')`` yields one
    empty token (md5('') is well-defined on both sides), so every input
    row gets a signature. md5 runs once per UNIQUE token in the batch;
    the bit-matrix accumulation is the same vectorized ``reduceat`` as
    :func:`simhash_batch`."""
    import hashlib

    toks: list[str] = []
    starts: list[int] = []
    for t in texts:
        starts.append(len(toks))
        toks.extend((t if isinstance(t, str) else "").split(" "))
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    uniq, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
    h_uniq = np.fromiter(
        (
            int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    hashed = h_uniq[inv]
    bits = ((hashed[:, None] >> _SIMHASH_SHIFTS[None, :]) & np.uint64(1)).astype(
        np.int32
    ) * 2 - 1
    acc = np.add.reduceat(bits, np.asarray(starts), axis=0)
    return ((acc > 0).astype(np.uint64) << _SIMHASH_SHIFTS[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy-1.x compatible)."""
    v = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return np.unpackbits(v).reshape(len(x), 64).sum(axis=1)


def simhash_neardup(
    ds,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 11,
    num_buckets: int = 32,
):
    """SimHash near-duplicate pairs (Hamming distance ≤ ``max_hamming``)
    → Dataset of (id_a, id_b, hamming).

    EXACT by the pigeonhole principle: the 64-bit fingerprint splits into
    ``max_hamming + 1`` blocks; any pair within distance ``max_hamming``
    agrees on at least one whole block, so candidates are generated by a
    per-block bucket groupby (distributed), verified with a vectorized
    popcount, and deduped by (id_a, id_b) — no all-pairs comparison.
    """
    from ..stages.partition import BUCKET_COL, add_bucket

    n_blocks = max_hamming + 1
    block_bits = 64 // n_blocks
    mask = np.uint64((1 << block_bits) - 1)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sig = simhash_batch(list(df[text_col]), seed)
        ids = df[id_col].to_numpy()
        parts = []
        for b in range(n_blocks):
            block = (sig >> np.uint64(b * block_bits)) & mask
            parts.append(pd.DataFrame({
                "block": np.int64(b),
                "block_val": block.astype(np.int64),
                id_col: ids,
                "sig": sig.astype(np.int64),  # int64 view rides the shuffle
            }))
        return pd.concat(parts, ignore_index=True)

    exploded = ds.map_batches(explode, batch_format="pandas")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        dt = _id_dtype(g[id_col])
        out = {"id_a": [], "id_b": [], "hamming": []}
        for _, grp in g.groupby(["block", "block_val"], sort=False):
            if len(grp) < 2:
                continue
            grp = grp.drop_duplicates(id_col).sort_values(id_col)
            ids = grp[id_col].to_numpy()
            sigs = grp["sig"].to_numpy().astype(np.uint64)
            ai, bi = np.triu_indices(len(ids), k=1)
            ham = _popcount64(sigs[ai] ^ sigs[bi])
            keep = ham <= max_hamming
            out["id_a"].extend(ids[ai[keep]])
            out["id_b"].extend(ids[bi[keep]])
            out["hamming"].extend(ham[keep])
        return pd.DataFrame({
            "id_a": pd.Series(out["id_a"], dtype=dt),
            "id_b": pd.Series(out["id_b"], dtype=dt),
            "hamming": pd.Series(out["hamming"], dtype="int64"),
        })

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        df["_nd_bucket"] = (
            pd.util.hash_pandas_object(df["block_val"], index=False)
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return df

    from ..stages.partition import bucket_exchange

    cand = bucket_exchange(
        exploded.map_batches(coarse, batch_format="pandas"),
        ["_nd_bucket"], candidates, num_buckets, bucket_col="_nd_bucket",
    )
    # same pair can match on several blocks → global dedup, one shuffle
    return bucket_exchange(
        cand,
        ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]).drop(
            columns=[BUCKET_COL, "_nd_bucket"], errors="ignore"
        ),
        num_buckets,
    )


def _lsh_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Random hyperplanes, pure in (seed, dim, n_planes) — every task can
    regenerate them locally (cheaper than a broadcast for 16 KB)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, dim, n_planes]))
    return rng.normal(size=(dim, n_planes))


def lsh_cosine_pairs(
    ds,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes_per_band: int = 8,
    n_bands: int = 32,
    seed: int = 37,
    num_buckets: int = 16,
):
    """Banded random-hyperplane LSH near-dup pairs with EXACT in-bucket
    verify → Dataset of (id_a, id_b, cos_sim), id_a < id_b.

    The corpus-scale replacement for :func:`cosine_pairs`: each vector
    emits one (band, code) key per band (code = its r sign bits on that
    band's hyperplanes); candidates co-bucket by key and are verified
    with an exact float64 cosine, so precision is 1 by construction.
    Per-pair recall is 1-(1-p^r)^b with p = 1-θ/π — at r=8, b=32 a
    0.93-similar pair is missed w.p. ~7e-7; tune (r, b) per threshold.

    Scale shape: NO all-pairs stage. Vectors cross the wire n_bands
    times (band fan-out) into one bucketed exchange; in-bucket work is
    pairwise only WITHIN a (band, code) group, whose expected size is
    n/2^r — raise r for bigger corpora (and b with it to hold recall).
    A second small exchange dedups (id_a, id_b) across bands."""
    import math

    from ..stages.partition import bucket_exchange

    r, b = n_planes_per_band, n_bands
    # fail LOUDLY when (r, b) cannot see threshold-grazing pairs: a pair
    # at exactly `threshold` collides with probability 1-(1-p^r)^b; below
    # ~99.9% the edge set visibly diverges from all-pairs and clusters
    # silently split. Hyperplane LSH simply cannot serve low thresholds —
    # callers there want edges="allpairs" (guarded) or a bigger b.
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    recall_at_threshold = 1.0 - (1.0 - p**r) ** b
    if recall_at_threshold < 0.999:
        raise ValueError(
            f"lsh_cosine_pairs(threshold={threshold}, r={r}, b={b}) has "
            f"per-pair recall {recall_at_threshold:.4f} < 0.999 at the "
            "threshold; raise n_bands / lower n_planes_per_band, use a "
            "higher threshold, or fall back to the all-pairs oracle"
        )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            # keep the id column's SOURCE dtype (a null-typed empty block
            # poisons downstream Arrow concat — round-3 lesson)
            return pd.DataFrame(
                {
                    "band": pd.Series(dtype="int64"),
                    "code": pd.Series(dtype="int64"),
                    id_col: df[id_col] if id_col in df.columns
                    else pd.Series(dtype="int64"),
                    vec_col: pd.Series(dtype="object"),
                }
            )
        V = np.array(df[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        V = V / np.where(norms == 0, 1.0, norms)
        planes = _lsh_planes(V.shape[1], r * b, seed)
        bits = (V @ planes) > 0  # n × (r·b)
        codes = (
            bits.reshape(len(V), b, r) << np.arange(r, dtype=np.int64)
        ).sum(axis=2)  # n × b ints in [0, 2^r)
        n = len(V)
        return pd.DataFrame(
            {
                "band": np.repeat(np.arange(b, dtype=np.int64), n),
                "code": codes.T.reshape(-1),
                id_col: np.tile(df[id_col].to_numpy(), b),
                vec_col: [v for _ in range(b) for v in V],
            }
        )

    exploded = ds.map_batches(explode, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        dt = _id_dtype(g[id_col])
        out_a, out_b, out_s = [], [], []
        # MUST group by the true key inside the kernel: distinct
        # (band, code) keys hash-collide into one bucket frame
        for _, grp in g.groupby(["band", "code"], sort=False):
            if len(grp) < 2:
                continue
            grp = grp.drop_duplicates(id_col).sort_values(id_col)
            if len(grp) < 2:
                continue
            ids = grp[id_col].to_numpy()
            M = np.array(grp[vec_col].tolist(), dtype=np.float64)
            S = M @ M.T  # rows already unit-norm from explode
            ai, bi = np.triu_indices(len(ids), k=1)
            keep = S[ai, bi] >= threshold
            out_a.extend(ids[ai[keep]])
            out_b.extend(ids[bi[keep]])
            out_s.extend(S[ai[keep], bi[keep]])
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype=dt),
                "id_b": pd.Series(out_b, dtype=dt),
                "cos_sim": pd.Series(out_s, dtype="float64"),
            }
        )

    cand = bucket_exchange(
        exploded, ["band", "code"], verify, num_buckets
    )
    # a pair can match in several bands → one global (id_a, id_b) dedup
    from ..stages.partition import BUCKET_COL

    return bucket_exchange(
        cand,
        ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]).drop(
            columns=[BUCKET_COL], errors="ignore"
        ),
        num_buckets,
    )


def cosine_neardup_clusters(
    ds,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 16,
    edges: str = "lsh",
    **lsh_kwargs,
):
    """Embedding-cosine near-duplicate CLUSTERS → Dataset of
    (id, cluster), cluster = min id of the connected component of the
    cosine ≥ threshold graph.

    Edge generation defaults to the bucketed banded-LSH + exact-verify
    path (:func:`lsh_cosine_pairs` — the corpus-scale route; tune
    ``n_planes_per_band``/``n_bands`` to the threshold);
    ``edges="allpairs"`` keeps the guarded broadcast-matmul oracle
    (:func:`cosine_pairs`) that pins LSH recall at small scale.
    Component labels converge by the same distributed min-label
    propagation as MinHash clustering, and are written back onto the
    ids by one co-bucketed exchange — the driver holds only edge
    COUNTS, never the label map. SQL-reproducible: a DuckDB
    recursive CTE computes the identical min-label components (see
    SQL_COSINE_CLUSTERS)."""
    import pyarrow as pa

    from ..stages.common import arrow_schema

    if edges == "allpairs":
        if lsh_kwargs:
            raise ValueError(
                f"LSH tuning options {sorted(lsh_kwargs)} have no effect "
                "with edges='allpairs' — refusing to silently drop them"
            )
        edge_ds = cosine_pairs(ds, threshold, id_col, vec_col)
    else:
        edge_ds = lsh_cosine_pairs(
            ds, threshold, id_col, vec_col, num_buckets=num_buckets, **lsh_kwargs
        )
    edge_mat = edge_ds.materialize()
    n_edges = edge_mat.count()
    id_is_int = pa.types.is_integer(arrow_schema(ds).field(id_col).type)
    ids_only = ds.select_columns([id_col])
    if n_edges == 0:
        cast = (lambda s: s.astype("int64")) if id_is_int else (
            lambda s: s.astype(object)
        )
        return ids_only.map_batches(
            lambda df: pd.DataFrame({id_col: cast(df[id_col]),
                                     "cluster": cast(df[id_col])}),
            batch_format="pandas",
        )
    nb = int(min(num_buckets, max(2, n_edges // 50_000 + 2)))
    labels_ds = _min_label_propagation(
        edge_mat.select_columns(["id_a", "id_b"]), nb, id_is_int=id_is_int
    )
    return _labels_write_back(ids_only, id_col, labels_ds, num_buckets,
                              id_is_int)


#: all-pairs oracles are quadratic BY DESIGN (they pin LSH/MinHash recall at
#: small scale); refuse corpora where that shape stops being an oracle
ALLPAIRS_MAX_ROWS = 100_000


def _allpairs_guard(n_rows: int, fn_name: str) -> None:
    if n_rows > ALLPAIRS_MAX_ROWS:
        raise ValueError(
            f"{fn_name} is an ALL-PAIRS small-scale oracle "
            f"(O(n²) similarity) and refuses {n_rows} rows "
            f"(cap {ALLPAIRS_MAX_ROWS}); use minhash_clusters / "
            "simhash_neardup / cosine_neardup_clusters for real corpora"
        )


def char_jaccard_pairs(
    ds,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """All-pairs character-set Jaccard ≥ threshold (id_a < id_b).

    Definition == DuckDB ``jaccard(a, b)``: case-sensitive distinct-char
    sets. Right side broadcast once as a (rows × char-vocab) membership
    matrix; each batch computes every intersection with ONE matmul — no
    per-row Python set ops. Guarded: this is the exact small-scale
    baseline that pins the LSH path, not a corpus-scale operator.
    """
    import ray

    _allpairs_guard(ds.count(), "char_jaccard_pairs")  # BEFORE materializing
    full = ds.select_columns([id_col, text_col]).to_pandas()
    sets_r = [set(t or "") for t in full[text_col]]
    vocab = {c: i for i, c in enumerate(sorted(set().union(*sets_r) if sets_r else []))}
    R = np.zeros((len(full), max(len(vocab), 1)), dtype=np.int32)
    for j, s in enumerate(sets_r):
        if s:
            R[j, [vocab[c] for c in s]] = 1
    sizes_r = R.sum(axis=1)
    ref = ray.put((full[id_col].to_numpy(), vocab, R, sizes_r))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_r, vocab_, R_, sizes_r_ = ray.get(ref)
        ids_l = df[id_col].to_numpy()
        L = np.zeros((len(df), R_.shape[1]), dtype=np.int32)
        sizes_l = np.zeros(len(df), dtype=np.int64)
        for i, text in enumerate(df[text_col]):
            s = set(text or "")
            sizes_l[i] = len(s)  # includes chars outside the right vocab
            idx = [vocab_[c] for c in s if c in vocab_]
            if idx:
                L[i, idx] = 1
        inter = L @ R_.T
        union = sizes_l[:, None] + sizes_r_[None, :] - inter
        with np.errstate(invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        qi, ri = np.where((jac >= threshold) & (ids_l[:, None] < ids_r[None, :]))
        return pd.DataFrame(
            {
                "id_a": ids_l[qi],
                "id_b": ids_r[ri],
                # python round on the few survivors only (decimal-correct,
                # matches the oracle's ROUND semantics for these values)
                "jac": pd.Series(
                    [round(float(v), 6) for v in jac[qi, ri]], dtype="float64"
                ),
            }
        )

    return ds.map_batches(pairs, batch_format="pandas")


def ngram_jaccard_pairs(
    ds,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """All-pairs word n-gram Jaccard ≥ threshold (id_a < id_b).

    Token n-grams over single-space splits (SQL-reproducible: DuckDB
    list comprehension + list_intersect/list_distinct). Right side is
    broadcast once as an INVERTED INDEX (gram → array of right-row
    positions); per left row, one ``bincount`` over the concatenated
    posting hits yields every intersection size at once — sparse-set
    intersection instead of a per-row × corpus Python loop. Guarded:
    the exact small-scale oracle; MinHash-LSH is the scale path (its
    shingles are the character analogue of these n-grams).
    """
    import ray

    def grams(text: str) -> frozenset:
        toks = (text or "").split(" ")
        if len(toks) < n:
            return frozenset([" ".join(toks)] if toks != [""] else [])
        return frozenset(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    _allpairs_guard(ds.count(), "ngram_jaccard_pairs")  # BEFORE materializing
    full = ds.select_columns([id_col, text_col]).to_pandas()
    sets_r = [grams(t) for t in full[text_col]]
    postings_lists: dict[str, list[int]] = {}
    for j, s in enumerate(sets_r):
        for g in s:
            postings_lists.setdefault(g, []).append(j)
    postings = {g: np.asarray(v, dtype=np.int64) for g, v in postings_lists.items()}
    sizes_r = np.array([len(s) for s in sets_r], dtype=np.int64)
    ref = ray.put((full[id_col].to_numpy(), postings, sizes_r))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_r, postings_, sizes_r_ = ray.get(ref)
        n_r = len(ids_r)
        dt = _id_dtype(df[id_col])
        out_a, out_b, out_j = [], [], []
        for rid, text in zip(df[id_col], df[text_col]):
            s = grams(text)
            hits = [postings_[g] for g in s if g in postings_]
            inter = (
                np.bincount(np.concatenate(hits), minlength=n_r)
                if hits
                else np.zeros(n_r, dtype=np.int64)
            )
            union = len(s) + sizes_r_ - inter
            with np.errstate(invalid="ignore"):
                jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            sel = np.where((jac >= threshold) & (rid < ids_r))[0]
            out_a.extend([rid] * len(sel))
            out_b.extend(ids_r[sel])
            out_j.extend(round(float(v), 6) for v in jac[sel])
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=dt),
            "id_b": pd.Series(out_b, dtype=dt),
            "jac": pd.Series(out_j, dtype="float64"),
        })

    return ds.map_batches(pairs, batch_format="pandas")


def cosine_pairs(
    ds,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """All-pairs embedding cosine ≥ threshold (id_a < id_b), float64 math
    (== DuckDB ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``).

    Right matrix broadcast once (normalized); per-batch numpy matmul.
    Guarded like the Jaccard oracles — the LSH-bucketed edge path in
    :func:`cosine_neardup_clusters` is the corpus-scale route."""
    import ray

    _allpairs_guard(ds.count(), "cosine_pairs")  # BEFORE materializing
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    M = np.array(full[vec_col].tolist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((full[id_col].to_numpy(), M))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_r, Mr = ray.get(ref)
        Q = np.array(df[vec_col].tolist(), dtype=np.float64)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        S = Q @ Mr.T
        qi, ri = np.where(S >= threshold)
        ids_q = df[id_col].to_numpy()
        mask = ids_q[qi] < ids_r[ri]
        return pd.DataFrame(
            {
                "id_a": ids_q[qi][mask],
                "id_b": ids_r[ri][mask],
                "cos_sim": S[qi, ri][mask],
            }
        )

    return ds.map_batches(pairs, batch_format="pandas")


def _is_edit1(a: str, b: str) -> bool:
    """Exact edit-distance == 1 check (lengths within 1 by construction)."""
    if a == b:
        return False
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) == 1
    if len(a) > len(b):
        a, b = b, a  # a shorter
    # b must equal a with ONE insertion: advance past the single skip
    i = 0
    while i < len(a) and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit_distance_pairs(
    ds,
    col: str,
    num_buckets: int | None = None,
):
    """Distance-1 string similarity join (typo/variant detection) via
    FastSS deletion-variant blocking — NO all-pairs compare at any
    stage: two strings at edit distance ≤ 1 share a deletion variant
    (delete the differing/inserted position; a string is also its own
    variant), so candidate pairs come from ONE exchange keyed by
    variant. Per-bucket pair generation touches only same-variant
    groups; a second tiny exchange dedups pairs found under multiple
    shared variants; the exact distance==1 verify (vectorized-safe,
    per-candidate) removes the distance-2 false positives blocking
    admits (e.g. 'ab'/'ba'). Output (w_a, w_b), w_a < w_b.

    Input: one DISTINCT string per row in *col* (dedupe upstream).
    Scale shape: variants per string = O(len); candidates are bounded
    by true near-pairs plus same-variant collisions — linear in the
    vocabulary, never quadratic.
    """
    from ..stages.partition import bucket_exchange

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        ws, vs = [], []
        for w in df[col]:
            if w is None:
                continue
            ws.append(w)
            vs.append(w)  # identity variant: catches pure insertions
            for i in range(len(w)):
                ws.append(w)
                vs.append(w[:i] + w[i + 1:])
        return pd.DataFrame({"w": pd.array(ws, dtype=object),
                             "v": pd.array(vs, dtype=object)})

    var = ds.map_batches(variants, batch_format="pandas")

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("v", sort=False):
            ws = sorted(set(g["w"]))
            if len(ws) < 2:
                continue
            for i in range(len(ws)):
                for j in range(i + 1, len(ws)):
                    # same-variant strings differ in length by ≤ 2;
                    # cheap length gate before the exact check
                    if abs(len(ws[i]) - len(ws[j])) <= 1:
                        out_a.append(ws[i])
                        out_b.append(ws[j])
        return pd.DataFrame({"w_a": pd.array(out_a, dtype=object),
                             "w_b": pd.array(out_b, dtype=object)})

    cand = bucket_exchange(var, ["v"], pairs_in_bucket, num_buckets)

    def dedup_verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["w_a", "w_b"])
        keep = [_is_edit1(a, b) for a, b in zip(df["w_a"], df["w_b"])]
        return df[np.asarray(keep, dtype=bool)] if len(df) else df

    return bucket_exchange(cand, ["w_a", "w_b"], dedup_verify, num_buckets)


def _word_ngrams_set(text: str, n: int) -> frozenset:
    """Distinct word n-grams over single-space splits — the SAME gram
    definition as :func:`ngram_jaccard_pairs` (and its DuckDB list-
    comprehension twin), so PPJoin's exact output equals the all-pairs
    oracle."""
    toks = (text or "").split(" ")
    if len(toks) < n:
        return frozenset([" ".join(toks)] if toks != [""] else [])
    return frozenset(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def ppjoin_pairs(
    ds,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
):
    """EXACT set-similarity self-join (word n-gram Jaccard ≥ threshold)
    via PREFIX FILTERING (PPJoin, Xiao et al. 2008) — the scale path the
    guarded all-pairs :func:`ngram_jaccard_pairs` oracle pins, with NO
    recall loss (unlike MinHash): prefix filtering is lossless, so the
    output is bit-identical to the all-pairs result.

    Physical plan — every stage bounded, never an all-pairs product:

    1. distinct (id, gram) pairs explode per batch (text stays behind);
    2. global gram document frequencies — one vocabulary-sized combine;
    3. a partitioned hash join attaches df to each (id, gram) pair
       (both sides stay distributed — no broadcast vocabulary);
    4. one exchange by id reassembles each doc's grams RAREST-FIRST
       (order by (df, gram)); only the first ``|x| − ceil(t·|x|) + 1``
       grams are emitted as prefix postings — two sets with Jaccard ≥ t
       MUST share a prefix gram (pigeonhole on the ``(1−t)·|x|``
       allowed misses), so candidates have no false negatives;
    5. one exchange by gram emits candidate pairs per posting list,
       pruned by the length filter ``t·|x| ≤ |y| ≤ |x|/t``; rare-first
       ordering keeps posting lists short (common grams almost never
       reach a prefix);
    6. candidates dedup in one pass, then the bucketed two-probe text
       verify computes the EXACT Jaccard (texts cross the wire once).

    Returns (id_a, id_b, jac) with id_a < id_b, jac rounded to 6."""
    import math

    from .relational import grouped_agg, hash_join
    from ..stages.partition import BUCKET_COL, bucket_exchange

    sub = ds.select_columns([id_col, text_col]).materialize()

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for rid, t in zip(df[id_col], df[text_col]):
            for g in _word_ngrams_set(t, n):
                ids.append(rid)
                grams.append(g)
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype=_id_dtype(df[id_col])),
            "gram": pd.Series(grams, dtype=object),
        })

    pair_ds = sub.map_batches(gram_rows, batch_format="pandas").materialize()

    dfreq = grouped_agg(
        pair_ds.map_batches(
            lambda d: d.assign(df=np.int64(1))[["gram", "df"]],
            batch_format="pandas",
        ),
        ["gram"], {"df": ("df", "sum")},
        num_buckets=num_buckets,
    )
    with_df = hash_join(pair_ds, dfreq, on="gram", num_buckets=num_buckets)

    def prefixes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        out = []
        for rid, g in df.groupby(id_col, sort=False):
            g = g.sort_values(["df", "gram"], kind="mergesort")
            size = len(g)
            p = size - math.ceil(threshold * size) + 1
            head = g.head(p)
            out.append(pd.DataFrame({
                "gram": head["gram"].to_numpy(dtype=object),
                "pid": np.full(len(head), rid),
                "size": np.full(len(head), size, dtype=np.int64),
            }))
        return (pd.concat(out, ignore_index=True) if out
                else pd.DataFrame({"gram": pd.Series(dtype=object),
                                   "pid": pd.Series(dtype="int64"),
                                   "size": pd.Series(dtype="int64")}))

    prefix_ds = bucket_exchange(with_df, [id_col], prefixes, num_buckets)

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        out_a, out_b = [], []
        for _, g in df.groupby("gram", sort=False):
            g = g.drop_duplicates("pid")
            if len(g) < 2:
                continue
            ids = g["pid"].to_numpy()
            sizes = g["size"].to_numpy(dtype=np.float64)
            ai, bi = np.triu_indices(len(ids), k=1)
            # canonical id_a < id_b + length filter (Jaccard ≥ t forces
            # t·max(|x|,|y|) ≤ min(|x|,|y|))
            lo = np.minimum(ids[ai], ids[bi])
            hi = np.maximum(ids[ai], ids[bi])
            smin = np.minimum(sizes[ai], sizes[bi])
            smax = np.maximum(sizes[ai], sizes[bi])
            keep = (lo != hi) & (smin >= threshold * smax)
            out_a.append(lo[keep])
            out_b.append(hi[keep])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)
        }).drop_duplicates()

    cand = bucket_exchange(prefix_ds, ["gram"], candidates, num_buckets)
    cand = bucket_exchange(
        cand, ["id_a"],
        lambda d: d.drop(columns=[BUCKET_COL], errors="ignore")
                   .drop_duplicates(["id_a", "id_b"]),
        num_buckets,
    )
    return _bucketed_text_verify(
        cand, sub, id_col, text_col, shingle_k=0,
        jaccard_threshold=threshold, num_buckets=num_buckets,
        sim_fn=_make_ngram_sim(n), emit_sim=True,
    )


def _make_ngram_sim(n: int):
    """Top-level (picklable) word-n-gram Jaccard for the verify stage."""
    def sim(a: str, b: str) -> float:
        sa, sb = _word_ngrams_set(a, n), _word_ngrams_set(b, n)
        union = len(sa | sb)
        if union == 0:
            return 1.0
        return len(sa & sb) / union
    return sim


__all__ = [
    "MinHasher",
    "lsh_bands",
    "minhash_clusters",
    "minhash_ingest",
    "minhash_retract",
    "simhash_batch",
    "simhash64",
    "add_simhash",
    "simhash_neardup",
    "char_jaccard_pairs",
    "ngram_jaccard_pairs",
    "cosine_pairs",
    "lsh_cosine_pairs",
    "cosine_neardup_clusters",
    "edit_distance_pairs",
]
