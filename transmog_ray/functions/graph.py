"""Distributed graph analytics over edge Datasets.

PageRank here is the Pregel-shaped power iteration: the edge set is
hash-partitioned by source ONCE and pinned in the object store; every
iteration ships only O(nodes) rank partials (map-side split with
in-task combining), never an edge. That is the shape that survives a
100 TB web graph — edge movement is the dominant cost and it happens
exactly once, at load. (Connected components live in
:mod:`transmog_ray.functions.neardup` as distributed min-label
propagation; this module hosts the rank-style iterations.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
    num_buckets: int | None = None,
):
    """PageRank power iteration over an edge Dataset:

    ``r_{t+1}(v) = (1 - d)/N + d · Σ_{u→v} r_t(u)/outdeg(u)``

    Physical plan (raw-task, Pregel-shaped — the Dataset API cannot
    express "partition once, iterate in place", SURVEY.md §2 custom
    operator rule (c)):

    * ONE edge exchange: blocks split by ``hash(src)`` as they stream
      out of the upstream plan; per src-bucket the prep task dedups
      edges, computes ``w = 1/outdeg`` locally (a source never spans
      buckets), and pre-splits its distinct ``dst`` values by
      ``hash(dst)`` for the node-set build. Edges then STAY PUT.
    * node sets: per bucket, unique sources ∪ routed sinks — aligned
      with the edge buckets because ranks and sources share the hash.
    * per iteration: a contrib task per bucket merges the co-bucketed
      ranks onto its pinned edges, pre-sums ``w·r`` per ``dst``
      (in-task combiner) and splits the partials by ``hash(dst)``; an
      update task per bucket sums its partials and applies the base
      term against the node set. Only rank partials cross the wire —
      O(nodes · buckets) per iteration, zero edge movement.

    Dangling nodes (no out-edges) leak their mass — the simplified
    textbook variant, chosen because an unrolled SQL oracle computes
    the identical closed form. Returns a Dataset of ``(node, pr)``.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..stages.partition import (
        DEFAULT_MAX_FANIN, _GroupedColumns, _tree_concat, default_num_buckets,
        split_frame_by_hash,
    )

    if num_buckets is None:
        num_buckets = default_num_buckets()
    nb = num_buckets

    def _hash_split(df: pd.DataFrame, col: str) -> tuple:
        return split_frame_by_hash(df, col, nb)

    @ray.remote(num_returns=nb)
    def split_edges(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0:
            parts = tuple(block for _ in range(nb))
            return parts if nb > 1 else parts[0]
        df = block.select([src, dst]).to_pandas().drop_duplicates([src, dst])
        parts = _hash_split(df, src)
        return parts if nb > 1 else parts[0]

    @ray.remote(num_returns=nb + 2)
    def prep_bucket(*parts):
        """Distinct edges + local out-degree weights for one src-bucket;
        also emits the bucket's unique sources (node set, already in
        the right bucket) and its sinks routed by hash(dst)."""
        live = [p for p in parts if p.num_rows]
        if live:
            df = pa.concat_tables(live).to_pandas().drop_duplicates([src, dst])
        else:
            df = pd.DataFrame({src: pd.Series(dtype=object),
                               dst: pd.Series(dtype=object)})
        deg = df.groupby(src, sort=False)[dst].transform("size")
        edges = df.assign(w=1.0 / deg.to_numpy(np.float64))
        srcs = pd.DataFrame({"node": df[src].drop_duplicates()})
        dst_parts = _hash_split(
            pd.DataFrame({"node": df[dst].drop_duplicates()}), "node"
        )
        return (pa.Table.from_pandas(edges, preserve_index=False),
                pa.Table.from_pandas(srcs, preserve_index=False),
                *dst_parts)

    @ray.remote(num_returns=2)
    def node_bucket(src_nodes, *dst_parts):
        frames = [src_nodes.to_pandas()]
        frames += [p.to_pandas() for p in dst_parts if p.num_rows]
        nodes = pd.concat(frames, ignore_index=True).drop_duplicates("node")
        return pa.Table.from_pandas(nodes, preserve_index=False), len(nodes)

    @ray.remote
    def init_ranks(nodes, n):
        df = nodes.to_pandas()
        df["r"] = 1.0 / n
        return pa.Table.from_pandas(df, preserve_index=False)

    @ray.remote(num_returns=nb)
    def contrib(edges, ranks):
        e = edges.to_pandas()
        r = ranks.to_pandas().rename(columns={"node": src})
        m = e.merge(r, on=src, how="inner")
        part = (
            m.assign(part=m["w"] * m["r"])
            .groupby(dst, sort=False)["part"].sum().reset_index()
            .rename(columns={dst: "node"})
        )
        parts = _hash_split(part, "node")
        return parts if nb > 1 else parts[0]

    @ray.remote
    def update(nodes, n, *parts):
        live = [p.to_pandas() for p in parts if p.num_rows]
        base = (1.0 - damping) / n
        out = nodes.to_pandas()
        if live:
            c = (
                pd.concat(live, ignore_index=True)
                .groupby("node", sort=False)["part"].sum()
            )
            contrib_vals = out["node"].map(c).fillna(0.0).to_numpy(np.float64)
        else:
            contrib_vals = np.zeros(len(out))
        out["r"] = base + damping * contrib_vals
        return pa.Table.from_pandas(out, preserve_index=False)

    # --- one streaming edge exchange (edges move exactly once) ---
    grouped = _GroupedColumns(nb, DEFAULT_MAX_FANIN)
    empty = True
    for bundle in edges_ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            refs = split_edges.remote(block_ref)
            grouped.add([refs] if nb == 1 else refs)
            empty = False
    if empty:
        return rd.from_items([])
    cols = grouped.finish()

    e_refs, s_refs = [], []
    dst_matrix: list[list] = [[] for _ in range(nb)]
    for b in range(nb):
        outs = prep_bucket.remote(*_tree_concat(cols[b], DEFAULT_MAX_FANIN))
        e_refs.append(outs[0])
        s_refs.append(outs[1])
        for b2 in range(nb):
            dst_matrix[b2].append(outs[2 + b2])

    n_refs, counts = [], []
    for b in range(nb):
        t, c = node_bucket.remote(
            s_refs[b], *_tree_concat(dst_matrix[b], DEFAULT_MAX_FANIN)
        )
        n_refs.append(t)
        counts.append(c)
    n = float(sum(ray.get(counts)))
    if n == 0:  # blocks existed but carried no rows (e.g. filtered-out)
        return rd.from_items([])

    r_refs = [init_ranks.remote(n_refs[b], n) for b in range(nb)]
    for _ in range(iterations):
        part_matrix: list[list] = [[] for _ in range(nb)]
        for b in range(nb):
            outs = contrib.remote(e_refs[b], r_refs[b])
            outs = [outs] if nb == 1 else outs
            for b2 in range(nb):
                part_matrix[b2].append(outs[b2])
        r_refs = [
            update.remote(
                n_refs[b], n, *_tree_concat(part_matrix[b], DEFAULT_MAX_FANIN)
            )
            for b in range(nb)
        ]

    return rd.from_arrow_refs(r_refs).map_batches(
        lambda df: df.rename(columns={"r": "pr"}), batch_format="pandas"
    )


def triangle_counts(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 16,
):
    """Distributed per-node triangle counting (node-iterator / wedge
    closure) → Dataset of (node, n_triangles), nodes in ≥ 1 triangle.

    Physical plan — three bounded exchanges, never an all-pairs stage:

    1. edge dedup to distinct undirected (a < b) pairs;
    2. WEDGE generation: symmetric edges route by center node; each
       center emits its neighbor pairs (v < w) — volume Σ C(deg, 2),
       the algorithm's intrinsic cost (salt/split hot nodes upstream
       if degree skew bites);
    3. wedge CLOSURE: wedges and edges co-bucket by the (v, w) pair
       hash; a wedge closes iff its pair is an edge. A triangle
       {a<b<c} closes exactly one wedge centered at each vertex, so
       per-center closed-wedge counts ARE per-node triangle counts —
       only O(nodes) partials leave the closure tasks, combined by one
       tiny grouped aggregation.

    SQL-reproducible: a 3-way self-join over the distinct edge list
    (see SQL_TRIANGLE_SUPPLIERS)."""
    from .relational import grouped_agg
    from ..stages.partition import BUCKET_COL, bucket_exchange

    def canon_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df[[src, dst]].dropna()
        lo = a.min(axis=1).astype("int64")
        hi = a.max(axis=1).astype("int64")
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[out["a"] != out["b"]].drop_duplicates()

    dedup = bucket_exchange(
        edges_ds.map_batches(canon_pairs, batch_format="pandas"),
        ["a", "b"],
        lambda df: df.drop_duplicates(["a", "b"]).drop(
            columns=[BUCKET_COL], errors="ignore"
        ),
        num_buckets,
    ).materialize()  # consumed twice: wedge source + closure side

    def symmetric(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [df.rename(columns={"a": "node", "b": "nbr"}),
             df.rename(columns={"b": "node", "a": "nbr"})],
            ignore_index=True,
        )[["node", "nbr"]]

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        out_u, out_v, out_w = [], [], []
        # group by the TRUE key inside the kernel: distinct nodes
        # hash-collide into one bucket frame
        for node, grp in df.groupby("node", sort=False):
            nbrs = np.unique(grp["nbr"].to_numpy())
            if len(nbrs) < 2:
                continue
            vi, wi = np.triu_indices(len(nbrs), k=1)
            out_u.append(np.full(len(vi), node, dtype=np.int64))
            out_v.append(nbrs[vi])
            out_w.append(nbrs[wi])
        if not out_u:
            return pd.DataFrame({
                "u": pd.Series(dtype="int64"),
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "kind": pd.Series(dtype="int64"),
            })
        return pd.DataFrame({
            "u": np.concatenate(out_u),
            "a": np.concatenate(out_v),
            "b": np.concatenate(out_w),
            "kind": np.int64(0),
        })

    wedge_ds = bucket_exchange(
        dedup.map_batches(symmetric, batch_format="pandas"),
        ["node"], wedges, num_buckets,
    )
    # tag edges with the same schema (u = -1 sentinel keeps int64 —
    # null-padding would promote the column to float and split dtypes)
    edge_tagged = dedup.map_batches(
        lambda df: df[["a", "b"]].assign(u=np.int64(-1), kind=np.int64(1))[
            ["u", "a", "b", "kind"]
        ],
        batch_format="pandas",
    )

    def close(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["kind"] == 0]
        e = df[df["kind"] == 1]
        if not len(w) or not len(e):
            return pd.DataFrame({
                "node": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
            })
        eidx = pd.MultiIndex.from_arrays([e["a"], e["b"]])
        widx = pd.MultiIndex.from_arrays([w["a"], w["b"]])
        closed = w[widx.isin(eidx)]
        out = closed.groupby("u", sort=False).size().rename("n").reset_index()
        return out.rename(columns={"u": "node"}).astype(
            {"node": "int64", "n": "int64"}
        )

    partials = bucket_exchange(
        wedge_ds.union(edge_tagged), ["a", "b"], close, num_buckets,
    )
    return grouped_agg(partials, ["node"], {"n_triangles": ("n", "sum")},
                       num_buckets=min(num_buckets, 8))


def two_hop_counts(
    edges_ds,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 16,
):
    """Distinct 2-hop (friends-of-friends) neighbor count per node:
    ``|{w : dist(v, w) = 2}|`` — vertices reachable through some shared
    neighbor but NOT adjacent. Dataset of (node, n_two_hop).

    Plan (same bounded-exchange shape as :func:`triangle_counts`):

    1. edge dedup to distinct undirected (a < b) pairs;
    2. wedge pairs by center — every unordered neighbor pair (v < w) of
       each center is a 2-hop CANDIDATE (volume Σ C(deg, 2));
    3. candidates and the edge set co-bucket by the (a, b) hash; a
       candidate survives iff it is NOT an edge (distributed anti-join
       in the same pass as the dedup);
    4. each surviving pair contributes one 2-hop neighbor to BOTH
       endpoints — a tiny per-node combine.
    """
    from .relational import grouped_agg
    from ..stages.partition import BUCKET_COL, bucket_exchange

    def canon_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df[[src, dst]].dropna()
        lo = a.min(axis=1).astype("int64")
        hi = a.max(axis=1).astype("int64")
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[out["a"] != out["b"]].drop_duplicates()

    dedup = bucket_exchange(
        edges_ds.map_batches(canon_pairs, batch_format="pandas"),
        ["a", "b"],
        lambda df: df.drop_duplicates(["a", "b"]).drop(
            columns=[BUCKET_COL], errors="ignore"
        ),
        num_buckets,
    ).materialize()

    def symmetric(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [df.rename(columns={"a": "node", "b": "nbr"}),
             df.rename(columns={"b": "node", "a": "nbr"})],
            ignore_index=True,
        )[["node", "nbr"]]

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in df.groupby("node", sort=False):
            nbrs = np.unique(grp["nbr"].to_numpy())
            if len(nbrs) < 2:
                continue
            vi, wi = np.triu_indices(len(nbrs), k=1)
            out_a.append(nbrs[vi])
            out_b.append(nbrs[wi])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "kind": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "a": np.concatenate(out_a), "b": np.concatenate(out_b),
            "kind": np.int64(0),
        }).drop_duplicates(["a", "b"])

    cand = bucket_exchange(
        dedup.map_batches(symmetric, batch_format="pandas"),
        ["node"], wedge_pairs, num_buckets,
    )
    edge_tagged = dedup.map_batches(
        lambda d: d.assign(kind=np.int64(1))[["a", "b", "kind"]],
        batch_format="pandas",
    )

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        # keep candidate pairs (kind 0) whose (a,b) never appears as an
        # edge row (kind 1); candidates were deduped per wedge task, so
        # dedup again across tasks first
        flag = df.groupby(["a", "b"], sort=False)["kind"].max()
        keep = flag[flag == 0].index
        out = pd.DataFrame(keep.tolist(), columns=["a", "b"])
        return out.astype({"a": "int64", "b": "int64"})

    nond = bucket_exchange(cand.union(edge_tagged), ["a", "b"], anti,
                           num_buckets)

    def explode_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": np.concatenate([df["a"].to_numpy(np.int64),
                                    df["b"].to_numpy(np.int64)]),
            "n_two_hop": np.int64(1),
        })

    return grouped_agg(
        nond.map_batches(explode_nodes, batch_format="pandas"),
        ["node"], {"n_two_hop": ("n_two_hop", "sum")},
        num_buckets=min(num_buckets, 8),
    )


__all__ = ["pagerank", "triangle_counts", "two_hop_counts"]
