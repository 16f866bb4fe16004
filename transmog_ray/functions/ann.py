"""Approximate nearest-neighbor search over an embedding column.

* :func:`brute_topk` — exact cosine top-k baseline: the query matrix is
  normalized once and broadcast (``ray.put``); every corpus batch does one
  numpy matmul and emits its LOCAL top-k per query; a tiny global
  reduction keeps the true top-k. Per-batch work is O(batch × queries);
  shuffle traffic is O(k × queries × num_batches) — independent of corpus
  size.
* :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets the
  corpus; only same-bucket (± multi-probe) candidates are scored.
  Approximate — recall measured against :func:`brute_topk` in tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def brute_topk(
    ds,
    queries: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
):
    """Exact cosine top-k of every corpus row for each query vector.

    Returns a pandas frame (query_id, neighbor_id, cos_sim, rank) with
    rank 1..k ordered by (cos_sim desc, neighbor_id asc) — a total order,
    so results are deterministic under ties.
    """
    import ray

    Q = _normalize(np.array(queries[vec_col].tolist(), dtype=np.float64))
    qids = queries[query_id_col].to_numpy()
    ref = ray.put((qids, Q))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_ = ray.get(ref)
        C = _normalize(np.array(df[vec_col].tolist(), dtype=np.float64))
        ids = df[id_col].to_numpy()
        S = Q_ @ C.T  # (nq, batch)
        kk = min(k, S.shape[1])
        out = {"query_id": [], "neighbor_id": [], "cos_sim": []}
        # per query: local top-k by (sim desc, id asc)
        for qi in range(S.shape[0]):
            sims = S[qi]
            idx = np.lexsort((ids, -sims))[:kk]
            out["query_id"].extend([qids_[qi]] * len(idx))
            out["neighbor_id"].extend(ids[idx])
            out["cos_sim"].extend(sims[idx])
        return pd.DataFrame(out)

    partial = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    partial = partial.sort_values(
        ["query_id", "cos_sim", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    topk = partial.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk


def lsh_topk(
    ds,
    queries: pd.DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 23,
    multiprobe: int = 1,
):
    """Random-hyperplane LSH top-k: score only corpus rows whose sign
    bucket matches a query bucket (or differs in ≤ multiprobe bits)."""
    import ray

    Q = _normalize(np.array(queries[vec_col].tolist(), dtype=np.float64))
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, n_planes))
    qbits = (Q @ planes > 0).astype(np.uint8)
    qcodes = np.packbits(qbits, axis=1, bitorder="little")[:, 0].astype(np.int64)
    # multi-probe acceptance as a dense (n_queries × 2^code_bits) bool
    # matrix: per-batch candidate filtering is then one fancy-index
    # gather, accept[qi, ccodes] — no per-row Python membership test.
    # Codes are the FIRST BYTE of the packed sign bits (packbits[:, 0]),
    # so at most 8 bits ever appear in a code regardless of n_planes —
    # size the matrix (and the probe flips) to that effective width.
    code_bits = min(n_planes, 8)
    qrows = np.arange(len(qcodes))
    accept = np.zeros((len(qcodes), 1 << code_bits), dtype=bool)
    accept[qrows, qcodes] = True
    if multiprobe >= 1:
        for b in range(code_bits):
            accept[qrows, qcodes ^ (1 << b)] = True
    qids = queries[query_id_col].to_numpy()
    ref = ray.put((qids, Q, planes, accept))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, planes_, accept_ = ray.get(ref)
        C = _normalize(np.array(df[vec_col].tolist(), dtype=np.float64))
        ids = df[id_col].to_numpy()
        cbits = (C @ planes_ > 0).astype(np.uint8)
        ccodes = np.packbits(cbits, axis=1, bitorder="little")[:, 0].astype(np.int64)
        out = {"query_id": [], "neighbor_id": [], "cos_sim": []}
        for qi in range(Q_.shape[0]):
            mask = accept_[qi, ccodes]
            if not mask.any():
                continue
            sims = Q_[qi] @ C[mask].T
            cand_ids = ids[mask]
            idx = np.lexsort((cand_ids, -sims))[: min(k, len(cand_ids))]
            out["query_id"].extend([qids_[qi]] * len(idx))
            out["neighbor_id"].extend(cand_ids[idx])
            out["cos_sim"].extend(sims[idx])
        return pd.DataFrame(out)

    partial = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if partial.empty:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "cos_sim", "rank"])
    partial = partial.sort_values(
        ["query_id", "cos_sim", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    topk = partial.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk


def kmeans_centroids(
    X: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 29
) -> np.ndarray:
    """Deterministic spherical k-means (numpy, cosine geometry): unit-norm
    inputs, k-means++-style seeded init, empty clusters re-seeded from the
    worst-assigned points. Runs on a driver-side SAMPLE — centroid quality
    only gates recall, not correctness."""
    X = _normalize(np.asarray(X, dtype=np.float64))
    rng = np.random.default_rng(seed)
    n = len(X)
    n_centroids = min(n_centroids, n)
    C = X[rng.choice(n, n_centroids, replace=False)].copy()
    for _ in range(iters):
        S = X @ C.T
        assign = S.argmax(axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            else:  # re-seed dead centroid at the worst-covered point
                C[c] = X[S.max(axis=1).argmin()]
        C = _normalize(C)
    return C


def ivf_topk(
    ds,
    queries: pd.DataFrame,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 4,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 29,
):
    """IVF (inverted-file) approximate top-k — the classic scale path for
    ANN: a coarse spherical-k-means codebook is trained on a driver-side
    sample and broadcast; each corpus batch assigns its vectors to their
    nearest centroid and scores them ONLY against the queries probing
    that cell (each query probes its ``nprobe`` nearest centroids).
    Per-batch work drops from O(batch × queries) to
    O(batch × queries × nprobe / n_centroids) expected; recall is pinned
    against :func:`brute_topk` in tests. The codebook is the stateful
    stage: built once, shipped via ``ray.put``, reused by every task."""
    import ray

    sample_rows = ds.limit(sample).to_pandas()
    C = kmeans_centroids(
        np.array(sample_rows[vec_col].tolist(), dtype=np.float64),
        n_centroids, seed=seed,
    )
    Q = _normalize(np.array(queries[vec_col].tolist(), dtype=np.float64))
    qids = queries[query_id_col].to_numpy()
    # cell -> indices of queries probing it
    probe_cells = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :nprobe]
    cell_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe_cells):
        for c in cells:
            cell_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((qids, Q, C, {c: np.asarray(v) for c, v in cell_queries.items()}))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, C_, cq = ray.get(ref)
        X = _normalize(np.array(df[vec_col].tolist(), dtype=np.float64))
        ids = df[id_col].to_numpy()
        assign = (X @ C_.T).argmax(axis=1)
        out = {"query_id": [], "neighbor_id": [], "cos_sim": []}
        for c in np.unique(assign):
            quis = cq.get(int(c))
            if quis is None:
                continue
            member = assign == c
            Xi, idsi = X[member], ids[member]
            S = Q_[quis] @ Xi.T  # (probing queries, cell members)
            kk = min(k, S.shape[1])
            for row, qi in enumerate(quis):
                idx = np.lexsort((idsi, -S[row]))[:kk]
                out["query_id"].extend([qids_[qi]] * len(idx))
                out["neighbor_id"].extend(idsi[idx])
                out["cos_sim"].extend(S[row][idx])
        return pd.DataFrame(out)

    partial = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if partial.empty:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "cos_sim", "rank"])
    partial = partial.sort_values(
        ["query_id", "cos_sim", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    topk = partial.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk


__all__ = ["brute_topk", "lsh_topk", "ivf_topk", "kmeans_centroids",
           "int8_quantize", "random_project_int8", "achlioptas_matrix",
           "grid_density_clusters"]


def quantize_embedding(M: np.ndarray, scale: int = 1000) -> np.ndarray:
    """float32 embedding → exact int64 grid: floor(x*scale + 0.5) in
    float64. Integer arithmetic downstream makes nearest-centroid
    argmins EXACT — bit-reproducible across engines (the SQL oracle
    runs the identical formula), no float-tie risk."""
    return np.floor(M.astype(np.float64) * scale + 0.5).astype(np.int64)


def _quantize_rows(M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The symmetric int8 rule shared by :func:`int8_quantize` and
    :func:`random_project_int8`: ``q = clip(round(x·127/scale), ±127)``
    with ``scale = max|x|`` per row, half-away-from-zero rounding
    (DuckDB ROUND semantics), all-zero rows → q=0."""
    scale = np.abs(M).max(axis=1)
    safe = np.where(scale > 0, scale, 1.0)
    v = M * 127.0 / safe[:, None]
    q = np.clip(np.trunc(v + np.copysign(0.5, v)), -127, 127).astype(np.int64)
    q[scale == 0] = 0
    return q, scale


def achlioptas_matrix(d_in: int, d_out: int) -> np.ndarray:
    """Deterministic Achlioptas (2003) sparse random-projection matrix:
    entry (i, j) is +1 / −1 / 0 with probability 1/6 / 1/6 / 2/3, drawn
    from the 32-bit md5 prefix of ``"{i}_{j}"`` mod 6 (0→+1, 1→−1) —
    the same md5-derivation DuckDB can replay, so the projection is
    SQL-exact."""
    R = np.zeros((d_in, d_out), dtype=np.int64)
    for i in range(d_in):
        for j in range(d_out):
            hm = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8],
                     16) % 6
            if hm == 0:
                R[i, j] = 1
            elif hm == 1:
                R[i, j] = -1
    return R


def random_project_int8(ds, d_out: int = 8, id_col: str = "vec_id",
                        emb_col: str = "embedding"):
    """Sparse random projection (Achlioptas 2003, ±1 integer weights)
    of int8-quantized embeddings — the JL-style dimensionality cut for
    cheap pre-filtering, kept EXACT across engines by doing all the
    arithmetic in integers: quantize each vector with the shared int8
    rule (:func:`_quantize_rows`), then ``y = q @ R`` with the
    deterministic ±1/0 matrix — sums of ints are order-independent, so
    the oracle hash matches bit-for-bit (float matmuls would not).

    The (d_in × d_out) matrix is built ONCE driver-side and broadcast
    via ``ray.put``; each batch is one int matmul. Output is exploded
    ``(id, out_dim, y)`` rows for the oracle hash. Map-only, zero
    shuffle."""
    import ray

    first = ds.take(1)
    if not first:
        return ds.map_batches(lambda df: pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "out_dim": pd.Series([], dtype="int64"),
            "y": pd.Series([], dtype="int64"),
        }), batch_format="pandas")
    d_in = len(first[0][emb_col])
    r_ref = ray.put(achlioptas_matrix(d_in, d_out))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "out_dim": pd.Series([], dtype="int64"),
                "y": pd.Series([], dtype="int64"),
            })
        R = ray.get(r_ref)
        M = np.asarray(list(df[emb_col]), dtype=np.float64)
        q, _ = _quantize_rows(M)
        y = q @ R
        n = len(df)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), d_out),
            "out_dim": np.tile(np.arange(d_out, dtype=np.int64), n),
            "y": y.reshape(-1),
        })

    return ds.map_batches(fn, batch_format="pandas")


def int8_quantize(ds, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Symmetric per-vector int8 quantization of an embedding column —
    the 4× memory cut that lets a web-scale ANN index stay in RAM:
    ``q = clip(round(x·127/scale), ±127)`` with ``scale = max|x|``
    (a pure SELECTION, no arithmetic — so it is bit-identical across
    engines). Output is EXPLODED ``(id, pos, q, scale)`` rows so an
    oracle hash covers every component (list columns don't compare
    across engines); all-zero vectors emit q=0 with scale=0. Rounding
    is half-away-from-zero (DuckDB ROUND semantics). Vectorized: one
    matrix op per batch, zero shuffle."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "q": pd.Series([], dtype="int64"),
                "scale": pd.Series([], dtype="float64"),
            })
        try:
            M = np.asarray(list(df[emb_col]), dtype=np.float64)
        except ValueError as e:
            raise ValueError(
                f"int8_quantize needs fixed-dimension {emb_col!r} lists "
                f"(ragged batch): {e}"
            ) from None
        if M.ndim != 2 or M.shape[1] == 0:
            raise ValueError(
                f"int8_quantize needs non-empty fixed-dimension "
                f"{emb_col!r} lists, got shape {M.shape}"
            )
        n, d = M.shape
        q, scale = _quantize_rows(M)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), d),
            "pos": np.tile(np.arange(d, dtype=np.int64), n),
            "q": q.reshape(-1),
            "scale": np.repeat(scale, d),
        })

    return ds.map_batches(fn, batch_format="pandas")


def assign_centroids(
    ds,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
):
    """Nearest-centroid assignment (the E-step of distributed k-means,
    exposed standalone): centroids are the embeddings of the ``k``
    smallest ids (deterministic), broadcast once via ``ray.put``; each
    batch computes integer squared-L2 against all centroids with one
    matmul and takes the argmin (ties → smallest centroid id, which
    argmin's first-minimum gives for id-ordered columns).

    Shuffle volume: zero (map-only). Driver holds k×dim ints. The
    centroid PULL is a per-batch k-smallest partial, bounded at
    k × batches rows."""
    import ray

    def kmin(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col, vec_col]]

    cpd = (
        ds.select_columns([id_col, vec_col])
        .map_batches(kmin, batch_format="pandas")
        .to_pandas()
        .nsmallest(k, id_col)
        .sort_values(id_col)
    )
    C = quantize_embedding(np.vstack(cpd[vec_col].to_numpy()), scale)
    cids = cpd[id_col].to_numpy()
    cref = ray.put((C, cids))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        C, cids = ray.get(cref)
        Q = quantize_embedding(np.vstack(df[vec_col].to_numpy()), scale)
        # exact int64 squared-L2: |q|^2 + |c|^2 - 2 q.c
        d = (
            (Q * Q).sum(axis=1, keepdims=True)
            + (C * C).sum(axis=1)[None, :]
            - 2 * (Q @ C.T)
        )
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "centroid": cids[np.argmin(d, axis=1)],
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pandas")


def kmeans_fit(
    ds,
    k: int = 8,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
):
    """Distributed Lloyd k-means over the full corpus (vs
    :func:`kmeans_centroids`, which trains on a driver-side sample).

    Deterministic init: embeddings of the ``k`` smallest ids. Each
    iteration is ONE map pass: centroids broadcast via ``ray.put``,
    every batch assigns its rows (float64 L2 matmul + argmin) and emits
    k partial rows (cluster, count, sum-vector) — the M-step combine the
    driver does is O(k × batches), never O(rows). Dead centroids keep
    their previous position. Stops early when max centroid movement
    < ``tol``. Returns ``(centroids ndarray (k,d), assignment Dataset
    (id_col, cluster))``."""
    import ray

    def kmin(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col, vec_col]]

    base = ds.select_columns([id_col, vec_col]).materialize()
    cpd = (
        base.map_batches(kmin, batch_format="pandas")
        .to_pandas().nsmallest(k, id_col).sort_values(id_col)
    )
    C = np.vstack(cpd[vec_col].to_numpy()).astype(np.float64)

    for _ in range(n_iter):
        cref = ray.put(C)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            Cb = ray.get(cref)
            X = np.vstack(df[vec_col].to_numpy()).astype(np.float64)
            d = ((X * X).sum(axis=1, keepdims=True)
                 + (Cb * Cb).sum(axis=1)[None, :] - 2.0 * (X @ Cb.T))
            a = np.argmin(d, axis=1)
            sums = np.zeros_like(Cb)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=len(Cb))
            return pd.DataFrame({
                "cluster": np.arange(len(Cb), dtype=np.int64),
                "count": counts.astype(np.int64),
                "vsum": list(sums),
            })

        parts = base.map_batches(partial, batch_format="pandas").to_pandas()
        counts = parts.groupby("cluster")["count"].sum()
        newC = C.copy()
        for c, g in parts.groupby("cluster"):
            n = counts.loc[c]
            if n > 0:
                newC[int(c)] = np.sum(np.vstack(g["vsum"].to_numpy()),
                                      axis=0) / n
        moved = float(np.abs(newC - C).max())
        C = newC
        if moved < tol:
            break

    cref = ray.put(C)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        Cb = ray.get(cref)
        X = np.vstack(df[vec_col].to_numpy()).astype(np.float64)
        d = ((X * X).sum(axis=1, keepdims=True)
             + (Cb * Cb).sum(axis=1)[None, :] - 2.0 * (X @ Cb.T))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "cluster": np.argmin(d, axis=1).astype(np.int64)})

    return C, base.map_batches(assign, batch_format="pandas")


def grid_density_clusters(
    ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell: int = 100,
    min_pts: int = 3,
    d_out: int = 2,
    shift: int = 1 << 20,
    num_buckets: int | None = None,
):
    """Grid-density clustering of an embedding column — the GriDBSCAN /
    cell-based DBSCAN family: project each vector to ``d_out``=2 integer
    coordinates (int8-quantize + the deterministic Achlioptas ±1 matmul
    — all-integer, so the grid is SQL-exact), bin into square cells of
    side *cell*, call a cell CORE when it holds ≥ *min_pts* points, and
    cluster = connected component of core cells under 8-neighborhood
    adjacency (label = MIN cell id of the component). Points in
    non-core cells are noise (cluster = −1).

    Scale shape (the reason grid DBSCAN exists): points are touched by
    map-only stages — one projection pass, one partial-count pass, one
    broadcast-lookup assignment. Everything that shuffles is CELL-sized:
    the count aggregate (one row per occupied cell per batch), the
    neighbor-probe exchange (9 rows per core cell), and the min-label
    propagation over the core-cell graph (`_min_label_propagation`, the
    same distributed component engine the near-dup clusters use). The
    final (cid → label) map is O(core cells) and broadcasts via
    ``ray.put``. Coordinates are shifted by *shift* before the floor
    division so the SQL mirror's `//` (which TRUNCATES toward zero on
    negatives, unlike numpy's floor) only ever sees non-negative ints.
    """
    import ray

    from .relational import grouped_agg
    from ..functions.neardup import _union_find_labels
    from ..stages.partition import BUCKET_COL, bucket_exchange

    first = ds.take(1)
    if not first:
        return ds.map_batches(lambda df: pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "cx": pd.Series([], dtype="int64"),
            "cy": pd.Series([], dtype="int64"),
            "cluster": pd.Series([], dtype="int64"),
        }), batch_format="pandas")
    d_in = len(first[0][emb_col])
    r_ref = ray.put(achlioptas_matrix(d_in, d_out))
    enc = np.int64(1) << 22  # cid = cx·2^22 + cy (shifted coords ≥ 0)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cx": pd.Series([], dtype="int64"),
                                 "cy": pd.Series([], dtype="int64")})
        M = np.asarray(list(df[emb_col]), dtype=np.float64)
        q, _ = _quantize_rows(M)
        y = q @ ray.get(r_ref)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy().astype(np.int64),
            "cx": (y[:, 0] + shift) // cell,
            "cy": (y[:, 1] + shift) // cell,
        })

    pts = ds.map_batches(project, batch_format="pandas").materialize()

    import pyarrow.compute as pc

    cells = grouped_agg(pts, ["cx", "cy"], {"n": (id_col, "count")},
                        num_buckets=num_buckets or 8)
    core = cells.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_pts)),
        batch_format="pyarrow",
    ).materialize()

    # neighbor-probe exchange: each core cell posts presence at its own
    # cell and probes its 8 neighbors; an in-bucket merge yields edges
    dxy = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                    if (dx, dy) != (0, 0)], dtype=np.int64)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("cx", "cy", "origin", "tag")})
        cx = df["cx"].to_numpy(dtype=np.int64)
        cy = df["cy"].to_numpy(dtype=np.int64)
        cid = cx * enc + cy
        n = len(df)
        probes = pd.DataFrame({
            "cx": np.repeat(cx, 8) + np.tile(dxy[:, 0], n),
            "cy": np.repeat(cy, 8) + np.tile(dxy[:, 1], n),
            "origin": np.repeat(cid, 8),
            "tag": np.int64(0),
        })
        pres = pd.DataFrame({"cx": cx, "cy": cy, "origin": cid,
                             "tag": np.int64(1)})
        return pd.concat([pres, probes], ignore_index=True)

    def match(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL], errors="ignore")
        pres = df[df["tag"] == 1][["cx", "cy", "origin"]].rename(
            columns={"origin": "id_b"})
        pro = df[df["tag"] == 0][["cx", "cy", "origin"]].rename(
            columns={"origin": "id_a"})
        e = pro.merge(pres, on=["cx", "cy"])
        return e[["id_a", "id_b"]].astype("int64")

    probed = core.map_batches(emit, batch_format="pandas")
    edges = bucket_exchange(probed, ["cx", "cy"], match, num_buckets)

    core_pd = core.to_pandas()  # O(core cells): the broadcast side
    core_cids = (core_pd["cx"].to_numpy(dtype=np.int64) * enc
                 + core_pd["cy"].to_numpy(dtype=np.int64))
    # components DRIVER-SIDE: the (cid → label) map must come to the
    # driver for the broadcast assignment anyway, so union-find over
    # the same O(core cells) edge set costs nothing extra — unlike the
    # point-count-sized graphs where _min_label_propagation is required
    edges_pd = edges.to_pandas()
    if len(edges_pd):
        label_map = {int(k): int(v) for k, v in _union_find_labels(
            edges_pd["id_a"].to_numpy(dtype=np.int64).tolist(),
            edges_pd["id_b"].to_numpy(dtype=np.int64).tolist()).items()}
    else:
        label_map = {}
    for c in core_cids:  # isolated core cells: their own component
        label_map.setdefault(int(c), int(c))
    map_ref = ray.put(label_map)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(map_ref)
        cid = (df["cx"].to_numpy(dtype=np.int64) * enc
               + df["cy"].to_numpy(dtype=np.int64))
        lab = np.fromiter((lut.get(int(c), -1) for c in cid), np.int64,
                          len(cid))
        out = df[[id_col, "cx", "cy"]].copy()
        out["cluster"] = lab
        return out

    return pts.map_batches(assign, batch_format="pandas")
