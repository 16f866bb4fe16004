"""ANN operators: brute-force exactness vs numpy, and recall floors for
the LSH and IVF approximate paths."""

from __future__ import annotations

import numpy as np
import pandas as pd

from transmog_ray.functions.ann import brute_topk, ivf_topk, kmeans_centroids, lsh_topk


def corpus(n=600, dim=16, seed=13):
    rng = np.random.default_rng(seed)
    # clustered corpus so IVF cells are meaningful
    centers = rng.normal(size=(8, dim))
    X = centers[rng.integers(0, 8, n)] + 0.3 * rng.normal(size=(n, dim))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float64) for row in X],
    })


def brute_numpy(df, queries, k):
    X = np.array(df["embedding"].tolist())
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    Q = np.array(queries["embedding"].tolist())
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Q @ X.T
    out = {}
    for qi, qid in enumerate(queries["query_id"]):
        idx = np.lexsort((df["vec_id"].to_numpy(), -S[qi]))[:k]
        out[qid] = list(df["vec_id"].to_numpy()[idx])
    return out


def test_brute_topk_matches_numpy(ray_session):
    import ray.data as rd

    df = corpus()
    queries = df.head(6).rename(columns={"vec_id": "query_id"})
    got = brute_topk(rd.from_pandas(df), queries, k=5)
    want = brute_numpy(df, queries, 5)
    for qid, grp in got.groupby("query_id"):
        assert list(grp.sort_values("rank")["neighbor_id"]) == want[qid]


def _recall(got, want, k):
    hits = total = 0
    for qid, neighbors in want.items():
        g = set(got[got["query_id"] == qid]["neighbor_id"])
        hits += len(g & set(neighbors))
        total += k
    return hits / total


def test_ivf_recall_floor(ray_session):
    import ray.data as rd

    df = corpus()
    queries = df.head(8).rename(columns={"vec_id": "query_id"})
    want = brute_numpy(df, queries, 5)
    got = ivf_topk(rd.from_pandas(df), queries, k=5, n_centroids=16, nprobe=4)
    assert _recall(got, want, 5) >= 0.8
    # ranks are 1..k and similarities descend within each query
    for _, grp in got.groupby("query_id"):
        sims = list(grp.sort_values("rank")["cos_sim"])
        assert sims == sorted(sims, reverse=True)


def test_ivf_full_probe_is_exact(ray_session):
    import ray.data as rd

    df = corpus(n=200)
    queries = df.head(5).rename(columns={"vec_id": "query_id"})
    want = brute_numpy(df, queries, 5)
    # probing every cell == brute force
    got = ivf_topk(rd.from_pandas(df), queries, k=5, n_centroids=8, nprobe=8)
    for qid, grp in got.groupby("query_id"):
        assert list(grp.sort_values("rank")["neighbor_id"]) == want[qid]


def test_lsh_recall_floor(ray_session):
    import ray.data as rd

    df = corpus()
    queries = df.head(8).rename(columns={"vec_id": "query_id"})
    want = brute_numpy(df, queries, 5)
    got = lsh_topk(rd.from_pandas(df), queries, k=5, n_planes=8, multiprobe=1)
    assert _recall(got, want, 5) >= 0.5


def test_kmeans_deterministic():
    X = np.random.default_rng(3).normal(size=(300, 8))
    a = kmeans_centroids(X, 16)
    b = kmeans_centroids(X, 16)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_assign_centroids_matches_local(ray_session):
    import ray.data as rd

    from transmog_ray.functions.ann import assign_centroids, quantize_embedding

    rng = np.random.default_rng(31)
    n, d, k = 400, 16, 6
    emb = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": list(emb)})
    got = (
        assign_centroids(rd.from_pandas(df).repartition(5), k=k)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    C = quantize_embedding(emb[:k])
    Q = quantize_embedding(emb)
    dist = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    expect = np.argmin(dist, axis=1)
    assert (got["centroid"].to_numpy() == expect).all()
    # every centroid row assigns to itself (distance zero)
    assert (got["centroid"].to_numpy()[:k] == np.arange(k)).all()


def test_kmeans_fit_recovers_blobs(ray_session):
    import ray.data as rd

    from transmog_ray.functions.ann import kmeans_fit

    rng = np.random.default_rng(37)
    centers = np.array([[10.0, 0.0], [-10.0, 10.0], [0.0, -12.0]])
    n_per = 120
    X = np.vstack([c + rng.normal(0, 0.5, size=(n_per, 2)) for c in centers])
    # ids 0,1,2 land one per blob so the k-smallest-id init is spread
    blob = np.repeat(np.arange(3), n_per)
    ids = np.empty(3 * n_per, dtype=np.int64)
    ids[[0, n_per, 2 * n_per]] = [0, 1, 2]
    rest = np.setdiff1d(np.arange(3 * n_per), [0, n_per, 2 * n_per])
    ids[rest] = 3 + np.arange(len(rest))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X.astype(np.float32))})

    C, assign_ds = kmeans_fit(rd.from_pandas(df).repartition(4), k=3,
                              n_iter=20)
    got = assign_ds.to_pandas().set_index("vec_id")

    # centroids ≈ blob means (order = init ids 0,1,2 = blob 0,1,2)
    for b in range(3):
        mean_b = X[blob == b].mean(axis=0)
        assert np.abs(C[b] - mean_b).max() < 0.2, (b, C[b], mean_b)
    # every row assigned with its blob-mates
    cl = got.loc[ids]["cluster"].to_numpy()
    for b in range(3):
        vals = np.unique(cl[blob == b])
        assert len(vals) == 1


def test_int8_quantize_roundtrip_and_edges(ray_session):
    """Dequantized values within scale/254 of the original; zero vector
    emits q=0/scale=0; extremes hit ±127 exactly."""
    import ray.data as rd

    from transmog_ray.functions.ann import int8_quantize

    vecs = [
        {"vec_id": 1, "embedding": [1.0, -1.0, 0.5]},
        {"vec_id": 2, "embedding": [0.0, 0.0, 0.0]},
        {"vec_id": 3, "embedding": [-0.2, 0.1, 0.05]},
    ]
    out = int8_quantize(rd.from_items(vecs)).to_pandas()
    assert len(out) == 9
    v1 = out[out["vec_id"] == 1].sort_values("pos")
    assert v1["q"].tolist() == [127, -127, 64]
    assert (out[out["vec_id"] == 2]["q"] == 0).all()
    assert (out[out["vec_id"] == 2]["scale"] == 0.0).all()
    v3 = out[out["vec_id"] == 3].sort_values("pos")
    orig = np.array([-0.2, 0.1, 0.05])
    deq = v3["q"].to_numpy() * v3["scale"].to_numpy() / 127.0
    assert np.abs(deq - orig).max() <= 0.2 / 254 + 1e-12
