"""Near-duplicate detection: MinHash+LSH, SimHash, character-set Jaccard,
embedding-cosine.

Scale shapes (ray_guide patterns):
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

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashed character k-shingles (stable across processes: fixed-key
    siphash via ``pd.util.hash_pandas_object`` — vectorized)."""
    if not text or len(text) < k:
        return np.array([0], dtype=np.uint64)
    views = list({text[i : i + k] for i in range(len(text) - k + 1)})
    return pd.util.hash_pandas_object(pd.Series(views), index=False).to_numpy()


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
        sh = _shingles(text, self.shingle_k)
        # (a*x + b) in wrap-around uint64 — one broadcasted op per doc.
        # Overflow wraparound is itself a fine universal-ish hash family
        # for LSH purposes and ~1000x faster than arbitrary-precision mod-p.
        with np.errstate(over="ignore"):
            grid = self.a[:, None] * sh[None, :] + self.b[:, None]
        return grid.min(axis=1)

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
    groupby."""
    rows = {"band": [], "band_hash": [], id_col: []}
    for rid, sig in zip(df[id_col], df["minhash"]):
        rows_per_band = len(sig) // n_bands
        for b in range(n_bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            rows["band"].append(b)
            rows["band_hash"].append(h)
            rows[id_col].append(rid)
    return pd.DataFrame(rows)


def minhash_clusters(
    ds,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Full MinHash-LSH near-dup pipeline → pandas frame (id, cluster).

    Candidate pairs from band buckets are VERIFIED with exact shingle
    Jaccard before clustering (min-label union-find on the — small —
    verified edge set).
    """
    import ray

    hasher = MinHasher(n_perm, shingle_k)
    # one signature pass, materialized: both the band explosion and the
    # verification texts fan out from it (no re-read, no re-hash)
    with_sig = ds.map_batches(
        lambda df: hasher(df[[id_col, text_col]].rename(columns={text_col: "text"})),
        batch_format="pandas",
    ).materialize()
    bands = with_sig.map_batches(
        lambda df: lsh_bands(df, n_bands, id_col), batch_format="pandas"
    )

    # one Ray group per COARSE bucket of band-hashes (not per band bucket —
    # millions of tiny groups would drown in per-group overhead); the fine
    # (band, band_hash) grouping happens in pandas inside each task
    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            ids = sorted(grp[id_col].unique())
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    def coarse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_cand_bucket"] = (
            pd.util.hash_pandas_object(df["band_hash"], index=False)
            % np.uint64(64)
        ).astype(np.int64)
        return df

    cand = (
        bands.map_batches(coarse_bucket, batch_format="pandas")
        .groupby("_cand_bucket")
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )

    # verify on the driver: candidate set is tiny by construction; texts
    # come from the already-materialized signature pass
    tdf = with_sig.select_columns([id_col, "text"]).to_pandas()
    texts = dict(zip(tdf[id_col], tdf["text"]))

    def jaccard_shingles(a: str, b: str) -> float:
        sa = {a[i : i + shingle_k] for i in range(max(1, len(a) - shingle_k + 1))}
        sb = {b[i : i + shingle_k] for i in range(max(1, len(b) - shingle_k + 1))}
        if not sa and not sb:
            return 1.0
        return len(sa & sb) / len(sa | sb)

    edges = [
        (a, b)
        for a, b in zip(cand.get("id_a", []), cand.get("id_b", []))
        if jaccard_shingles(texts.get(a) or "", texts.get(b) or "")
        >= jaccard_threshold
    ]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = sorted(texts)
    return pd.DataFrame(
        {id_col: all_ids, "cluster": [find(i) if i in parent else i for i in all_ids]}
    )


def simhash64(text: str, seed: int = 11) -> int:
    """64-bit SimHash over single-space tokens (md5-derived token hashes —
    process-stable)."""
    if not text:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in text.split(" "):
        h = np.uint64(int.from_bytes(
            hashlib.md5(f"{seed}:{tok}".encode()).digest()[:8], "little"
        ))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def add_simhash(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df["simhash"] = [str(simhash64(t or "")) for t in df[text_col]]
    return df


def char_jaccard_pairs(
    ds,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """All-pairs character-set Jaccard ≥ threshold (id_a < id_b).

    Definition == DuckDB ``jaccard(a, b)``: case-sensitive distinct-char
    sets. Right side broadcast once; left streams per batch — the exact
    small-scale baseline that pins the LSH path.
    """
    import ray

    full = ds.select_columns([id_col, text_col]).to_pandas()
    charsets = [frozenset(t or "") for t in full[text_col]]
    ref = ray.put((full[id_col].to_numpy(), charsets))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_r, sets_r = ray.get(ref)
        out = {"id_a": [], "id_b": [], "jac": []}
        for rid, text in zip(df[id_col], df[text_col]):
            s = frozenset(text or "")
            for rid2, s2 in zip(ids_r, sets_r):
                if rid < rid2:
                    union = len(s | s2)
                    jac = (len(s & s2) / union) if union else 1.0
                    if jac >= threshold:
                        out["id_a"].append(rid)
                        out["id_b"].append(rid2)
                        out["jac"].append(round(jac, 6))
        return pd.DataFrame(out)

    return ds.map_batches(pairs, batch_format="pandas")


def cosine_pairs(
    ds,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """All-pairs embedding cosine ≥ threshold (id_a < id_b), float64 math
    (== DuckDB ``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])``).

    Right matrix broadcast once (normalized); per-batch numpy matmul."""
    import ray

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


__all__ = [
    "MinHasher",
    "lsh_bands",
    "minhash_clusters",
    "simhash64",
    "add_simhash",
    "char_jaccard_pairs",
    "cosine_pairs",
]
