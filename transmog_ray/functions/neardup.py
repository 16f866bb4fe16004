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

import hashlib

import numpy as np
import pandas as pd

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


def _shingle_jaccard(a: str, b: str, k: int) -> float:
    sa = {a[i : i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i : i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_clusters(
    ds,
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
):
    """Full MinHash-LSH near-dup pipeline → Dataset of (id, cluster).

    Every wide step is distributed — the driver only ever sees candidate
    PAIRS and verified EDGES (both tiny by LSH construction), never texts
    or signatures:

      sign (map_batches) → band-bucket groupby → candidate pairs (driver,
      deduped) → semi-join texts down to candidate ids → explode each
      candidate doc to the verify buckets that need it → ONE bucket
      groupby whose tasks merge texts onto their pairs and run the exact
      shingle-Jaccard VERIFY → verified edges to the driver → min-label
      union-find on edges → broadcast label map → cluster column via
      map_batches.
    """
    import ray

    from .relational import semi_join

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
        out_a, out_b = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            ids = sorted(grp[id_col].unique())
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64")}
        )

    def coarse_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_cand_bucket"] = (
            pd.util.hash_pandas_object(df["band_hash"], index=False)
            % np.uint64(64)
        ).astype(np.int64)
        return df

    # candidate PAIRS to the driver, deduped there (pairs ≪ docs by LSH
    # construction — this is the defensible driver-side set; texts and
    # signatures never leave the cluster)
    pairs_pd = (
        bands.map_batches(coarse_bucket, batch_format="pandas")
        .groupby("_cand_bucket")
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
    ).drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)

    if len(pairs_pd) == 0:
        label_ref = ray.put({})
    else:
        # ONE verify shuffle: each pair is assigned a verify bucket; the
        # (pruned) candidate docs are exploded to every bucket that
        # needs their text, and each bucket task merges texts onto its
        # pairs and verifies with exact shingle Jaccard
        vb = (
            pd.util.hash_pandas_object(
                pairs_pd["id_a"].astype("int64"), index=False
            ) % np.uint64(num_buckets)
        ).astype(np.int64)
        pairs_pd = pairs_pd.assign(_vb=vb)
        need: dict = {}
        for a, b, bk in zip(pairs_pd["id_a"], pairs_pd["id_b"], vb):
            need.setdefault(a, set()).add(int(bk))
            need.setdefault(b, set()).add(int(bk))
        need_ref = ray.put(need)
        pairs_ref = ray.put(pairs_pd)

        cand_ids = pd.DataFrame({id_col: list(need)})
        sub = semi_join(docs, cand_ids, on=id_col)

        def explode(df: pd.DataFrame) -> pd.DataFrame:
            need_map = ray.get(need_ref)
            ids_out, texts_out, vb_out = [], [], []
            for i, t in zip(df[id_col], df[text_col]):
                for bk in need_map.get(i, ()):
                    ids_out.append(i)
                    texts_out.append(t)
                    vb_out.append(bk)
            return pd.DataFrame({
                id_col: pd.Series(ids_out, dtype="int64"),
                text_col: texts_out,
                "_vb": pd.Series(vb_out, dtype="int64"),
            })

        def verify(g: pd.DataFrame) -> pd.DataFrame:
            bk = int(g["_vb"].iloc[0])
            mine = ray.get(pairs_ref)
            mine = mine[mine["_vb"] == bk]
            texts = dict(zip(g[id_col], g[text_col]))
            ok = [
                _shingle_jaccard(texts.get(a) or "", texts.get(b) or "",
                                 shingle_k) >= jaccard_threshold
                for a, b in zip(mine["id_a"], mine["id_b"])
            ]
            return mine.loc[ok, ["id_a", "id_b"]]

        edges = (
            sub.map_batches(explode, batch_format="pandas")
            .groupby("_vb")
            .map_groups(verify, batch_format="pandas")
            .to_pandas()
        )

        # union-find over the verified EDGE set only (driver-side by
        # design: edges ≪ docs)
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(edges["id_a"], edges["id_b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        label_ref = ray.put({x: find(x) for x in list(parent)})

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        labels = ray.get(label_ref)
        ids = df[id_col]
        return pd.DataFrame(
            {id_col: ids,
             "cluster": [labels.get(i, i) for i in ids]}
        )

    return docs.map_batches(assign, batch_format="pandas")


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
            "id_a": pd.Series(out["id_a"], dtype="int64"),
            "id_b": pd.Series(out["id_b"], dtype="int64"),
            "hamming": pd.Series(out["hamming"], dtype="int64"),
        })

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        df["_nd_bucket"] = (
            pd.util.hash_pandas_object(df["block_val"], index=False)
            % np.uint64(num_buckets)
        ).astype(np.int64)
        return df

    cand = (
        exploded.map_batches(coarse, batch_format="pandas")
        .groupby("_nd_bucket")
        .map_groups(candidates, batch_format="pandas")
    )
    # same pair can match on several blocks → global dedup, one shuffle
    return (
        add_bucket(cand, ["id_a", "id_b"], num_buckets)
        .groupby(BUCKET_COL)
        .map_groups(
            lambda df: df.drop_duplicates(["id_a", "id_b"]).drop(
                columns=[BUCKET_COL]
            ),
            batch_format="pandas",
        )
    )


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


def ngram_jaccard_pairs(
    ds,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """All-pairs word n-gram Jaccard ≥ threshold (id_a < id_b).

    Token n-grams over single-space splits (SQL-reproducible: DuckDB
    list comprehension + list_intersect/list_distinct). Right side's
    n-gram sets are built once and broadcast; the left streams per
    batch — the exact small-scale oracle; MinHash-LSH is the scale path
    (its shingles are the character analogue of these n-grams).
    """
    import ray

    def grams(text: str) -> frozenset:
        toks = (text or "").split(" ")
        if len(toks) < n:
            return frozenset([" ".join(toks)] if toks != [""] else [])
        return frozenset(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    full = ds.select_columns([id_col, text_col]).to_pandas()
    sets_r = [grams(t) for t in full[text_col]]
    ref = ray.put((full[id_col].to_numpy(), sets_r))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_r, sr = ray.get(ref)
        out = {"id_a": [], "id_b": [], "jac": []}
        for rid, text in zip(df[id_col], df[text_col]):
            s = grams(text)
            for rid2, s2 in zip(ids_r, sr):
                if rid < rid2:
                    union = len(s | s2)
                    jac = (len(s & s2) / union) if union else 1.0
                    if jac >= threshold:
                        out["id_a"].append(rid)
                        out["id_b"].append(rid2)
                        out["jac"].append(round(jac, 6))
        return pd.DataFrame({
            "id_a": pd.Series(out["id_a"], dtype="int64"),
            "id_b": pd.Series(out["id_b"], dtype="int64"),
            "jac": pd.Series(out["jac"], dtype="float64"),
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
    "simhash_batch",
    "simhash64",
    "add_simhash",
    "simhash_neardup",
    "char_jaccard_pairs",
    "cosine_pairs",
]
