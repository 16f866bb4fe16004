"""Deterministic synthetic embedding table with PLANTED near-duplicate
groups — the fixture for cosine near-dup clustering.

The base embeddings testdata table is near-orthogonal random noise (zero
pairs above cosine 0.55 at sf0.01), which makes any clustering query over
it trivially all-singletons. This fixture plants real structure with a
wide margin around the decision threshold:

- ``n_groups`` groups of ``group_size`` vectors: a random unit base plus
  per-copy Gaussian noise of relative scale ``eps`` → within-group cosine
  ≈ 1/(1+eps²) ≳ 0.94 for eps = 0.25;
- background vectors are i.i.d. random unit vectors: for dim = 64 the
  pairwise cosines are ~N(0, 1/64), so even the max over millions of
  pairs stays ≲ 0.7.

A near-dup threshold of 0.85 therefore has NO boundary cases — the
engine (numpy float64) and a DuckDB ``list_cosine_similarity`` oracle
select the exact same pair set, which keeps the recursive-CTE
connected-components oracle hash-exact.

Everything is pure in (seed, sizes): any scale is reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DIM = 64
EPS = 0.25


def generate_neardup_embeddings(
    n_groups: int,
    n_background: int,
    group_size: int = 3,
    dim: int = DIM,
    eps: float = EPS,
    seed: int = 71,
) -> pa.Table:
    rng = np.random.default_rng(np.random.SeedSequence([seed, n_groups, n_background]))

    def unit(M: np.ndarray) -> np.ndarray:
        return M / np.linalg.norm(M, axis=1, keepdims=True)

    bases = unit(rng.normal(size=(n_groups, dim)))
    # per-dim scale eps/sqrt(dim) → the noise VECTOR has norm ≈ eps, so
    # within-group cosine ≈ 1/(1+eps²) ≈ 0.94 and copy-vs-copy ≳ 0.89
    planted = unit(
        np.repeat(bases, group_size, axis=0)
        + (eps / np.sqrt(dim)) * rng.normal(size=(n_groups * group_size, dim))
    )
    background = unit(rng.normal(size=(n_background, dim)))
    M = np.vstack([planted, background])
    # shuffle ids so group members are NOT adjacent (routing must not rely
    # on input order), but keep the permutation deterministic
    perm = rng.permutation(len(M))
    M = M[perm]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(M), dtype=np.int64)),
            "embedding": pa.array(list(M), type=pa.list_(pa.float64())),
        }
    )


def write_neardup_embeddings(
    out_dir: str,
    n_groups: int,
    n_background: int,
    group_size: int = 3,
    seed: int = 71,
) -> str:
    """Write the fixture parquet idempotently; returns the directory."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
    tbl = generate_neardup_embeddings(n_groups, n_background, group_size, seed=seed)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return out_dir


__all__ = ["generate_neardup_embeddings", "write_neardup_embeddings", "DIM", "EPS"]
