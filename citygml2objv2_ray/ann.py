"""Approximate nearest neighbour search over embedding columns (build
brief: brute-force cosine top-k baseline + an IVF variant as the scale
path).

- ``cosine_topk`` lives in :mod:`.dedup` (normalized matmul per batch
  against a broadcast query matrix) — the exact baseline, used by
  ``q_ann_topk`` with a DuckDB oracle.
- ``IVFIndex``: seeded Lloyd k-means (pure numpy) → inverted lists per
  centroid; queries probe the ``nprobe`` nearest centroids and run exact
  cosine inside the probed lists only. At 100 TB: centroids are trained on
  a sample, broadcast via ``ray.put``; each map_batches task scores its
  batch of queries against the broadcast lists — the corpus is range-
  partitioned by centroid id so a probe touches only matching partitions.
"""

from __future__ import annotations

import numpy as np

from .dedup import normalize_rows


def kmeans(
    vecs: np.ndarray, k: int, iters: int = 10, seed: int = 13
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded Lloyd's k-means on L2-normalized vectors (spherical-ish).
    Returns (centroids (k,d), assignment (n,))."""
    X = normalize_rows(np.asarray(vecs, dtype=np.float64))
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    centers = X[rng.choice(len(X), size=k, replace=False)]
    assign = np.zeros(len(X), dtype=np.int64)
    for _ in range(iters):
        sims = X @ centers.T
        new_assign = np.argmax(sims, axis=1)
        if np.array_equal(new_assign, assign):
            assign = new_assign
            break
        assign = new_assign
        for c in range(k):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centers[c] = m / n
    return centers, assign


class IVFIndex:
    """Inverted-file ANN index (broadcastable: plain numpy arrays)."""

    def __init__(self, ids: np.ndarray, vecs: np.ndarray, n_lists: int = 16, seed: int = 13):
        self.ids = np.asarray(ids)
        self.vecs = normalize_rows(np.asarray(vecs, dtype=np.float64))
        self.centers, assign = kmeans(self.vecs, n_lists, seed=seed)
        self.lists = {
            c: np.flatnonzero(assign == c) for c in range(len(self.centers))
        }

    def search(
        self, queries: np.ndarray, k: int = 5, nprobe: int = 4, exclude_ids=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k by cosine among the ``nprobe`` nearest lists. Returns
        (ids (Q,k) — object dtype padded with None, scores (Q,k))."""
        Q = normalize_rows(np.asarray(queries, dtype=np.float64))
        cent_sims = Q @ self.centers.T
        probe = np.argsort(-cent_sims, axis=1)[:, :nprobe]
        out_ids = np.full((len(Q), k), None, dtype=object)
        out_sc = np.full((len(Q), k), -np.inf)
        for qi in range(len(Q)):
            cand = np.concatenate([self.lists[c] for c in probe[qi] if len(self.lists[c])])
            if exclude_ids is not None:
                cand = cand[self.ids[cand] != exclude_ids[qi]]
            if not len(cand):
                continue
            sims = self.vecs[cand] @ Q[qi]
            kk = min(k, len(cand))
            top = np.argpartition(-sims, kk - 1)[:kk]
            order = np.lexsort((self.ids[cand[top]], -sims[top]))
            top = top[order]
            out_ids[qi, :kk] = self.ids[cand[top]]
            out_sc[qi, :kk] = sims[top]
        return out_ids, out_sc


def recall_at_k(approx_ids: np.ndarray, exact_ids: np.ndarray) -> float:
    """Mean fraction of exact top-k found by the approximate search."""
    hits = 0
    total = 0
    for a, e in zip(approx_ids, exact_ids):
        es = {x for x in e if x is not None}
        hits += len({x for x in a if x is not None} & es)
        total += len(es)
    return hits / max(1, total)
