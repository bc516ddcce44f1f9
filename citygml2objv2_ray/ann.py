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


def sample_train_centroids(
    ds, n_lists: int = 16, max_train: int = 4096, seed: int = 13
) -> tuple[np.ndarray, int]:
    """Train IVF centroids on a bounded deterministic sample of a
    ``(vec_id, embedding)`` Dataset — the 100-TB build path: the driver
    holds at most ~``max_train`` vectors, NEVER the corpus. The sample is
    every ``ceil(n/max_train)``-th vec_id (deterministic, worker-side
    filter; assumes roughly dense integer ids — swap for a hash-mod on
    sparse id spaces). Returns (centers (k, d), n_sampled)."""
    import pandas as pd

    n = ds.count()
    mod = max(1, -(-n // max_train))  # ceil

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.vec_id % mod == 0][["vec_id", "embedding"]]

    sample = (
        ds.map_batches(pick, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")  # block arrival order is nondeterministic;
        .reset_index(drop=True)  # k-means seeding must not depend on it
    )
    V = np.vstack(sample.embedding.to_numpy()).astype(np.float64)
    centers, _ = kmeans(V, n_lists, seed=seed)
    return centers, len(sample)


def ivf_search_distributed(
    ds,
    query_vec_ids,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 6,
    max_train: int = 4096,
    seed: int = 13,
):
    """IVF ANN search as a streaming Ray Data pipeline (the documented
    scale path): sample-train centroids (bounded driver memory), broadcast
    (centers, normalized queries, per-query probe lists) via ``ray.put``,
    then each corpus batch assigns its rows to centroids and emits a
    per-query partial top-k over its probed rows only; the driver merges
    k-bounded partials. Returns a DataFrame (query_id, rank, neighbor_id,
    score) — never materializes the corpus driver-side."""
    import pandas as pd
    import ray

    centers, _ = sample_train_centroids(ds, n_lists, max_train, seed)
    qset = {int(q) for q in query_vec_ids}

    def pick_queries(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.vec_id.isin(qset)][["vec_id", "embedding"]]

    qdf = (
        ds.map_batches(pick_queries, batch_format="pandas")
        .to_pandas()  # bounded by #queries
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    Qn = normalize_rows(np.vstack(qdf.embedding.to_numpy()).astype(np.float64))
    probe = np.argsort(-(Qn @ centers.T), axis=1)[:, :nprobe]
    ref = ray.put((qdf.vec_id.to_numpy(), Qn, probe, centers))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids, Qm, prb, cent = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        Cn = normalize_rows(np.vstack(df.embedding.to_numpy()).astype(np.float64))
        assign = np.argmax(Cn @ cent.T, axis=1)
        vids = df.vec_id.to_numpy()
        sims = Qm @ Cn.T  # (Q, rows)
        out = []
        for i, qid in enumerate(qids):
            mask = np.isin(assign, prb[i]) & (vids != qid)
            if not mask.any():
                continue
            s = sims[i][mask]
            v = vids[mask]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk]
            out.append(
                pd.DataFrame({"query_id": int(qid), "neighbor_id": v[top], "score": s[top]})
            )
        if not out:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "score": []})
        return pd.concat(out)

    partials = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int64))
        rows.append(g)
    if not rows:
        return pd.DataFrame({"query_id": [], "rank": [], "neighbor_id": [], "score": []})
    df = pd.concat(rows).reset_index(drop=True)
    df["query_id"] = df.query_id.astype(np.int64)
    df["neighbor_id"] = df.neighbor_id.astype(np.int64)
    df["score"] = df.score.round(4)
    return df[["query_id", "rank", "neighbor_id", "score"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def recall_at_k(approx_ids: np.ndarray, exact_ids: np.ndarray) -> float:
    """Mean fraction of exact top-k found by the approximate search."""
    hits = 0
    total = 0
    for a, e in zip(approx_ids, exact_ids):
        es = {x for x in e if x is not None}
        hits += len({x for x in a if x is not None} & es)
        total += len(es)
    return hits / max(1, total)
