"""Deduplication operators (build brief: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup).

Designed Ray-Data-first:

- **exact**: content-hash column in a vectorized ``map_batches`` →
  hash-partitioned ``groupby(hash)`` keep-first (ops.exact_dedup_first);
- **MinHash+LSH**: per-batch shingle→minhash (vectorized over the universal
  hash family), explode to (band, band_hash, doc_id) rows, groupby bands →
  candidate pairs within buckets → verify true n-gram Jaccard;
- **SimHash**: 64-bit token-hash majority vote per doc;
- **embedding near-dup**: LSH sign-bucket (random hyperplanes) →
  within-bucket exact cosine — the scale path; brute-force all-pairs is the
  small-scale oracle.

All hashing is seeded & engine-stable (no Python ``hash``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MERSENNE = (1 << 61) - 1


def _stable_token_ids(tokens: np.ndarray) -> np.ndarray:
    """FNV-1a 64 of each token string → uint64 ids."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(1469598103934665603)
        for b in t.encode():
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """k-char shingle id set of normalized text (uint64)."""
    norm = " ".join(text.lower().split())
    if len(norm) < k:
        norm = norm.ljust(k)
    views = {norm[i : i + k] for i in range(len(norm) - k + 1)}
    return _stable_token_ids(np.array(sorted(views), dtype=object))


def word_ngrams(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


class MinHasher:
    """Vectorized MinHash over a universal hash family
    h_i(x) = (a_i * x + b_i) mod p. Seeded, stateful (actor-friendly)."""

    def __init__(self, num_hashes: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_hashes, dtype=np.int64).astype(object)
        self.b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.int64).astype(object)
        self.num_hashes = num_hashes

    def signature(self, shingle_ids: np.ndarray) -> np.ndarray:
        if len(shingle_ids) == 0:
            return np.full(self.num_hashes, MERSENNE, dtype=np.int64)
        x = shingle_ids.astype(object)[None, :]
        hv = (self.a[:, None] * x + self.b[:, None]) % MERSENNE
        return np.array([int(min(row)) for row in hv], dtype=np.int64)


def lsh_bands(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Split a signature into ``bands`` rows-per-band chunks and hash each →
    int64 band keys (FNV over the chunk bytes)."""
    r = len(sig) // bands
    out = np.empty(bands, dtype=np.int64)
    for b in range(bands):
        chunk = sig[b * r : (b + 1) * r].tobytes()
        h = 1469598103934665603
        for by in chunk:
            h = (h ^ by) * 1099511628211 & 0xFFFFFFFFFFFFFFFF
        out[b] = (h ^ b) & 0x7FFFFFFFFFFFFFFF
    return out


def simhash64(text: str) -> int:
    """SimHash: signed bit-vote over stable token hashes."""
    toks = text.lower().split()
    if not toks:
        return 0
    ids = _stable_token_ids(np.array(toks, dtype=object))
    bits = ((ids[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    v = 0
    for k in np.flatnonzero(votes > 0):
        v |= 1 << int(k)
    return v - (1 << 64) if v >= 1 << 63 else v


class MinHashStage:
    """map_batches actor: text → minhash signature + LSH band keys
    (exploded: one output row per (doc, band))."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 7):
        self.mh = MinHasher(num_hashes, seed)
        self.bands = bands
        self.k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "band": [], "band_hash": []}
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            sig = self.mh.signature(char_shingles(text, self.k))
            bh = lsh_bands(sig, self.bands)
            rows["doc_id"] += [doc_id] * self.bands
            rows["band"] += list(range(self.bands))
            rows["band_hash"] += bh.tolist()
        return pd.DataFrame(rows)


def candidate_pairs_from_buckets(df: pd.DataFrame) -> pd.DataFrame:
    """(band, band_hash) groups → unique candidate (a < b) pairs."""
    pairs = set()
    for _, g in df.groupby(["band", "band_hash"]):
        ids = sorted(g["doc_id"].unique().tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    if not pairs:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    a, b = zip(*sorted(pairs))
    return pd.DataFrame({"doc_a": list(a), "doc_b": list(b)})


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def normalize_rows(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk(queries: np.ndarray, corpus: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k (baseline ANN): normalized matmul per batch.
    Returns (indices (Q,k), scores (Q,k)) ordered by (-score, index)."""
    qn = normalize_rows(queries)
    cn = normalize_rows(corpus)
    sims = qn @ cn.T
    # deterministic order: by -score then index
    k = min(k, sims.shape[1])
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    ps = np.take_along_axis(sims, part, axis=1)
    order = np.lexsort((part, -ps), axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    sc = np.take_along_axis(ps, order, axis=1)
    return idx, sc


def hyperplane_buckets(vecs: np.ndarray, n_planes: int = 12, seed: int = 11) -> np.ndarray:
    """LSH sign buckets from random hyperplanes → int64 bucket per row (the
    scale path for near-dup: only same-bucket pairs are compared)."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(vecs.shape[1], n_planes))
    signs = (np.asarray(vecs, dtype=np.float64) @ planes) > 0
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    return (signs @ weights).astype(np.int64)
