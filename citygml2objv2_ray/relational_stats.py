"""Distributed order statistics: exact quantiles, approximate quantile
sketch, per-group top-k. Importing populates the shared REGISTRY/ORACLE
(see ``relational``).

Design for 100 TB:

- The quantile path never sorts globally and never ships rows to the
  driver beyond (a) a fixed-size histogram (bounded by bin count, not data)
  and (b) the rows of the single target bin per quantile (n/bins on
  average). Histogram counts are ORDER-INSENSITIVE and mergeable — unlike
  KLL/t-digest compaction, nondeterministic block arrival cannot change
  the result, so runs are reproducible on a streaming executor.
- Per-group top-k pre-reduces inside each batch (k rows per group per
  batch cross the shuffle, not the table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .relational import _read, query

QUANTS = (0.25, 0.5, 0.75)
N_BINS = 4096


def _histogram(ds: rd.Dataset, col: str, lo: float, hi: float, bins: int = N_BINS) -> np.ndarray:
    """Fixed-bin histogram of a column: vectorized per-batch bincount
    partials (one (bin, n) row per NONZERO bin per batch) reduced by a
    tiny groupby — the shuffle moves at most ``bins`` rows per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[col], dtype=np.float64)
        idx = np.clip(((v - lo) / (hi - lo) * bins).astype(np.int64), 0, bins - 1)
        counts = np.bincount(idx, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz, pa.int64()), "n": pa.array(counts[nz], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("bin").aggregate(Sum("n", alias_name="n"))
    out = np.zeros(bins, dtype=np.int64)
    hdf = agg.to_pandas()  # bounded by bin count
    out[hdf.bin.to_numpy()] = hdf.n.to_numpy()
    return out


def quantile_disc_distributed(
    ds: rd.Dataset, col: str, qs=QUANTS, bins: int = N_BINS
) -> list[float]:
    """EXACT discrete quantiles (DuckDB ``quantile_disc`` semantics: the
    element at 0-based rank ``floor((n-1) * q)`` of the sorted column) in
    three bounded passes: global (n, min, max) → histogram → fetch + sort
    ONLY the rows of each target bin (≈ n/bins rows)."""
    stats = ds.aggregate(
        Count(alias_name="n"), Min(col, alias_name="lo"), Max(col, alias_name="hi")
    )
    n, lo, hi = stats["n"], float(stats["lo"]), float(stats["hi"])
    if n == 0:
        return [float("nan")] * len(qs)
    if lo == hi:
        return [lo] * len(qs)
    hist = _histogram(ds, col, lo, hi, bins)
    cum = np.cumsum(hist)
    ranks = [int(np.floor((n - 1) * q)) for q in qs]  # 0-based target ranks
    target_bins = sorted({int(np.searchsorted(cum, r + 1)) for r in ranks})
    tb = np.asarray(target_bins, dtype=np.int64)

    # ONE pass fetches the rows of ALL target bins (driver gets
    # ~n/bins per quantile, tagged by bin)
    def in_bins(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[col], dtype=np.float64)
        idx = np.clip(((v - lo) / (hi - lo) * bins).astype(np.int64), 0, bins - 1)
        m = np.isin(idx, tb)
        return pa.table(
            {col: pa.array(v[m]), "_bin": pa.array(idx[m], pa.int64())}
        )

    fetched = ds.map_batches(in_bins, batch_format="pyarrow").to_pandas()
    by_bin = {
        int(b): np.sort(g[col].to_numpy()) for b, g in fetched.groupby("_bin")
    }
    out: list[float] = []
    for r in ranks:
        b = int(np.searchsorted(cum, r + 1))
        prev = int(cum[b - 1]) if b > 0 else 0
        out.append(float(by_bin[b][r - prev]))
    return out


def quantile_sketch_distributed(
    ds: rd.Dataset, col: str, qs=QUANTS, bins: int = N_BINS
) -> list[float]:
    """Approximate quantiles from the same mergeable histogram (error
    bounded by one bin width of the value range) — two passes, no
    per-quantile row fetch. The order-insensitive alternative to
    KLL/t-digest for a streaming executor (see module docstring)."""
    stats = ds.aggregate(
        Count(alias_name="n"), Min(col, alias_name="lo"), Max(col, alias_name="hi")
    )
    n, lo, hi = stats["n"], float(stats["lo"]), float(stats["hi"])
    if n == 0:
        return [float("nan")] * len(qs)
    if lo == hi:
        return [lo] * len(qs)
    hist = _histogram(ds, col, lo, hi, bins)
    cum = np.cumsum(hist)
    out = []
    for q in qs:
        rank = int(np.floor((n - 1) * q))
        b = int(np.searchsorted(cum, rank + 1))
        out.append(lo + (hi - lo) * (b + 0.5) / bins)  # bin midpoint
    return out


@query(
    "q_quantiles_exact",
    """
    SELECT ROUND(quantile_disc(l_extendedprice, 0.25), 4) AS q25,
           ROUND(quantile_disc(l_extendedprice, 0.50), 4) AS q50,
           ROUND(quantile_disc(l_extendedprice, 0.75), 4) AS q75
    FROM lineitem
    """,
)
def q_quantiles_exact(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    q25, q50, q75 = quantile_disc_distributed(ds, "l_extendedprice", QUANTS)
    return pd.DataFrame(
        [{"q25": round(q25, 4), "q50": round(q50, 4), "q75": round(q75, 4)}]
    )


# rows-only: approximate sketch (error bound asserted in pytest vs exact)
@query("q_quantiles_sketch")
def q_quantiles_sketch(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    q25, q50, q75 = quantile_sketch_distributed(ds, "l_extendedprice", QUANTS)
    return pd.DataFrame(
        [{"q25": round(q25, 4), "q50": round(q50, 4), "q75": round(q75, 4)}]
    )


@query(
    "q_sample_split",
    """
    SELECT doc_id,
           CASE WHEN h < 52429 THEN 'train' ELSE 'val' END AS split
    FROM (SELECT doc_id,
                 CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS h
          FROM documents)
    WHERE h < 58982
    ORDER BY doc_id
    """,
)
def q_sample_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic content-hash sampling + train/val split (the
    reproducible subset/split op of a training-data pipeline, SURVEY §2.F
    "sampling": keep ~90% of docs — md5(doc_id) 16-bit prefix < 0.9*65536
    — and split kept rows ~80/10 train/val on the same hash). Pure
    vectorized per-batch filter: no shuffle, no state, identical rows on
    any executor/partitioning — and SQL-checkable because the hash is
    md5, not a Python-private hash."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [
                int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16)
                for d in df.doc_id
            ],
            dtype=np.int64,
        )
        keep = h < 58982  # ~0.9 * 65536
        split = np.where(h[keep] < 52429, "train", "val")  # ~0.8 * 65536
        return pd.DataFrame({"doc_id": df.doc_id.to_numpy()[keep], "split": split})

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


@query(
    "q_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """,
)
def q_topk_per_group(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k (top-3 orders by price per priority class): local
    top-k per group inside each batch, then a tiny final per-group merge —
    the shuffle moves at most k rows per group per batch."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="stable",
        )
        return df.groupby("o_orderpriority", sort=False).head(3)

    pre = ds.map_batches(local_topk, batch_format="pandas")
    top = pre.groupby("o_orderpriority").map_groups(local_topk, batch_format="pandas")
    df = top.to_pandas()
    df["o_totalprice"] = df.o_totalprice.round(4)
    return df.sort_values(
        ["o_orderpriority", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    ).reset_index(drop=True)
