"""Exact coordinate translation (B21 — CityGMLTranslation.py:38-157,204-234).

The reference avoids float drift on UTM-scale coordinates (~1e6 with mm
precision) by doing hand-rolled decimal-STRING arithmetic. The columnar
equivalent: scaled int64 fixed-point. Coordinates are parsed from their
decimal representation into integer micrometres (exact for <= 6 decimal
places, the precision CityGML files carry), translated with integer adds
(exact by construction), and re-rendered. Exactness is by construction
rather than by 28-digit Decimal context.

Also: dataset-level translation parameters (D6,
CityGMLTranslation.py:171-197): mean of envelope/building lowerCorners,
negated, truncated to int — reproduced here as an aggregate over the
surfaces table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SCALE = 10**6  # micrometre fixed point: exact for <= 6 decimals


def to_fixed(values: np.ndarray) -> np.ndarray:
    """float64 → int64 fixed point via DECIMAL-STRING parsing (repr of a
    float64 is its shortest exact decimal → parsing that string at 6 dp is
    exactly the reference's string arithmetic domain)."""
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(np.asarray(values, dtype=np.float64)):
        s = repr(float(v))
        if "e" in s or "E" in s:
            out[i] = int(round(v * SCALE))
            continue
        neg = s.startswith("-")
        if neg:
            s = s[1:]
        whole, _, frac = s.partition(".")
        frac = (frac + "000000")[:6]
        mag = int(whole) * SCALE + int(frac)
        out[i] = -mag if neg else mag
    return out


def from_fixed(fixed: np.ndarray) -> np.ndarray:
    return np.asarray(fixed, dtype=np.int64) / SCALE


def translation_params(surfaces: rd.Dataset) -> np.ndarray:
    """Dataset translation parameters (D6): mean of per-building minimum
    vertices (the envelope lowerCorner analog), negated, truncated toward
    zero to whole units (CityGMLTranslation.py:171-197)."""
    from .arrow_utils import ring_column

    def batch_mins(batch: pa.Table) -> pd.DataFrame:
        pts, off = ring_column(batch["exterior"])
        bids = batch["building_id"].to_pylist()
        rows = []
        for i in range(batch.num_rows):
            ring = pts[off[i] : off[i + 1]]
            if len(ring):
                lo = ring.min(axis=0)
                rows.append(dict(building_id=bids[i], x=lo[0], y=lo[1], z=lo[2]))
        return pd.DataFrame(rows)

    from ray.data.aggregate import Min

    mins = (
        surfaces.map_batches(batch_mins, batch_format="pyarrow")
        .groupby("building_id")
        .aggregate(Min("x", alias_name="x"), Min("y", alias_name="y"), Min("z", alias_name="z"))
        .to_pandas()
    )
    mean = mins[["x", "y"]].mean().to_numpy()
    return np.array([-int(mean[0]), -int(mean[1]), 0], dtype=np.int64)


def translate_exact(surfaces: rd.Dataset, delta_units: np.ndarray) -> rd.Dataset:
    """Exactly add integer ``delta_units`` (whole world units, per the
    reference's truncated params) to every vertex through int64 fixed
    point. Exactly invertible: translate_exact(ds, d) then
    translate_exact(·, -d) is the identity bit-for-bit."""
    d_fixed = (np.asarray(delta_units, dtype=np.int64) * SCALE).tolist()

    def shift(batch: pa.Table) -> pa.Table:
        from .arrow_utils import ring_column, rings_to_arrow

        pts, off = ring_column(batch["exterior"])
        moved = np.empty_like(pts)
        for axis in range(3):
            moved[:, axis] = from_fixed(to_fixed(pts[:, axis]) + d_fixed[axis])
        rings = [moved[off[i] : off[i + 1]] for i in range(batch.num_rows)]
        i = batch.column_names.index("exterior")
        return batch.set_column(i, "exterior", rings_to_arrow(rings))

    return surfaces.map_batches(shift, batch_format="pyarrow")
