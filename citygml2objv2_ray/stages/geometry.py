"""Geometry stages for ``map_batches`` — the Ray-native forms of the
reference's per-polygon loop (``CityGML2OBJs.py:99-193``).

``clean_validate`` is a stateless batch fn (cheap, elastic tasks);
``Triangulator`` is an actor-pool class (C1 is the heavy kernel —
SURVEY.md §7.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import geom
from ..arrow_utils import ring_column, rings_column
from ..config import DEFAULT_CONFIG, EngineConfig


def _iter_polys(batch: pa.Table):
    """Yield (row, exterior (n,3), [interiors]) from an Arrow surfaces batch
    using flat offset slicing (no per-row pylist materialization)."""
    pts, off = ring_column(batch["exterior"])
    ipts, iring_off, irow_off = rings_column(batch["interiors"])
    for i in range(batch.num_rows):
        ext = pts[off[i] : off[i + 1]]
        holes = [
            ipts[iring_off[r] : iring_off[r + 1]]
            for r in range(irow_off[i], irow_off[i + 1])
        ]
        yield i, ext, holes


def clean_validate(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Ring clean (B1) + validity predicate (B2) + per-polygon derived
    columns: area (B10), Newell normal (B9), azimuth/tilt (B11).

    Invalid polygons are kept, flagged ``valid=False`` with a reason — the
    filter+metrics decision happens downstream (the reference prints and
    skips, CityGML2OBJs.py:163-170)."""
    n = batch.num_rows
    valid = np.zeros(n, dtype=bool)
    reason = np.empty(n, dtype=object)
    area = np.zeros(n, dtype=np.float64)
    normal = np.zeros((n, 3), dtype=np.float64)
    azimuth = np.zeros(n, dtype=np.float64)
    tilt = np.zeros(n, dtype=np.float64)
    for i, ext, holes in _iter_polys(batch):
        ext = geom.clean_ring(ext, cfg.vertex_round_decimals)
        ok, why = geom.is_valid_ring(ext, cfg)
        valid[i], reason[i] = ok, why
        if ok:
            area[i] = geom.gml_area(ext, holes)
            nrm = geom.newell_normal(ext)
            normal[i] = nrm
            azimuth[i], tilt[i] = geom.azimuth_tilt(nrm)
    return (
        batch.append_column("valid", pa.array(valid))
        .append_column("invalid_reason", pa.array(reason, pa.string()))
        .append_column("area", pa.array(area))
        .append_column("nx", pa.array(normal[:, 0]))
        .append_column("ny", pa.array(normal[:, 1]))
        .append_column("nz", pa.array(normal[:, 2]))
        .append_column("azimuth", pa.array(azimuth))
        .append_column("tilt", pa.array(tilt))
    )


class Triangulator:
    """Actor-pool triangulation stage (C1, polygon3dmodule.py:551-716).

    One actor instance per pool slot; per-batch it explodes each valid
    polygon row into one row per triangle (TRIANGLES_SCHEMA). Invalid
    polygons triangulate to zero rows (silent-empty parity,
    polygon3dmodule.py:679-687) — callers join back to ``clean_validate``
    output for the skip metrics.
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bid, out_pid, out_sem = [], [], []
        out_bseq, out_pseq, out_tseq = [], [], []
        tri_pts: list[np.ndarray] = []
        bids = batch["building_id"].to_pylist()
        pids = batch["poly_id"].to_pylist()
        sems = batch["semantic"].to_pylist()
        bseq = np.asarray(batch["building_seq"])
        pseq = np.asarray(batch["poly_seq"])
        for i, ext, holes in _iter_polys(batch):
            ext = geom.clean_ring(ext, self.cfg.vertex_round_decimals)
            ok, _ = geom.is_valid_ring(ext, self.cfg)
            if not ok:
                continue
            tris = geom.triangulate_polygon(ext, holes, self.cfg)
            for t in range(len(tris)):
                out_bid.append(bids[i])
                out_pid.append(pids[i])
                out_sem.append(sems[i])
                out_bseq.append(int(bseq[i]))
                out_pseq.append(int(pseq[i]))
                out_tseq.append(t)
            if len(tris):
                tri_pts.append(tris)
        if tri_pts:
            allt = np.concatenate(tri_pts)  # (T,3,3)
        else:
            allt = np.zeros((0, 3, 3))
        tn = (
            np.cross(allt[:, 1] - allt[:, 0], allt[:, 2] - allt[:, 0])
            if len(allt)
            else np.zeros((0, 3))
        )
        areas = 0.5 * np.linalg.norm(tn, axis=1) if len(allt) else np.zeros(0)

        def fsl(col: np.ndarray) -> pa.Array:
            return pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(col).ravel(), pa.float64()), 3
            )

        return pa.table(
            {
                "building_id": pa.array(out_bid, pa.string()),
                "poly_id": pa.array(out_pid, pa.string()),
                "semantic": pa.array(out_sem, pa.string()),
                "building_seq": pa.array(out_bseq, pa.int32()),
                "poly_seq": pa.array(out_pseq, pa.int32()),
                "tri_seq": pa.array(out_tseq, pa.int32()),
                "p0": fsl(allt[:, 0]),
                "p1": fsl(allt[:, 1]),
                "p2": fsl(allt[:, 2]),
                "area": pa.array(areas, pa.float64()),
            }
        )
