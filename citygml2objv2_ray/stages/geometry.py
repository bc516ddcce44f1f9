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
        trow_list, tri_list = self._triangulate_rows(batch)
        if tri_list:
            allt = np.concatenate(tri_list)  # (T,3,3)
            trow = np.concatenate(trow_list)
        else:
            allt = np.zeros((0, 3, 3))
            trow = np.zeros(0, np.int64)
        # per-row metadata via vectorized take/repeat (rows ascending,
        # triangles per row in emission order)
        tseq_counts = np.bincount(trow, minlength=batch.num_rows)
        cum = np.zeros(batch.num_rows + 1, np.int64)
        np.cumsum(tseq_counts, out=cum[1:])
        out_tseq = np.arange(len(trow)) - cum[trow]
        take = pa.array(trow, pa.int64())
        import pyarrow.compute as pc

        out_bid = pc.take(batch["building_id"], take)
        out_pid = pc.take(batch["poly_id"], take)
        out_sem = pc.take(batch["semantic"], take)
        out_bseq = pc.take(batch["building_seq"], take)
        out_pseq = pc.take(batch["poly_seq"], take)
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
                "building_id": out_bid.cast(pa.string()) if out_bid.type != pa.string() else out_bid,
                "poly_id": out_pid.cast(pa.string()) if out_pid.type != pa.string() else out_pid,
                "semantic": out_sem.cast(pa.string()) if out_sem.type != pa.string() else out_sem,
                "building_seq": out_bseq.cast(pa.int32()),
                "poly_seq": out_pseq.cast(pa.int32()),
                "tri_seq": pa.array(out_tseq.astype(np.int32), pa.int32()),
                "p0": fsl(allt[:, 0]),
                "p1": fsl(allt[:, 1]),
                "p2": fsl(allt[:, 2]),
                "area": pa.array(areas, pa.float64()),
            }
        )

    # -- batched triangulation core ------------------------------------

    def _triangulate_rows(self, batch: pa.Table):
        """Returns (list of row-index arrays, list of (t,3,3) arrays) in
        ascending row order with per-row emission order preserved.

        Fully segment-vectorized fast path (clean → validity → Newell →
        projection → strict-convexity gate → fan emission) over flat ring
        arrays; only rows with holes, non-convex rings, or degenerate
        projections fall back to the per-polygon kernel
        (``geom.triangulate_polygon``). The fan equals the ear-clip output
        on gated rows (see ``geom.convex_fan``), so batch and per-polygon
        paths are interchangeable triangle-for-triangle."""
        cfg = self.cfg
        R = batch.num_rows
        if R == 0:
            return [], []
        if getattr(cfg, "strict_valid", False):
            return self._rows_fallback(batch, np.arange(R))

        pts, off = ring_column(batch["exterior"])
        _, _, irow_off = rings_column(batch["interiors"])
        nholes = irow_off[1:] - irow_off[:-1]
        counts = off[1:] - off[:-1]
        rowids = np.repeat(np.arange(R), counts)

        # ---- vectorized clean_ring (consecutive rounded-dup removal) ----
        dec = cfg.vertex_round_decimals
        first, last = off[:-1], off[1:] - 1
        has = counts > 0
        closed = np.zeros(R, bool)
        hs = np.flatnonzero(has)
        closed[hs] = (counts[hs] >= 2) & np.all(pts[first[hs]] == pts[last[hs]], axis=1)
        keep = np.ones(len(pts), bool)
        if len(pts) > 1:
            rr = np.round(pts, dec)
            keep[1:] = np.any(rr[1:] != rr[:-1], axis=1)
        keep[first[hs]] = True
        keep[last[np.flatnonzero(closed)]] = False  # open the ring
        body_counts = np.bincount(rowids[keep], minlength=R).astype(np.int64)
        bpts = pts[keep]
        boff = np.zeros(R + 1, np.int64)
        np.cumsum(body_counts, out=boff[1:])
        brow = np.repeat(np.arange(R), body_counts)

        valid = closed & (body_counts >= 3)
        if not valid.any():
            return [], []

        n = len(bpts)
        idx = np.arange(n)
        pos = idx - boff[brow]
        seg_n = body_counts[brow]
        seg_first = boff[brow]
        nxt = np.where(pos + 1 < seg_n, idx + 1, seg_first)
        prv = np.where(pos > 0, idx - 1, seg_first + seg_n - 1)

        P, Pn = bpts, bpts[nxt]
        nx = np.bincount(brow, (P[:, 1] - Pn[:, 1]) * (P[:, 2] + Pn[:, 2]), R)
        ny = np.bincount(brow, (P[:, 2] - Pn[:, 2]) * (P[:, 0] + Pn[:, 0]), R)
        nz = np.bincount(brow, (P[:, 0] - Pn[:, 0]) * (P[:, 1] + Pn[:, 1]), R)
        mag = np.sqrt(nx * nx + ny * ny + nz * nz)
        valid &= mag > 0.0
        safe = np.where(mag > 0, mag, 1.0)
        un_x, un_y, un_z = nx / safe, ny / safe, nz / safe

        # planarity: max |(p - centroid) . unit_normal| per row <= eps
        denom = np.maximum(body_counts, 1)
        cx = np.bincount(brow, P[:, 0], R) / denom
        cy = np.bincount(brow, P[:, 1], R) / denom
        cz = np.bincount(brow, P[:, 2], R) / denom
        d = np.abs(
            (P[:, 0] - cx[brow]) * un_x[brow]
            + (P[:, 1] - cy[brow]) * un_y[brow]
            + (P[:, 2] - cz[brow]) * un_z[brow]
        )
        dmax = np.zeros(R)
        ne = body_counts > 0
        if ne.any():
            red = np.maximum.reduceat(d, boff[:-1][ne]) if len(d) else np.zeros(0)
            dmax[ne] = red
        valid &= dmax <= cfg.planarity_eps
        if not valid.any():
            return [], []

        # ---- projection axis (geom.projection_axis, vectorized) ----
        ptp_x = np.zeros(R)
        if ne.any():
            mx = np.maximum.reduceat(P[:, 0], boff[:-1][ne])
            mn = np.minimum.reduceat(P[:, 0], boff[:-1][ne])
            ptp_x[ne] = mx - mn
        axis = np.where(
            np.abs(un_z) >= cfg.vertical_nz_tol,
            geom.AXIS_XY,
            np.where(ptp_x < 1e-12, geom.AXIS_YZ, geom.AXIS_XZ),
        )
        UCOL = np.array([0, 0, 1])  # AXIS_XY, AXIS_XZ, AXIS_YZ
        VCOL = np.array([1, 2, 2])
        u = P[idx, UCOL[axis[brow]]]
        v = P[idx, VCOL[axis[brow]]]
        area2 = np.bincount(brow, u * v[nxt] - u[nxt] * v, R)

        # ---- strict-convexity gate in CCW space (geom.convex_fan) ----
        cw = area2 < 0
        perm = np.where(cw[brow], seg_first + (seg_n - 1) - pos, idx)
        uw, vw = u[perm], v[perm]
        tc = (uw - uw[prv]) * (vw[nxt] - vw) - (vw - vw[prv]) * (uw[nxt] - uw)
        lu = uw[seg_first + seg_n - 1]
        lv = vw[seg_first + seg_n - 1]
        fu, fv = uw - lu, vw - lv
        g = fu * fv[nxt] - fu[nxt] * fv
        gate_pts = np.where(
            pos <= seg_n - 3, np.minimum(tc, g), np.minimum(tc, np.inf)
        )
        min_gate = np.full(R, -np.inf)
        if ne.any():
            min_gate[ne] = np.minimum.reduceat(gate_pts, boff[:-1][ne])
        fast = valid & (nholes == 0) & (area2 != 0.0) & (min_gate > geom._FAN_EPS)
        slow_rows = np.flatnonzero(valid & ~fast)

        # ---- fan triangles for the fast rows ----
        w3 = bpts[perm]
        tri_counts = np.where(fast, body_counts - 2, 0)
        T = int(tri_counts.sum())
        trow_f = np.repeat(np.arange(R), tri_counts)
        cum = np.zeros(R + 1, np.int64)
        np.cumsum(tri_counts, out=cum[1:])
        tk = np.arange(T) - cum[trow_f]
        base = boff[trow_f]
        bc = body_counts[trow_f]
        i0 = base + bc - 1
        i1 = base + tk
        i2 = base + tk + 1
        lastm = tk == bc - 3
        i0[lastm] = base[lastm] + bc[lastm] - 3
        i1[lastm] = base[lastm] + bc[lastm] - 2
        i2[lastm] = base[lastm] + bc[lastm] - 1
        tris_f = np.stack([w3[i0], w3[i1], w3[i2]], axis=1)
        # winding flip against the original (pre-reversal) Newell normal
        tn = np.cross(tris_f[:, 1] - tris_f[:, 0], tris_f[:, 2] - tris_f[:, 0])
        nrm = np.column_stack([un_x, un_y, un_z])[trow_f]
        flip = np.einsum("ij,ij->i", tn, nrm) < 0
        tris_f[flip] = tris_f[flip][:, ::-1, :]

        if not len(slow_rows):
            return [trow_f], [tris_f]

        # ---- fallback rows + ordered merge ----
        srow_list, stris_list = self._rows_fallback(batch, slow_rows)
        if not stris_list:
            return [trow_f], [tris_f]
        # merge the two row-sorted streams
        trows = np.concatenate([trow_f] + srow_list)
        tris = np.concatenate([tris_f] + stris_list) if len(tris_f) else np.concatenate(stris_list)
        order = np.argsort(trows, kind="stable")
        # stable sort keeps per-row emission order within each source, and
        # fast/slow rows are disjoint so the interleave is exact
        return [trows[order]], [tris[order]]

    def _rows_fallback(self, batch: pa.Table, rows: np.ndarray):
        """Per-polygon kernel for the rows the batch path can't take."""
        pts, off = ring_column(batch["exterior"])
        ipts, iring_off, irow_off = rings_column(batch["interiors"])
        trow_list, tri_list = [], []
        for i in rows:
            i = int(i)
            ext = pts[off[i] : off[i + 1]]
            holes = [
                ipts[iring_off[r] : iring_off[r + 1]]
                for r in range(irow_off[i], irow_off[i + 1])
            ]
            ext = geom.clean_ring(ext, self.cfg.vertex_round_decimals)
            ok, _ = geom.is_valid_ring(ext, self.cfg)
            if not ok:
                continue
            tris = geom.triangulate_polygon(ext, holes, self.cfg)
            if len(tris):
                trow_list.append(np.full(len(tris), i, np.int64))
                tri_list.append(tris)
        return trow_list, tri_list
