"""Geometry pipelines — the reference's conversion lifecycle (SURVEY.md §3)
as streaming Dataset transforms.

``triangulate_surfaces`` is the §3.1 main path: clean → validate →
triangulate → (optionally) per-semantic partitioned parquet (the per-class
OBJ fan-out, CityGML2OBJs.py:544-580,807-822).

``opening_anti_join`` is D4: exclude Window/Door polygons from wall/roof
processing via a broadcast key-set filter instead of the reference's
identity scan (CityGML2OBJs.py:755-765).

``building_bboxes`` is C3/D7: per-building buffered bbox + translation
params as a grouped aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .. import geom
from ..arrow_utils import ring_column
from ..config import DEFAULT_CONFIG, OPENING_CLASSES, EngineConfig
from ..stages.geometry import Triangulator, clean_validate


def surfaces_dataset(table: pa.Table, num_blocks: int | None = None) -> rd.Dataset:
    """In-memory surfaces table → Dataset split into enough blocks to
    parallelize downstream stages (``rd.from_arrow`` yields ONE block,
    which would serialize the whole triangulation — measured 9s -> 2s on
    the sf0.1 convert)."""
    nb = num_blocks or max(8, min(64, table.num_rows // 256 or 1))
    return rd.from_arrow(table).repartition(nb)


def triangulate_surfaces(
    surfaces: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency: int | tuple[int, int] | None = None,
    out_dir: str | None = None,
) -> rd.Dataset:
    """surfaces → validated → exploded triangles (one row per triangle).
    With ``out_dir``, also writes parquet partitioned by semantic class.

    Both stages run as TASK pools (the triangulator's only state is the
    config dataclass — an actor pool's fixed slots throttled the stage;
    CLAUDE.md perf rule: task pools beat actor pools for cheap state)."""
    validated = surfaces.map_batches(
        clean_validate, batch_format="pyarrow", batch_size=cfg.geometry_batch_size
    )
    tris = validated.map_batches(
        Triangulator(cfg),
        batch_format="pyarrow",
        batch_size=cfg.geometry_batch_size,
    )
    if out_dir:
        tris.write_parquet(out_dir, partition_cols=["semantic"])
        return rd.read_parquet(out_dir)
    return tris


def opening_anti_join(
    surfaces: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG
) -> rd.Dataset:
    """Drop polygons that are openings (Window/Door) from the non-opening
    stream by broadcast anti-filter on poly_id (small side = opening ids).
    The opening-id collection is a vectorized batch filter (is_in + bool
    column), not a per-row Python predicate."""
    import pyarrow.compute as pc

    def opening_ids_in_batch(batch: pa.Table) -> pa.Table:
        mask = pc.or_(
            pc.is_in(batch["semantic"], value_set=pa.array(list(OPENING_CLASSES))),
            batch["is_opening"].combine_chunks(),
        )
        return batch.filter(mask).select(["poly_id"])

    opening_ids = set(
        surfaces.map_batches(opening_ids_in_batch, batch_format="pyarrow")
        .to_pandas()["poly_id"]
        .tolist()
    )
    ids_ref = ray.put(opening_ids)

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        mask = pc.invert(pc.is_in(batch["poly_id"], value_set=pa.array(list(keys))))
        return batch.filter(mask)

    return surfaces.map_batches(flt, batch_format="pyarrow")


def building_bboxes(
    surfaces: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Per-building buffered bbox (C3, componentseparationmodule.py:63-121)
    + translation params (D7, mean of the 8 corner points): a grouped
    aggregate over exploded vertex extents, pre-reduced per batch."""

    def batch_extents(batch: pa.Table) -> pd.DataFrame:
        pts, off = ring_column(batch["exterior"])
        bids = batch["building_id"].to_pylist()
        rows = []
        for i in range(batch.num_rows):
            ring = pts[off[i] : off[i + 1]]
            if not len(ring):
                continue
            lo, hi = ring.min(axis=0), ring.max(axis=0)
            rows.append(
                dict(
                    building_id=bids[i],
                    xmin=lo[0], ymin=lo[1], zmin=lo[2],
                    xmax=hi[0], ymax=hi[1], zmax=hi[2],
                )
            )
        return pd.DataFrame(rows)

    from ray.data.aggregate import Max, Min

    ext = surfaces.map_batches(batch_extents, batch_format="pyarrow")
    agg = ext.groupby("building_id").aggregate(
        Min("xmin", alias_name="xmin"), Min("ymin", alias_name="ymin"),
        Min("zmin", alias_name="zmin"), Max("xmax", alias_name="xmax"),
        Max("ymax", alias_name="ymax"), Max("zmax", alias_name="zmax"),
    )
    df = agg.to_pandas()
    b = cfg.bbox_buffer
    for c, s in [("xmin", -b), ("ymin", -b), ("zmin", -b), ("xmax", b), ("ymax", b), ("zmax", b)]:
        df[c] = df[c] + s
    # translation param = mean of the 8 buffered corners = bbox center
    df["tx"] = (df.xmin + df.xmax) / 2
    df["ty"] = (df.ymin + df.ymax) / 2
    df["tz"] = (df.zmin + df.zmax) / 2
    return df.sort_values("building_id").reset_index(drop=True)


def _roof_tri2d_batch(batch: pa.Table, cfg: EngineConfig) -> pd.DataFrame:
    """One surfaces batch → rows (building_id, flat 2-D triangle coords)."""
    out_b: list[str] = []
    out_c: list[list[float]] = []
    sem = batch["semantic"].to_pylist()
    bids = batch["building_id"].to_pylist()
    pts, off = ring_column(batch["exterior"])
    for i in range(batch.num_rows):
        if sem[i] not in ("RoofSurface", "GroundSurface"):
            continue
        ring = geom.clean_ring(pts[off[i] : off[i + 1]])
        ok, _ = geom.is_valid_ring(ring, cfg)
        if not ok:
            continue
        tris = geom.triangulate_polygon(ring, [], cfg)
        if len(tris):
            out_b.append(bids[i])
            out_c.append(tris[:, :, :2].ravel().tolist())
    return pd.DataFrame({"building_id": out_b, "coords": out_c})


def roof_tri2d(surfaces: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> dict[str, np.ndarray]:
    """Small-side prep for the raster clip stages: per-building 2-D (z
    dropped) triangles of Roof+Ground surfaces → {building_id: (T,3,2)}.

    Triangulation runs DISTRIBUTED via map_batches (the sequential
    driver-side loop was a ~4.5s serial Amdahl head on every sf0.4 run —
    23% of the 16-CPU wall time); the driver only concatenates the compact
    per-polygon coordinate rows it must hold anyway (this dict is the
    ray.put broadcast side). Small tables skip Ray (stage overhead would
    exceed the loop)."""
    if surfaces.num_rows < 2000:
        df = _roof_tri2d_batch(surfaces, cfg)
    else:
        ds = surfaces_dataset(surfaces)
        df = ds.map_batches(
            lambda b: _roof_tri2d_batch(b, cfg), batch_format="pyarrow"
        ).to_pandas()
    out: dict[str, list[np.ndarray]] = {}
    for bid, coords in zip(df.building_id, df.coords):
        out.setdefault(bid, []).append(np.asarray(coords, dtype=np.float64).reshape(-1, 3, 2))
    return {b: np.concatenate(v) for b, v in out.items()}


def global_min_vertex(surfaces: rd.Dataset) -> np.ndarray:
    """Lexicographic global min vertex (D5 — the ``-t`` translate,
    CityGML2OBJs.py:789-805 + polygon3dmodule.py:307-314). Per-batch
    lexicographic min, then a driver-side reduce over the tiny partials
    (order-insensitive per-axis min would NOT match the reference)."""

    def batch_min(batch: pa.Table) -> pd.DataFrame:
        pts, _ = ring_column(batch["exterior"])
        if not len(pts):
            return pd.DataFrame(columns=["x", "y", "z"])
        k = np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))[0]
        return pd.DataFrame([dict(x=pts[k, 0], y=pts[k, 1], z=pts[k, 2])])

    partials = surfaces.map_batches(batch_min, batch_format="pyarrow").to_pandas()
    arr = partials.to_numpy()
    k = np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))[0]
    return arr[k]


def translate_surfaces(surfaces: rd.Dataset, delta: np.ndarray) -> rd.Dataset:
    """Subtract a broadcast translation vector from every vertex (B20/B22 —
    CityGML2OBJs.py:789-805, componentseparationmodule.py:36-61). Exactness
    note (B21): the reference uses decimal-string arithmetic for UTM-scale
    coordinates; on float64 columns, subtracting a representable vector is
    the Arrow-native equivalent and is exactly invertible for the
    fixture coordinate ranges."""
    dx, dy, dz = (float(delta[0]), float(delta[1]), float(delta[2]))

    def sub(batch: pa.Table) -> pa.Table:
        from ..arrow_utils import ring_column as rc, rings_to_arrow

        pts, off = rc(batch["exterior"])
        moved = pts - np.array([dx, dy, dz])
        rings = [moved[off[i] : off[i + 1]] for i in range(batch.num_rows)]
        new_ext = rings_to_arrow(rings)
        i = batch.column_names.index("exterior")
        return batch.set_column(i, "exterior", new_ext)

    return surfaces.map_batches(sub, batch_format="pyarrow")
