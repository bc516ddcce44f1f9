"""Straight-line sequential oracle (SURVEY.md §5.2 item 3): re-implements
the reference's OBJ assembly semantics as the reference does it — one
process, document order, dict-based first-appearance vertex interning with
building-local scope merged into a global list with offset shift
(CityGML2OBJs.py:68-77,156,188,767-770) — with NO Ray machinery. The Ray
engine's two-phase distributed interning must reproduce these indices
EXACTLY.
"""

from __future__ import annotations

import numpy as np

from citygml2objv2_ray import geom


def sequential_obj_assembly(surfaces_df, semantic: str, decimals: int = 9):
    """Returns (vertices list, faces list of 1-based index triples) for one
    semantic class, in strict document order."""
    vertices: list[tuple] = []
    faces: list[tuple[int, int, int]] = []
    df = surfaces_df[surfaces_df.semantic == semantic].sort_values(
        ["building_seq", "poly_seq"], kind="stable"
    )
    for _, g in df.groupby("building_seq", sort=True):
        local: dict[str, int] = {}          # building-local first-appearance
        local_verts: list[tuple] = []
        shift = len(vertices)               # global offset (':767-770')
        for _, row in g.iterrows():
            ext = geom.clean_ring(np.asarray([list(p) for p in row.exterior], dtype=np.float64))
            ok, _ = geom.is_valid_ring(ext)
            if not ok:
                continue
            holes = [np.asarray([list(p) for p in h], dtype=np.float64) for h in row.interiors]
            tris = geom.triangulate_polygon(ext, holes)
            for t in tris:
                idxs = []
                for p in t:
                    key = "|".join(map(repr, np.round(p, decimals) + 0.0))
                    if key not in local:            # get_index (':68-77')
                        local[key] = len(local_verts)
                        local_verts.append(tuple(p))
                    idxs.append(local[key] + shift + 1)  # 1-based + shift
                faces.append(tuple(idxs))
        vertices.extend(local_verts)
    return vertices, faces
