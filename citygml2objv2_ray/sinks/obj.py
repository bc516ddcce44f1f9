"""OBJ assembly + sinks — the reference's output path (SURVEY.md §2.E):

- **exact vertex dedup + 1-based index assignment** (C4/D1,
  CityGML2OBJs.py:68-77): per semantic class, vertices are interned in
  first-appearance order. The reference does a sequential O(n) list scan
  per vertex; here it's a two-phase distributed assignment: per-building
  interning in parallel (building-local scope, as the reference's
  ``local_vertices``), then a tiny driver-side offset cumsum in
  ``building_seq`` order and a distributed re-offset (the local→global
  merge at CityGML2OBJs.py:767-770).
- **per-class OBJ writer** (E1, CityGML2OBJs.py:61-65,80-84,807-822): one
  ``<name>-<class>.obj`` per nonempty semantic class, with ``o <id>``
  group markers and optional ``usemtl`` per bucketized attribute (B18).
- **MTL writer** (E8, generateMTL.py:31-52): 101-material afmhot colormap.

Determinism: output depends only on (building_seq, poly_seq, tri_seq)
ordering columns, never on execution order (SURVEY.md D9).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..geom import mtl_bucketize, vertex_key


def _intern_building(g: pd.DataFrame, decimals: int) -> pd.DataFrame:
    """Phase 1 (parallel, per building×class): first-appearance vertex
    interning in (poly_seq, tri_seq, corner) order. Emits one summary row:
    the building's vertex block + faces with building-LOCAL 0-based indices."""
    g = g.sort_values(["poly_seq", "tri_seq"], kind="stable")
    # corner order per triangle: p0, p1, p2
    tri_pts = np.stack(
        [
            np.stack([np.asarray(list(p), dtype=np.float64) for p in g[c]])
            for c in ("p0", "p1", "p2")
        ],
        axis=1,
    )  # (T, 3, 3)
    flat = tri_pts.reshape(-1, 3)
    keys = vertex_key(flat, decimals)
    uniq, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")  # first-appearance order
    rank_of = np.empty(len(order), dtype=np.int64)
    rank_of[order] = np.arange(len(order))
    local_index = rank_of[inverse]  # 0-based local index per corner
    verts = flat[first_idx[order]]
    return pd.DataFrame(
        [
            dict(
                building_id=g.building_id.iloc[0],
                building_seq=int(g.building_seq.iloc[0]),
                n_vertices=len(verts),
                verts=verts.ravel().tolist(),
                faces=local_index.tolist(),
                n_faces=len(flat) // 3,
            )
        ]
    )


def assemble_obj_class(
    tris: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    group_markers: bool = True,
    mtl_values: dict[str, float] | None = None,
    mtl_range: tuple[float, float] | None = None,
) -> str:
    """Assemble one semantic class's triangle rows into OBJ text.

    Distributed phase 1 interning per building, driver-side offset cumsum
    (bytes proportional to #buildings, not #vertices), distributed face
    re-offset is folded into the final text render (per building)."""
    summaries = (
        tris.groupby("building_id")
        .map_groups(
            _intern_building,
            batch_format="pandas",
            fn_kwargs={"decimals": cfg.vertex_round_decimals},
        )
        .to_pandas()
    )
    if not len(summaries):
        return "# empty\n"
    summaries = summaries.sort_values("building_seq").reset_index(drop=True)
    offsets = np.concatenate([[0], np.cumsum(summaries.n_vertices.to_numpy())])[:-1]

    lines: list[str] = ["# citygml2objv2_ray OBJ export"]
    if mtl_values is not None:
        lines.append("mtllib colormap.mtl")
    for i, row in summaries.iterrows():
        if group_markers:
            lines.append(f"o {row.building_id}")
        v = np.asarray(row.verts, dtype=np.float64).reshape(-1, 3)
        for p in v:
            # full-precision shortest repr: exact float round-trip (the
            # reference also writes str(float) — CityGML2OBJs.py:61-65)
            lines.append(f"v {p[0]!r} {p[1]!r} {p[2]!r}")
        if mtl_values is not None and mtl_range is not None:
            val = mtl_values.get(row.building_id)
            if val is not None:
                b = mtl_bucketize(np.array([val]), mtl_range[0], mtl_range[1], cfg.mtl_bins)[0]
                lines.append(f"usemtl m{round(b * (cfg.mtl_bins - 1)):03d}")
        f = np.asarray(row.faces, dtype=np.int64).reshape(-1, 3) + 1 + offsets[i]
        for a, b_, c in f:
            lines.append(f"f {a} {b_} {c}")
    return "\n".join(lines) + "\n"


def write_obj_per_class(
    tris: rd.Dataset,
    out_dir: str,
    name: str = "model",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> dict[str, str]:
    """One OBJ file per nonempty semantic class:
    ``<name>-<class>.obj`` (CityGML2OBJs.py:810-822)."""
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.compute as pc

    classes = sorted(tris.unique("semantic"))
    out: dict[str, str] = {}
    for cl in classes:
        sub = tris.map_batches(
            lambda b, cl=cl: b.filter(pc.equal(b["semantic"], pa.scalar(cl))),
            batch_format="pyarrow",
        )
        text = assemble_obj_class(sub, cfg)
        path = os.path.join(out_dir, f"{name}-{cl}.obj")
        with open(path, "w") as f:
            f.write(text)
        out[cl] = path
    return out


def parse_obj(text: str) -> tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader for round-trip tests: returns (vertices (V,3),
    faces (F,3) 0-based)."""
    verts, faces = [], []
    for line in text.splitlines():
        if line.startswith("v "):
            verts.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("f "):
            faces.append([int(x.split("/")[0]) - 1 for x in line.split()[1:4]])
    return np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int64)


def afmhot(x: np.ndarray) -> np.ndarray:
    """The afmhot colormap ramp (generateMTL.py uses matplotlib's; this is
    its closed form): R=2x, G=2x-0.5, B=2x-1, each clipped to [0,1]."""
    x = np.asarray(x, dtype=np.float64)
    return np.clip(np.stack([2 * x, 2 * x - 0.5, 2 * x - 1.0], axis=-1), 0.0, 1.0)


def write_mtl(path: str, bins: int = 101) -> str:
    """colormap.mtl with ``bins`` afmhot materials m000..m100
    (generateMTL.py:31-52)."""
    xs = np.linspace(0.0, 1.0, bins)
    rgb = afmhot(xs)
    lines = ["# citygml2objv2_ray colormap"]
    for i, (r, g, b) in enumerate(rgb):
        lines.append(f"newmtl m{i:03d}")
        lines.append(f"Kd {r:.4f} {g:.4f} {b:.4f}")
    text = "\n".join(lines) + "\n"
    with open(path, "w") as f:
        f.write(text)
    return text
