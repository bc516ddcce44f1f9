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
    # corner order per triangle: p0, p1, p2 (columns are arrays-of-xyz —
    # stack whole columns, no per-cell Python conversion)
    tri_pts = np.stack(
        [np.stack(g[c].to_numpy()).astype(np.float64) for c in ("p0", "p1", "p2")],
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


def _intern_building_rings(g: pd.DataFrame, decimals: int) -> pd.DataFrame:
    """Phase 1 for polypreserve mode (``-p`` / SKIPTRI,
    CityGML2OBJs.py:137-141): each polygon becomes ONE face over its
    cleaned ring minus the closure point; vertex interning is the same
    first-appearance scheme as the triangle path. Emits ``face_lens`` so
    the renderer can split the ragged face index list."""
    from .. import geom

    g = g.sort_values("poly_seq", kind="stable")
    rings: list[np.ndarray] = []
    for ext in g.exterior:
        ring = geom.clean_ring(np.asarray([list(p) for p in ext], dtype=np.float64))
        if len(ring) >= 4:
            rings.append(ring[:-1])
    if not rings:
        return pd.DataFrame(
            [
                dict(
                    building_id=g.building_id.iloc[0],
                    building_seq=int(g.building_seq.iloc[0]),
                    n_vertices=0, verts=[], faces=[], face_lens=[], n_faces=0,
                )
            ]
        )
    flat = np.concatenate(rings)
    lens = [len(r) for r in rings]
    keys = vertex_key(flat, decimals)
    uniq, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")
    rank_of = np.empty(len(order), dtype=np.int64)
    rank_of[order] = np.arange(len(order))
    local_index = rank_of[inverse]
    verts = flat[first_idx[order]]
    return pd.DataFrame(
        [
            dict(
                building_id=g.building_id.iloc[0],
                building_seq=int(g.building_seq.iloc[0]),
                n_vertices=len(verts),
                verts=verts.ravel().tolist(),
                faces=local_index.tolist(),
                face_lens=lens,
                n_faces=len(lens),
            )
        ]
    )


def _intern_bucket_vectorized(g: pd.DataFrame, decimals: int) -> pd.DataFrame:
    """All (class, building) groups of one bucket interned in ONE
    vectorized pass (the per-group loop paid pandas sort/stack/unique
    overhead ~4850 times per sf0.1 convert). Dedup key = byte view of the
    rounded (-0.0-folded) xyz triple — the same equivalence classes as
    ``geom.vertex_key``'s repr strings (both injective on float64), with
    no per-point string building. First-appearance order per group falls
    out of one global ``np.unique`` + stable argsort."""
    g = g.sort_values(
        ["semantic", "building_seq", "poly_seq", "tri_seq"], kind="stable"
    ).reset_index(drop=True)
    T = len(g)
    tri_pts = np.stack(
        [np.stack(g[c].to_numpy()).astype(np.float64) for c in ("p0", "p1", "p2")],
        axis=1,
    )  # (T, 3, 3)
    flat = tri_pts.reshape(-1, 3)
    r = np.round(flat, decimals) + 0.0  # fold -0.0 (same as vertex_key)
    rb = np.ascontiguousarray(r).view(np.dtype((np.void, 24))).ravel()
    kcode, _ = pd.factorize(rb, sort=False)
    # contiguous group id per triangle (rows are group-sorted)
    sem = g.semantic.to_numpy()
    seq = g.building_seq.to_numpy()
    new_grp = np.concatenate(
        [[True], (sem[1:] != sem[:-1]) | (seq[1:] != seq[:-1])]
    )
    grp_t = np.cumsum(new_grp) - 1  # (T,)
    grp = np.repeat(grp_t, 3)
    K = int(kcode.max()) + 1 if len(kcode) else 1
    pcode = grp.astype(np.int64) * K + kcode
    uniq, first_idx, inverse = np.unique(pcode, return_index=True, return_inverse=True)
    order = np.argsort(first_idx, kind="stable")  # global first-appearance
    # unique pairs in `order` are group-contiguous (groups are row-contiguous)
    g_of_u = (uniq // K)[order]
    u_new_grp = np.concatenate([[True], g_of_u[1:] != g_of_u[:-1]])
    grp_start = np.maximum.accumulate(np.where(u_new_grp, np.arange(len(g_of_u)), 0))
    rank_sorted = np.arange(len(g_of_u)) - grp_start  # local 0-based index
    rank_of = np.empty(len(order), dtype=np.int64)
    rank_of[order] = rank_sorted
    local_index = rank_of[inverse]  # per corner
    verts_all = flat[first_idx[order]]  # group-major first-appearance verts

    # per-group slices
    tri_counts = np.bincount(grp_t, minlength=grp_t[-1] + 1 if T else 0)
    vert_counts = np.bincount(g_of_u.astype(np.int64), minlength=len(tri_counts))
    tri_bounds = np.concatenate([[0], np.cumsum(tri_counts) * 3])
    vert_bounds = np.concatenate([[0], np.cumsum(vert_counts)])
    first_rows = np.concatenate([[0], np.cumsum(tri_counts)])[:-1]
    rows = []
    bids = g.building_id.to_numpy()
    for j in range(len(tri_counts)):
        i0 = int(first_rows[j])
        rows.append(
            dict(
                building_id=bids[i0],
                building_seq=int(seq[i0]),
                n_vertices=int(vert_counts[j]),
                verts=verts_all[vert_bounds[j] : vert_bounds[j + 1]].ravel().tolist(),
                faces=local_index[tri_bounds[j] : tri_bounds[j + 1]].tolist(),
                semantic=sem[i0],
            )
        )
    return pd.DataFrame(rows)


def _render_blocks(
    interned: rd.Dataset,
    cfg: EngineConfig,
    group_markers: bool,
    mtl_values: dict[str, float] | None,
    mtl_range: tuple[float, float] | None,
) -> rd.Dataset | None:
    """Phase 2 (distributed): per-building OBJ text blocks with GLOBAL
    1-based face indices. The driver touches only the tiny
    (building_seq, n_vertices) projection — the offset cumsum — which is
    broadcast back for the distributed render; full verts/faces never
    reach the driver (CityGML2OBJs.py:767-770 local→global merge)."""
    import ray

    counts = interned.select_columns(["building_seq", "n_vertices"]).to_pandas()
    if counts.empty:
        return None
    counts = counts.sort_values("building_seq").reset_index(drop=True)
    offsets = np.concatenate([[0], np.cumsum(counts.n_vertices.to_numpy())])[:-1]
    off_ref = ray.put(dict(zip(counts.building_seq.tolist(), offsets.tolist())))
    mtl_ref = ray.put(mtl_values) if mtl_values is not None else None

    def render(df: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref) if isinstance(off_ref, ray.ObjectRef) else off_ref
        mvals = None
        if mtl_ref is not None:
            mvals = ray.get(mtl_ref) if isinstance(mtl_ref, ray.ObjectRef) else mtl_ref
        texts = []
        for row in df.itertuples():
            lines: list[str] = []
            if group_markers:
                lines.append(f"o {row.building_id}")
            v = np.asarray(row.verts, dtype=np.float64).reshape(-1, 3)
            for p in v:
                # full-precision shortest repr: exact float round-trip (the
                # reference also writes str(float) — CityGML2OBJs.py:61-65)
                lines.append(f"v {p[0]!r} {p[1]!r} {p[2]!r}")
            if mvals is not None and mtl_range is not None:
                val = mvals.get(row.building_id)
                if val is not None:
                    b = mtl_bucketize(
                        np.array([val]), mtl_range[0], mtl_range[1], cfg.mtl_bins
                    )[0]
                    lines.append(f"usemtl m{round(b * (cfg.mtl_bins - 1)):03d}")
            fidx = np.asarray(row.faces, dtype=np.int64) + 1 + offs[int(row.building_seq)]
            if hasattr(row, "face_lens") and row.face_lens is not None:
                # polypreserve: ragged faces (one per polygon)
                pos = 0
                for ln in row.face_lens:
                    lines.append("f " + " ".join(str(i) for i in fidx[pos : pos + ln]))
                    pos += ln
            else:
                for a, b_, c in fidx.reshape(-1, 3):
                    lines.append(f"f {a} {b_} {c}")
            texts.append("\n".join(lines))
        return pd.DataFrame({"building_seq": df.building_seq.to_numpy(), "text": texts})

    return interned.map_batches(render, batch_format="pandas")


def write_obj_class(
    tris: rd.Dataset,
    fh,
    cfg: EngineConfig = DEFAULT_CONFIG,
    group_markers: bool = True,
    mtl_values: dict[str, float] | None = None,
    mtl_range: tuple[float, float] | None = None,
    preserve: bool = False,
) -> None:
    """Assemble one semantic class's triangle rows into OBJ text, STREAMED
    to ``fh`` in ``building_seq`` order.

    Phase 1 (distributed): per-building first-appearance vertex interning.
    Phase 2 (driver): offset cumsum over the tiny (building_seq,
    n_vertices) projection. Phase 3 (distributed): per-building text
    render with broadcast offsets. The driver only streams finished text
    to the sink — it never holds the class geometry."""
    # two-level grouping: shuffle on a COARSE bucket (~64 buildings per
    # group) and loop per building inside — per-group scheduling overhead
    # is paid ~n_buildings/64 times, not once per building (measured 3x
    # on the sf0.1 OBJ convert). building_id grouping semantics unchanged:
    # the bucket is a pure function of building_seq.
    intern_fn = _intern_building_rings if preserve else _intern_building

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=(df.building_seq.to_numpy() // 64))

    def intern_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = [
            intern_fn(bg, cfg.vertex_round_decimals)
            for _, bg in g.groupby("building_id", sort=False)
        ]
        return pd.concat(out).drop(columns=["_bucket"], errors="ignore")

    interned = (
        tris.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(intern_bucket, batch_format="pandas")
    )
    interned = interned.materialize()
    blocks = _render_blocks(interned, cfg, group_markers, mtl_values, mtl_range)
    if blocks is None:
        fh.write("# empty\n")
        return
    fh.write("# citygml2objv2_ray OBJ export\n")
    if mtl_values is not None:
        fh.write("mtllib colormap.mtl\n")
    for batch in blocks.sort("building_seq").iter_batches(batch_format="pandas"):
        for t in batch["text"]:
            fh.write(t)
            fh.write("\n")


def assemble_obj_class(
    tris: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    group_markers: bool = True,
    mtl_values: dict[str, float] | None = None,
    mtl_range: tuple[float, float] | None = None,
) -> str:
    """In-memory convenience wrapper over the streaming writer (tests /
    small classes)."""
    import io

    buf = io.StringIO()
    write_obj_class(tris, buf, cfg, group_markers, mtl_values, mtl_range)
    return buf.getvalue()


def write_obj_per_class(
    tris: rd.Dataset,
    out_dir: str,
    name: str = "model",
    cfg: EngineConfig = DEFAULT_CONFIG,
    preserve: bool = False,
    group_markers: bool = True,
) -> dict[str, str]:
    """One OBJ file per nonempty semantic class:
    ``<name>-<class>.obj`` (CityGML2OBJs.py:810-822). With
    ``preserve=True`` the input is the VALIDATED SURFACES table and each
    polygon becomes one n-gon face (``-p`` / SKIPTRI parity).

    ONE shuffle interns every (class, building) at once — the round-2
    shape looped classes serially, each with its own shuffle+materialize
    over the shared input (VERDICT r2 item 7). Offsets are a per-class
    cumsum over the tiny (semantic, building_seq, n_vertices) projection;
    the rendered blocks are sorted once on (semantic, building_seq) and
    streamed to the per-class files in a single pass. Output bytes are
    identical to the per-class path."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    intern_fn = _intern_building_rings if preserve else _intern_building

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # composite coarse bucket per (class, 64-building block): all
        # classes ride one shuffle; per-group overhead stays ~n/64
        return df.assign(
            _bucket=df.semantic.astype(str) + "|" + (df.building_seq // 64).astype(str)
        )

    def intern_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if preserve:
            out = []
            for (sem, _), bg in g.groupby(["semantic", "building_id"], sort=False):
                r = intern_fn(bg, cfg.vertex_round_decimals)
                r["semantic"] = sem
                out.append(r)
            return pd.concat(out).drop(columns=["_bucket"], errors="ignore")
        return _intern_bucket_vectorized(g, cfg.vertex_round_decimals)

    interned = (
        tris.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(intern_bucket, batch_format="pandas")
        .materialize()
    )
    counts = interned.select_columns(["semantic", "building_seq", "n_vertices"]).to_pandas()
    if counts.empty:
        return {}
    counts = counts.sort_values(["semantic", "building_seq"]).reset_index(drop=True)
    counts["off"] = counts.groupby("semantic").n_vertices.cumsum() - counts.n_vertices
    off_ref = ray.put(
        {
            (s, int(b)): int(o)
            for s, b, o in zip(counts.semantic, counts.building_seq, counts.off)
        }
    )

    def render(df: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref) if isinstance(off_ref, ray.ObjectRef) else off_ref
        texts = []
        for row in df.itertuples():
            lines: list[str] = []
            if group_markers:
                lines.append(f"o {row.building_id}")
            v = np.asarray(row.verts, dtype=np.float64).reshape(-1, 3)
            for p in v:
                lines.append(f"v {p[0]!r} {p[1]!r} {p[2]!r}")
            fidx = (
                np.asarray(row.faces, dtype=np.int64)
                + 1
                + offs[(row.semantic, int(row.building_seq))]
            )
            if hasattr(row, "face_lens") and row.face_lens is not None:
                pos = 0
                for ln in row.face_lens:
                    lines.append("f " + " ".join(str(i) for i in fidx[pos : pos + ln]))
                    pos += ln
            else:
                for a, b_, c in fidx.reshape(-1, 3):
                    lines.append(f"f {a} {b_} {c}")
            texts.append("\n".join(lines))
        return pd.DataFrame(
            {
                "semantic": df.semantic.to_numpy(),
                "building_seq": df.building_seq.to_numpy(),
                "text": texts,
            }
        )

    blocks = interned.map_batches(render, batch_format="pandas").sort(
        ["semantic", "building_seq"]
    )
    out: dict[str, str] = {}
    fh = None
    cur = None
    try:
        for batch in blocks.iter_batches(batch_format="pandas"):
            for sem, text in zip(batch["semantic"], batch["text"]):
                if sem != cur:
                    if fh is not None:
                        fh.close()
                    cur = sem
                    path = os.path.join(out_dir, f"{name}-{sem}.obj")
                    out[sem] = path
                    fh = open(path, "w")
                    fh.write("# citygml2objv2_ray OBJ export\n")
                fh.write(text)
                fh.write("\n")
    finally:
        if fh is not None:
            fh.close()
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
