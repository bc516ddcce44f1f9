"""End-to-end CityGML → OBJ conversion — the reference's CLI lifecycle
(SURVEY.md §3.1/§3.2) as one streaming pipeline. A CityGML2OBJv2 user's
``python CityGML2OBJs.py -i dir -o dir [-s 1] [-t 1] [-g 1] [-v 1]``
becomes ``convert(in_dir, out_dir, semantics=True, translate=True, ...)``.

    read_citygml(*.gml)               # A1-A12 (exploded per-polygon rows)
    → [opening anti-join]             # D4 when semantics off: drop openings
    → [global min / translate]        # -t: B20/D5, exact fixed point
    → clean_validate → Triangulator   # B1/B2/C1
    → OBJ per semantic class (+MTL)   # C4/D1/E1/E8

Run as a script:  python -m citygml2objv2_ray.pipelines.convert IN_DIR OUT_DIR
"""

from __future__ import annotations

import glob
import os

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sinks.obj import write_mtl, write_obj_per_class
from ..sources.citygml import read_citygml
from .geometry import (
    global_min_vertex,
    opening_anti_join,
    translate_surfaces,
    triangulate_surfaces,
)


def convert(
    in_dir: str,
    out_dir: str,
    name: str = "model",
    semantics: bool = True,
    translate: bool = False,
    preserve: bool = False,
    group_markers: bool = True,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> dict[str, str]:
    """Convert every ``.gml``/``.xml`` under ``in_dir`` to per-class OBJ
    files under ``out_dir``. Returns {semantic_class: path}.

    semantics=False mirrors the reference's default mode: openings
    (Window/Door) are folded away via the anti-join and everything lands in
    per-class files anyway (the reference concatenates all classes when
    ``-s 0``; keeping per-class files is a superset — ``cat`` them for the
    single-file equivalent)."""
    paths = sorted(
        glob.glob(os.path.join(in_dir, "*.gml")) + glob.glob(os.path.join(in_dir, "*.xml"))
    )
    if not paths:
        raise FileNotFoundError(f"no .gml/.xml files under {in_dir}")
    surfaces = read_citygml(paths)
    if not semantics:
        surfaces = opening_anti_join(surfaces, cfg)
    if translate:
        delta = global_min_vertex(surfaces)
        surfaces = translate_surfaces(surfaces, delta)
    if preserve:
        # -p / SKIPTRI (CityGML2OBJs.py:137-141): validate, keep valid
        # polygons as n-gon faces, no triangulation
        import pyarrow.compute as pc

        from ..stages.geometry import clean_validate

        validated = surfaces.map_batches(
            clean_validate, batch_format="pyarrow", batch_size=cfg.geometry_batch_size
        )
        rows = validated.map_batches(
            lambda b: b.filter(b["valid"].combine_chunks()), batch_format="pyarrow"
        )
        out = write_obj_per_class(
            rows, out_dir, name=name, cfg=cfg, preserve=True, group_markers=group_markers
        )
    else:
        tris = triangulate_surfaces(surfaces, cfg)
        out = write_obj_per_class(
            tris, out_dir, name=name, cfg=cfg, group_markers=group_markers
        )
    write_mtl(os.path.join(out_dir, "colormap.mtl"), cfg.mtl_bins)
    # E9 legend artifact for the colormap (plotcolorbar.py:31-77) —
    # closed-form PNG, no matplotlib
    from ..sinks.colorbar import write_colorbar

    write_colorbar(os.path.join(out_dir, "colorbar.png"), bins=cfg.mtl_bins)
    return out


if __name__ == "__main__":
    import sys

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    res = convert(sys.argv[1], sys.argv[2])
    for cl, p in res.items():
        print(f"{cl}: {p}")
    ray.shutdown()
