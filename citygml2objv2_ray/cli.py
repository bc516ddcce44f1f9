"""CLI with the reference's flag surface (CityGML2OBJs.py:197-252) — a
CityGML2OBJv2 user's invocation maps one-to-one:

    python CityGML2OBJs.py -i IN -o OUT [-s 1] [-g 1] [-v 1] [-t 1] [-p 1]
                           [-tC 1] [-tCw 1] [-sepC 1] [-appW 1] [-addBB 1]
becomes
    python -m citygml2objv2_ray.cli -i IN -o OUT [same flags]

Flag mapping (reference file:line → engine behaviour):

- ``-s/--semantics``   (:202) per-class OBJ with openings as classes; off →
  openings anti-joined away (``pipelines.convert``).
- ``-g/--grouping``    (:204) ``o <building>`` group markers in the OBJ.
- ``-v/--validation``  (:209) accepted for parity; validation is ALWAYS on
  in this engine (clean_validate flags + skips invalid polygons — the
  reference's -v 0 path feeds unvalidated rings to the triangulator and
  crashes on the corrupt fixtures; there is no useful "off").
- ``-t/--translate``   (:212) subtract the global lexicographic min vertex.
- ``-p/--polypreserve``(:215) SKIPTRI: polygons as n-gon faces, no
  triangulation (CityGML2OBJs.py:137-141).
- ``-tC/-tCw``         (:219,:223) dataset translation pre-pass: exact
  decimal-stable translation to a local CRS (int64 µm fixed point,
  ``exact.py`` — B21); ``-tCw`` also writes ``<name>_local_.gml`` next to
  the output (E6) plus a translation-params record (E7).
- ``-sepC``            (:227) component separation: one OBJ per component
  + index/bbox sidecar parquet (``pipelines.components``).
- ``-appW``            (:231) approximate opening hulls inside -sepC.
- ``-addBB``           (:235) corner-marker triangles inside -sepC.
"""

from __future__ import annotations

import argparse
import glob
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="citygml2objv2_ray")
    p.add_argument("-i", "--directory", required=True, help="input dir of .gml/.xml")
    p.add_argument("-o", "--results", required=True, help="output dir")
    p.add_argument("-s", "--semantics", type=int, default=1)
    p.add_argument("-g", "--grouping", type=int, default=1)
    p.add_argument("-v", "--validation", type=int, default=1)
    p.add_argument("-t", "--translate", type=int, default=0)
    p.add_argument("-p", "--polypreserve", type=int, default=0)
    p.add_argument("-tC", "--translateCityGML", type=int, default=0)
    p.add_argument("-tCw", "--translateCityGMLwrite", type=int, default=0)
    p.add_argument("-sepC", "--separateComponents", type=int, default=0)
    p.add_argument("-appW", "--approximateWindows", type=int, default=0)
    p.add_argument("-addBB", "--addBoundingBox", type=int, default=0)
    return p


def run(args) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .exact import translate_exact, translation_params
    from .pipelines.components import component_sidecars, separate_components
    from .pipelines.convert import convert
    from .sources.citygml import read_citygml, surfaces_to_gml

    os.makedirs(args.results, exist_ok=True)
    outputs: dict = {}

    surfaces_override = None
    if args.translateCityGML or args.translateCityGMLwrite:
        paths = sorted(
            glob.glob(os.path.join(args.directory, "*.gml"))
            + glob.glob(os.path.join(args.directory, "*.xml"))
        )
        surfaces = read_citygml(paths)
        if surfaces.count() == 0:
            raise ValueError(
                f"no parseable CityGML surfaces found under {args.directory!r}; "
                "nothing to translate for -tC/-tCw"
            )
        delta = translation_params(surfaces)
        translated = translate_exact(surfaces, delta)
        outputs["translation_params"] = delta.tolist()
        if args.translateCityGMLwrite:
            import ray as _ray

            tabs = [
                t
                for t in _ray.get(translated.to_arrow_refs())
                if t.num_rows and t.num_columns
            ]
            if not tabs:
                raise ValueError(
                    f"no parseable CityGML surfaces found under {args.directory!r}; "
                    "nothing to translate for -tCw"
                )
            # per-block list field names can drift (item vs element); cast
            # every block to the first block's schema before concat
            tab = pa.concat_tables([t.cast(tabs[0].schema) for t in tabs])
            gml_path = os.path.join(args.results, "model_local_.gml")
            with open(gml_path, "wb") as f:
                f.write(surfaces_to_gml(tab))
            with open(os.path.join(args.results, "translation_params.txt"), "w") as f:
                f.write(" ".join(repr(float(x)) for x in delta) + "\n")
            outputs["translated_gml"] = gml_path
        surfaces_override = translated

    if args.separateComponents:
        src = surfaces_override
        if src is None:
            paths = sorted(
                glob.glob(os.path.join(args.directory, "*.gml"))
                + glob.glob(os.path.join(args.directory, "*.xml"))
            )
            src = read_citygml(paths)
        comps = separate_components(
            src,
            approx_windows=bool(args.approximateWindows),
            corner_markers=bool(args.addBoundingBox),
        ).materialize()

        def write_component_files(df):
            import pandas as pd

            paths_out = []
            for r in df.itertuples():
                p = os.path.join(
                    args.results, f"b{r.building_seq:06d}_c{r.component_seq:03d}.obj"
                )
                with open(p, "w") as f:
                    f.write(r.obj_text)
                paths_out.append(p)
            return pd.DataFrame({"path": paths_out})

        written = comps.map_batches(write_component_files, batch_format="pandas")
        outputs["n_component_files"] = written.count()
        sidecars = component_sidecars(comps)
        sidecars.to_parquet(os.path.join(args.results, "component_index.parquet"))
        outputs["sidecar"] = os.path.join(args.results, "component_index.parquet")
        return outputs

    outputs["obj"] = convert(
        args.directory,
        args.results,
        semantics=bool(args.semantics),
        translate=bool(args.translate),
        preserve=bool(args.polypreserve),
        group_markers=bool(args.grouping),
    )
    return outputs


def main(argv=None) -> None:
    import ray

    # Ray workers inherit PYTHONPATH, not the driver's sys.path — without
    # this, a standalone `python -m citygml2objv2_ray.cli` run (package not
    # pip-installed) fails when workers deserialize map_batches UDFs.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = (
        pkg_root + os.pathsep + os.environ.get("PYTHONPATH", "")
    )

    args = build_parser().parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    out = run(args)
    for k, v in out.items():
        print(f"{k}: {v}")
    ray.shutdown()


if __name__ == "__main__":
    main()
