"""Cached synthetic worlds keyed by scale factor.

The north-rule input table (images + captions) does not exist in
``/root/testdata`` — it is synthesized deterministically (seed 42) at the
matching scale and cached under /tmp so tests/bench/driver queries reuse it.
"""

from __future__ import annotations

import os
import re

import pyarrow.parquet as pq

from . import synth

CACHE_ROOT = os.environ.get("GRAFT_WORLD_CACHE", "/tmp/citygml2objv2_ray_worlds")
# bump whenever the generated layout or schema changes (stale caches poison
# benchmarks — see CLAUDE.md invariants)
LAYOUT_VERSION = 7


def world_dir(sf: float) -> str:
    return os.path.join(CACHE_ROOT, f"sf{sf:g}-v{LAYOUT_VERSION}")


def sf_of_dir(sf_dir: str) -> float:
    """'/root/testdata/sf0.01' → 0.01 (defaults to 0.001 when unparseable)."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def world_paths(sf: float, parallelism: int = 8) -> dict[str, str]:
    """Materialize (once) and return the synthetic world for a scale factor.
    v7: diverse rasters + designed exact/near duplicate tiles (sparse,
    ground-truthed dedup structure); images hive-partitioned by ``part``,
    part-sorted (read-level resume pruning)."""
    out_dir = world_dir(sf)
    return synth.generate_world(out_dir, sf, parallelism=parallelism)


def load_world(sf: float, parallelism: int = 8):
    """(images_path, surfaces Table, footprints Table) for a scale factor."""
    paths = world_paths(sf, parallelism)
    surfaces = pq.read_table(paths["surfaces"])
    footprints = pq.read_table(paths["footprints"])
    return paths["images"], surfaces, footprints
