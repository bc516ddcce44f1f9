"""Engine configuration.

The reference keeps run state in mutable module globals
(``config.py:1-7``, ``CityGML2OBJs.py:544-580``); here every tolerance and
knob is one immutable dataclass passed explicitly into stages / actor
constructors, so parallel workers can never observe torn state.

Tolerances mirror the reference's scattered constants
(SURVEY.md §7.4): planarity eps 0.01 (``polygon3dmodule.py:115``),
segment-intersection eps 1e-5 (``polygon3dmodule.py:185``), normal-compare
tol 0.1 (``polygon3dmodule.py:418``), vertical-polygon test |n_z| < 0.1
(``polygon3dmodule.py:603``), bbox buffer 3.0 m
(``componentseparationmodule.py:103-109``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# The 11 semantic surface classes of CityGML LOD2+ (CityGML2OBJs.py:559-562)
SEMANTIC_CLASSES: tuple[str, ...] = (
    "GroundSurface",
    "WallSurface",
    "RoofSurface",
    "ClosureSurface",
    "CeilingSurface",
    "InteriorWallSurface",
    "FloorSurface",
    "OuterCeilingSurface",
    "OuterFloorSurface",
    "Door",
    "Window",
)
OTHER_CLASS = "Other"
OPENING_CLASSES: tuple[str, ...] = ("Door", "Window")

# Classes whose exterior points feed the buffered bbox
# (componentseparationmodule.py:74-101: Ground/Wall/Roof/Closure/OuterCeiling)
BBOX_CLASSES: tuple[str, ...] = (
    "GroundSurface",
    "WallSurface",
    "RoofSurface",
    "ClosureSurface",
    "OuterCeilingSurface",
)


@dataclass(frozen=True)
class EngineConfig:
    # geometry tolerances (reference parity)
    planarity_eps: float = 0.01          # polygon3dmodule.py:115
    intersect_eps: float = 1e-5          # polygon3dmodule.py:185
    normal_compare_tol: float = 0.1      # polygon3dmodule.py:418
    vertical_nz_tol: float = 0.1         # polygon3dmodule.py:603
    bbox_buffer: float = 3.0             # componentseparationmodule.py:103-109
    vertex_round_decimals: int = 9       # exact-dedup key rounding for float64 xyz
    # opt-in CORRECT self-intersection clause (the reference's isPolySimple
    # is disabled dead code, polygon3dmodule.py:98-101/126-204; default
    # False = bug-for-bug parity)
    strict_valid: bool = False

    # spatial grid (H3/S2 stand-in: integer lat/lng-style grid, SURVEY §2.F)
    cell_size: float = 64.0              # world units per cell at the join resolution
    knn_k: int = 3                       # kNN neighbours per image
    knn_max_ring: int = 4                # max grid rings searched for neighbours

    # skew handling
    salt_buckets: int = 8                # sub-buckets for hot cells
    hot_cell_threshold: int = 4096       # rows per cell above which salting kicks in

    # super-group shuffles (ops.supergroup_agg / dedup.supergroup_of):
    # num_groups = clamp(n_rows // target, min, max) — 64 reduce tasks is
    # right for this sandbox but caps shuffle parallelism and lets
    # per-group memory grow linearly with corpus size at 100 TB
    supergroup_target_rows: int = 1_000_000
    supergroup_min: int = 64
    supergroup_max: int = 4096

    # broadcast-vs-partition join switch: a materialized selective side at
    # or under this row count is ray.put once and merged map-side in every
    # probe task (no join shuffle); above it, hash-partitioned Dataset.join
    broadcast_join_rows: int = 200_000

    # near-dup VERIFY broadcast switch: at or under this many docs the
    # exact-Jaccard verification runs MAP-SIDE against a ray.put arrow
    # doc->text table instead of the two-shuffle distributed tail. The
    # higher cap (vs broadcast_join_rows) is deliberate: the arrow LUT is
    # ONE zero-copy object-store copy shared by every worker (not a
    # per-worker heap copy), so the budget is plasma space (~1 GB at
    # ~1 KB/doc here), and the switch measured faster at 300k (10.9 vs
    # 12.8 s) and 1M docs (47.9 vs 55.5 s) with identical output
    broadcast_verify_rows: int = 1_000_000

    # batching — join batch also sets downstream BLOCK granularity: the
    # decode pool's parallelism is bounded by upstream block count (tuned
    # via ds.stats(): 8192 starved the decode pool to 13 tasks)
    geometry_batch_size: int = 2048
    image_batch_size: int = 1024         # wide binary rows → smallish batches
    join_batch_size: int = 1024          # small is fine: per-cell kNN sets cached
    write_batch_size: int = 8192         # per write task (32k bundling stalled the stream)
    n_output_parts: int = 16             # output partition fan-out (resume unit)

    # mtl bucketize (CityGML2OBJs.py:383-411): 101 bins over [min, max]
    mtl_bins: int = 101

    semantic_classes: tuple[str, ...] = field(default=SEMANTIC_CLASSES)


DEFAULT_CONFIG = EngineConfig()
