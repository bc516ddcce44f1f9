#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and
print ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "throughput_rows_s": ...}

--scaling: run the headline pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same (pre-generated, page-warmed) input
and print both throughputs + scaling efficiency (the sandbox proxy for the
north rule's N vs 4N node criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import uuid

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from citygml2objv2_ray import worlds
    from citygml2objv2_ray.pipelines.flagship import run_flagship
    from citygml2objv2_ray import relational, relational_ml  # noqa: F401

    sf = worlds.sf_of_dir(SF_DIR)
    # world generation is one-time input materialization (cached, untimed)
    images_path, surfaces, footprints = worlds.load_world(sf, parallelism=NUM_CPUS)
    # warm the page cache so we measure compute+shuffle, not first disk read
    for root, _, files in os.walk(images_path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass

    queries: dict[str, float] = {}

    # headline: flagship spatial-join + tile assignment (fresh out dir)
    out_root = f"/tmp/citygml2objv2_ray_bench/{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    res = run_flagship(
        images_path, surfaces, footprints, out_root, concurrency=max(2, NUM_CPUS - 4), resume=False
    )
    headline = time.perf_counter() - t0
    queries["flagship_spatial_join"] = round(headline, 3)
    n_rows = res.rows_written

    # secondary pipelines over the driver testdata tables
    for name in [
        "q1_pricing_summary",
        "q_count_by_flag",
        "q_window_hourly",
        "q_dedup_first_event",
        "q_ann_topk",
        "q_exact_dedup_docs",
    ]:
        fn = relational.REGISTRY[name]
        t0 = time.perf_counter()
        fn(SF_DIR)
        queries[name] = round(time.perf_counter() - t0, 3)

    return {
        "metric": "spatial-join + tile-assignment throughput",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "rows": n_rows,
        "throughput_rows_s": round(n_rows / headline, 1) if headline > 0 else None,
    }


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=8 vs 32 (N vs 4N proxy)."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # ensure the world exists before timing either level
    r_lo = one(lo)
    r_hi = one(hi)
    tp_lo = r_lo["throughput_rows_s"]
    tp_hi = r_hi["throughput_rows_s"]
    eff = tp_hi / (tp_lo * (hi / lo))
    return {
        "metric": "scaling efficiency (num_cpus 8 -> 32, fresh processes)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "throughput_rows_s_8": tp_lo,
        "throughput_rows_s_32": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": r_lo["sf"],
        "rows": r_lo["rows"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        import ray

        ray.shutdown()
        print(json.dumps(result))
