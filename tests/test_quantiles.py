"""Distributed order statistics: exact quantiles vs numpy ground truth,
sketch error bound, top-k-per-group shapes (the SQL twins are exercised by
tests/test_oracle.py and the driver gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


class TestQuantiles:
    def test_exact_matches_sorted_rank(self, ray_session):
        import ray.data as rd

        from citygml2objv2_ray.relational_stats import (
            QUANTS,
            quantile_disc_distributed,
        )

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
        got = quantile_disc_distributed(ds, "l_extendedprice", QUANTS)
        v = np.sort(
            pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
            .to_pandas()["l_extendedprice"]
            .to_numpy()
        )
        want = [float(v[int(np.floor((len(v) - 1) * q))]) for q in QUANTS]
        assert got == want

    def test_sketch_error_bounded_by_bin_width(self, ray_session):
        import ray.data as rd

        from citygml2objv2_ray.relational_stats import (
            N_BINS,
            QUANTS,
            quantile_disc_distributed,
            quantile_sketch_distributed,
        )

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
        exact = quantile_disc_distributed(ds, "l_extendedprice", QUANTS)
        approx = quantile_sketch_distributed(ds, "l_extendedprice", QUANTS)
        v = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_extendedprice"]).to_pandas()[
            "l_extendedprice"
        ]
        bin_w = (v.max() - v.min()) / N_BINS
        for e, a in zip(exact, approx):
            assert abs(e - a) <= bin_w

    def test_sketch_deterministic(self, ray_session):
        import ray.data as rd

        from citygml2objv2_ray.relational_stats import quantile_sketch_distributed

        ds = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
        a = quantile_sketch_distributed(ds, "l_extendedprice")
        b = quantile_sketch_distributed(ds, "l_extendedprice")
        assert a == b


class TestTopKPerGroup:
    def test_shapes_and_order(self, ray_session):
        from citygml2objv2_ray.relational import REGISTRY
        from citygml2objv2_ray import relational_stats  # noqa: F401

        df = REGISTRY["q_topk_per_group"](SF)
        sizes = df.groupby("o_orderpriority").size()
        assert (sizes <= 3).all() and len(sizes) >= 2
        for _, g in df.groupby("o_orderpriority"):
            assert (g.o_totalprice.to_numpy() == np.sort(g.o_totalprice.to_numpy())[::-1]).all()
