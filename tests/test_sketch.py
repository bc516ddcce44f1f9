"""HLL sketch accuracy + mergeability."""

from __future__ import annotations

import numpy as np
import pytest

from citygml2objv2_ray.sketch import HLL, approx_distinct, hash_values


class TestHLL:
    def test_accuracy_ints(self):
        rng = np.random.default_rng(5)
        for true_n in (100, 5000, 100_000):
            vals = rng.integers(0, 10**12, size=true_n)
            est = HLL(12).add_hashes(hash_values(np.unique(vals))).estimate()
            assert abs(est - len(np.unique(vals))) / len(np.unique(vals)) < 0.05

    def test_merge_equals_union(self):
        rng = np.random.default_rng(6)
        a = rng.integers(0, 10**9, size=20000)
        b = rng.integers(0, 10**9, size=20000)
        sa = HLL(12).add_hashes(hash_values(a))
        sb = HLL(12).add_hashes(hash_values(b))
        both = HLL(12).add_hashes(hash_values(np.concatenate([a, b])))
        merged = sa.merge(sb)
        assert merged.estimate() == pytest.approx(both.estimate())

    def test_serialization_roundtrip(self):
        s = HLL(12).add_hashes(hash_values(np.arange(1000)))
        s2 = HLL.from_bytes(s.to_bytes())
        assert s2.estimate() == s.estimate()

    def test_string_hashing(self):
        est = HLL(12).add_hashes(hash_values([f"user{i}" for i in range(3000)])).estimate()
        assert abs(est - 3000) / 3000 < 0.05

    def test_ray_approx_distinct_vs_exact(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd

        exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()[0]
        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        est = approx_distinct(ds, "user_id")
        assert abs(est - exact) / exact < 0.03
