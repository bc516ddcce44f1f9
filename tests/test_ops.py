"""Direct unit tests for the scale-hygiene operators in ops.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data as rd


@pytest.fixture()
def events_ds(ray_session, sf_dir):
    return rd.read_parquet(f"{sf_dir}/events.parquet")


class TestPartialGroupbySum:
    def test_matches_plain_groupby(self, events_ds, sf_dir):
        from citygml2objv2_ray.ops import partial_groupby_sum

        got = (
            partial_groupby_sum(
                events_ds.select_columns(["event_type", "value"]), "event_type", ["value"]
            )
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        import pyarrow.parquet as pq

        df = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"]).to_pandas()
        want = (
            df.groupby("event_type")
            .agg(sum_value=("value", "sum"), n=("value", "size"))
            .reset_index()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert got.event_type.tolist() == want.event_type.tolist()
        assert np.allclose(got.sum_value, want.sum_value)
        assert got.n.astype(int).tolist() == want.n.tolist()


class TestBroadcastFilter:
    def test_semi_and_anti_partition(self, events_ds, ray_session):
        from citygml2objv2_ray.ops import broadcast_semi_anti_filter

        keys_ref = ray.put({"click", "view"})
        ds = events_ds.select_columns(["event_id", "event_type"])
        semi = broadcast_semi_anti_filter(ds, "event_type", keys_ref).to_pandas()
        anti = broadcast_semi_anti_filter(ds, "event_type", keys_ref, anti=True).to_pandas()
        assert set(semi.event_type) <= {"click", "view"}
        assert not set(anti.event_type) & {"click", "view"}
        assert len(semi) + len(anti) == events_ds.count()


class TestSupergroupFanout:
    def test_derive_num_groups_clamps(self):
        from citygml2objv2_ray.ops import derive_num_groups

        assert derive_num_groups(None) == 64
        assert derive_num_groups(0) == 64
        assert derive_num_groups(10_000) == 64          # below target → min
        assert derive_num_groups(100_000_000) == 100    # scales with input
        assert derive_num_groups(10**12) == 4096        # capped

    def test_result_invariant_to_num_groups(self, ray_session):
        """supergroup_agg is a pure partitioning choice: the aggregate must
        be identical at num_groups ∈ {16, 64, 256} (VERDICT r2 item 3)."""
        from citygml2objv2_ray.ops import supergroup_agg

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 3000, size=20_000).astype(np.int64),
                "v": rng.normal(size=20_000),
            }
        )
        want = (
            df.groupby("k", as_index=False)
            .agg(s=("v", "sum"), n=("v", "size"))
            .sort_values("k")
            .reset_index(drop=True)
        )

        def partial(d: pd.DataFrame) -> pd.DataFrame:
            return d.groupby("k", as_index=False).agg(s=("v", "sum"), n=("v", "size"))

        def merge(d: pd.DataFrame) -> pd.DataFrame:
            return d.groupby("k", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))

        for ng in (16, 64, 256):
            ds = rd.from_pandas(df).repartition(8)
            got = (
                supergroup_agg(ds, ["k"], partial, merge, num_groups=ng)
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            assert got.k.tolist() == want.k.tolist()
            assert np.allclose(got.s, want.s)
            assert got.n.astype(int).tolist() == want.n.tolist()


class TestSaltedGroupby:
    def test_hot_key_counts_survive_salting(self, ray_session):
        from citygml2objv2_ray.ops import salted_groupby

        # Zipf-ish: one hot key with 5000 rows, 50 cold keys with 10 each
        rng = np.random.default_rng(0)
        keys = ["hot"] * 5000 + [f"k{i}" for i in range(50) for _ in range(10)]
        rng.shuffle(keys)
        df = pd.DataFrame({"key": keys, "n": 1})
        ds = rd.from_pandas(df)

        def reduce_batch(d: pd.DataFrame) -> pd.DataFrame:
            cols = ["key", "_salt"] if "_salt" in d.columns else ["key"]
            return d.groupby(cols, sort=False, as_index=False)["n"].sum()

        def merge_group(d: pd.DataFrame) -> pd.DataFrame:
            return d.groupby("key", sort=False, as_index=False)["n"].sum()

        out = salted_groupby(ds, "key", reduce_batch, merge_group).to_pandas()
        out = out.set_index("key").n
        assert out["hot"] == 5000
        assert all(out[f"k{i}"] == 10 for i in range(50))
        assert out.sum() == 5500


class TestBloomFilter:
    def test_no_false_negatives_and_fp_rate(self):
        from citygml2objv2_ray.ops import BloomFilter

        rng = np.random.default_rng(3)
        members = rng.choice(10**9, size=20_000, replace=False).astype(np.int64)
        bf = BloomFilter(n_bits=1 << 20, k=4)
        bf.add(members)
        assert bf.contains(members).all()  # never a false negative
        probe = rng.integers(10**9, 2 * 10**9, size=50_000)
        fp = bf.contains(probe).mean()
        assert fp < 0.01  # 20k keys in 2^20 bits, k=4 -> ~0.1% expected

    def test_merge_is_union(self):
        from citygml2objv2_ray.ops import BloomFilter

        a, b = BloomFilter(1 << 14, 3), BloomFilter(1 << 14, 3)
        ka = np.arange(0, 500, dtype=np.int64)
        kb = np.arange(500, 1000, dtype=np.int64)
        a.add(ka)
        b.add(kb)
        a.merge(b)
        assert a.contains(np.concatenate([ka, kb])).all()

    def test_distributed_build_matches_local_and_prefilter_exact(self, ray_session):
        import ray

        from citygml2objv2_ray.ops import (
            BloomFilter,
            bloom_build_distributed,
            bloom_prefilter,
        )

        rng = np.random.default_rng(7)
        keys = rng.choice(100_000, size=5_000, replace=False).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
        dist = bloom_build_distributed(ds, "k", n_bits=1 << 16, k=3)
        local = BloomFilter(1 << 16, 3)
        local.add(keys)
        assert np.array_equal(dist.bits, local.bits)  # partition-order free

        big = pd.DataFrame({"k": rng.integers(0, 200_000, size=30_000)})
        ref = ray.put(dist)
        kept = bloom_prefilter(
            rd.from_pandas(big).repartition(6), "k", ref
        ).to_pandas()
        member = np.isin(big.k.to_numpy(), keys)
        # every true member survives; survivors are the bloom's exact
        # positive set (true matches + deterministic false positives)
        assert np.isin(keys, kept.k.to_numpy()).sum() == len(
            np.intersect1d(keys, big.k.to_numpy())
        )
        assert member.sum() <= len(kept) < len(big)


def test_derive_join_partitions():
    from citygml2objv2_ray.ops import derive_join_partitions

    # unknown → minimum (never 1 task)
    assert derive_join_partitions(None) == 8
    # test scale stays at the floor
    assert derive_join_partitions(150_000, 15_000) == 8
    # grows with the LARGER side
    assert derive_join_partitions(10_000_000, 500) == 10_000_000 // 65536
    # clamped at the ceiling
    assert derive_join_partitions(10**12) == 512


class TestSupergroupFullHistoryOps:
    """The full-history supergroup family (quantiles, funnel, outer merges)
    must be invariant to the super-group fan-out AND match a plain-pandas
    brute force — the merge sees each key's complete history by
    construction, whatever num_groups is."""

    def test_group_quantiles_invariant(self, ray_session):
        from citygml2objv2_ray.ops import supergroup_agg

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 500, size=10_000).astype(np.int64),
                "v": rng.normal(size=10_000).round(6),
            }
        )

        def brute(g: pd.DataFrame) -> tuple:
            v = np.sort(g.v.to_numpy())
            n = v.size
            return v[(n + 1) // 2 - 1], v[(n * 9 + 9) // 10 - 1]

        want = {
            int(k): brute(g) for k, g in df.groupby("k")
        }

        def quantiles(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["k", "v"], kind="stable")
            k = g.k.to_numpy()
            v = g.v.to_numpy()
            new = np.concatenate([[True], k[1:] != k[:-1]])
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, k.size))
            return pd.DataFrame(
                {
                    "k": k[starts],
                    "p50": v[starts + (counts + 1) // 2 - 1],
                    "p90": v[starts + (counts * 9 + 9) // 10 - 1],
                }
            )

        for ng in (4, 64):
            ds = rd.from_pandas(df).repartition(8)
            got = (
                supergroup_agg(ds, ["k"], lambda d: d, quantiles, num_groups=ng)
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            assert len(got) == len(want)
            for _, row in got.iterrows():
                w50, w90 = want[int(row.k)]
                assert row.p50 == w50 and row.p90 == w90

    def test_set_ops_bitmask_invariant(self, ray_session):
        """Distinct (key, bit) pairs + per-key sum == OR of disjoint bits,
        at any fan-out and any input duplication."""
        from citygml2objv2_ray.ops import supergroup_agg

        rng = np.random.default_rng(7)
        n = 5_000
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 400, size=n).astype(np.int64),
                "bit": rng.choice([1, 2], size=n).astype(np.int64),
            }
        )
        want = (
            df.drop_duplicates()
            .groupby("k")["bit"].sum()
            .astype(int)
            .to_dict()
        )

        def partial(d: pd.DataFrame) -> pd.DataFrame:
            return d.drop_duplicates()

        def merge(d: pd.DataFrame) -> pd.DataFrame:
            return d.drop_duplicates().groupby("k", as_index=False)["bit"].sum()

        for ng in (4, 64):
            ds = rd.from_pandas(df).repartition(8)
            got = (
                supergroup_agg(ds, ["k"], partial, merge, num_groups=ng)
                .to_pandas()
            )
            assert {int(r.k): int(r.bit) for _, r in got.iterrows()} == want
