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


class TestHeavyHitters:
    def test_mg_summarize_superset_guarantee(self):
        """Any term with true frequency > total/(k+1) must survive the
        reduction with a positive (under)count; counters never overcount."""
        from citygml2objv2_ray.sketch import mg_summarize

        rng = np.random.default_rng(5)
        terms = np.array([f"t{i}" for i in range(5000)], dtype=object)
        counts = rng.integers(1, 20, size=5000)
        counts[:10] += 2000  # planted hitters
        k = 50
        t, c = mg_summarize(terms, counts, k)
        assert len(t) <= k
        total = counts.sum()
        true = dict(zip(terms, counts))
        kept = dict(zip(t, c))
        for term, n in true.items():
            if n > total / (k + 1):
                assert term in kept and 0 < kept[term] <= n
        for term, n in kept.items():
            assert n <= true[term]  # undercount only

    def test_query_exact_and_partition_invariant(self, ray_session):
        """Output equals the exact GROUP BY/HAVING answer (brute force over
        the corpus) — the MG pass may only affect candidate generation."""
        import math

        import pandas as pd
        import pyarrow.parquet as pq

        from citygml2objv2_ray import relational, relational_stats  # noqa: F401

        sf = "/root/testdata/sf0.001"
        got = relational.REGISTRY["q_heavy_hitters"](sf)
        docs = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).to_pandas()
        toks = docs.text.fillna("").str.lower().str.split().explode().dropna()
        vc = toks.value_counts()
        thresh = int(math.ceil(0.005 * len(toks)))
        want = vc[vc >= thresh].reset_index()
        want.columns = ["term", "cnt"]
        want = want.sort_values(["cnt", "term"], ascending=[False, True]).reset_index(drop=True)
        assert list(got.term) == list(want.term)
        assert list(got.cnt.astype(int)) == list(want.cnt.astype(int))
        # identical result again (block nondeterminism must not leak out)
        again = relational.REGISTRY["q_heavy_hitters"](sf)
        pd.testing.assert_frame_equal(got, again)


class TestCountMin:
    def test_overestimate_only_and_bucket_parity(self, ray_session):
        """CMS never underestimates, and the Ray-side bucket function is
        the one embedded in the generated SQL."""
        import duckdb

        from citygml2objv2_ray.relational_stats import (
            _CMS_PROBES,
            _cms_bucket,
            q_cms_counts,
        )

        sf = "/root/testdata/sf0.001"
        est = q_cms_counts(sf)
        true = duckdb.sql(
            f"""SELECT term, COUNT(*) n FROM (
                  SELECT unnest(string_split(trim(text), ' ')) AS term
                  FROM read_parquet('{sf}/documents.parquet')
                  WHERE trim(text) <> '')
                GROUP BY term"""
        ).df()
        tm = dict(zip(true.term, true.n))
        for _, row in est.iterrows():
            assert row.est >= tm.get(row.term, 0), row.term
        # bucket parity with the SQL twin's md5 arithmetic
        got = duckdb.sql(
            "SELECT CAST(CONCAT('0x', substr(md5(CONCAT('2', 'the')), 1, 8)) AS BIGINT) % 1024"
        ).fetchone()[0]
        assert got == _cms_bucket(2, "the")
        assert len(est) == len(_CMS_PROBES)
