"""Connected components (graph.py): hash-to-min label propagation over a
pair-graph Dataset. Covers multi-round convergence (a chain's diameter
forces ~log rounds), component minima as labels, partition invariance,
and the empty graph."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from citygml2objv2_ray.graph import connected_components

CHAIN = pd.DataFrame(
    {
        "doc_a": [0, 1, 2, 3, 4, 5, 6, 7, 8, 100, 101, 100, 200],
        "doc_b": [1, 2, 3, 4, 5, 6, 7, 8, 9, 101, 102, 102, 201],
    }
)
EXPECT = {i: 0 for i in range(10)} | {100: 100, 101: 100, 102: 100, 200: 200, 201: 200}


def _labels(pairs: pd.DataFrame, parts: int, n_hint: int = 1000) -> dict[int, int]:
    ds = rd.from_pandas(pairs).repartition(parts)
    out = connected_components(ds, n_hint).to_pandas()
    return dict(zip(out.doc_id, out.component_id))


class TestConnectedComponents:
    def test_chain_triangle_pair(self, ray_session):
        # a 10-node chain (diameter 9 → needs several rounds), a triangle,
        # and an isolated pair; labels are the component minima
        assert _labels(CHAIN, 4) == EXPECT

    def test_partition_and_order_invariance(self, ray_session):
        shuffled = CHAIN.sample(frac=1, random_state=7).reset_index(drop=True)
        # reversed edge direction must not matter either
        flipped = shuffled.rename(columns={"doc_a": "doc_b", "doc_b": "doc_a"})
        assert _labels(shuffled, 1) == EXPECT
        assert _labels(flipped, 7, n_hint=10_000_000) == EXPECT

    def test_duplicate_edges_collapse(self, ray_session):
        dup = pd.concat([CHAIN, CHAIN, CHAIN.iloc[::-1]], ignore_index=True)
        assert _labels(dup, 3) == EXPECT

    def test_empty(self, ray_session):
        empty = pd.DataFrame(
            {
                "doc_a": pd.array([], dtype=np.int64),
                "doc_b": pd.array([], dtype=np.int64),
            }
        )
        out = connected_components(rd.from_pandas(empty), 100).to_pandas()
        assert len(out) == 0


class TestPlantedClusterRecall:
    def test_planted_dup_clusters_recovered(self, ray_session):
        """End-to-end dedup-clustering recall on a planted corpus: every
        verified (source, near-copy) pair must land in ONE component, and
        the distributed CC labels must equal a driver-side union-find over
        the same pair set (the scale demo in bench.py runs this identical
        chain over the 300k corpus)."""
        import ray.data as rd

        from citygml2objv2_ray import dedup as dd
        from citygml2objv2_ray.graph import connected_components
        from citygml2objv2_ray.ops import derive_num_blocks
        from citygml2objv2_ray.relational_ml import minhash_neardup_pairs

        n = 2000
        path = dd.synth_documents("/tmp/neardup_pytest", n=n, dup_rate=0.02, seed=23)
        docs = rd.read_parquet(
            path,
            columns=["doc_id", "text"],
            override_num_blocks=derive_num_blocks(n, target_rows=256),
        )
        pairs = minhash_neardup_pairs(docs, n, threshold=0.6)
        assert len(pairs) >= int(n * 0.02) * 0.9, "planted dups should verify"

        stats: dict = {}
        cc = connected_components(
            rd.from_pandas(pairs[["doc_a", "doc_b"]]), n, stats_out=stats
        ).to_pandas()
        assert 1 <= stats["rounds"] <= 12  # O(log n) fixpoint
        label = dict(zip(cc.doc_id, cc.component_id))

        # recall: both ends of every verified pair share a component
        for a, b in pairs[["doc_a", "doc_b"]].itertuples(index=False):
            assert label[a] == label[b]

        # exactness: distributed labels == union-find ground truth
        parent: dict[int, int] = {}
        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in pairs[["doc_a", "doc_b"]].itertuples(index=False):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        # canonicalize union-find roots to component minima
        roots: dict[int, int] = {}
        for x, r in want.items():
            roots[r] = min(roots.get(r, x), x)
        assert {x: roots[r] for x, r in want.items()} == label
