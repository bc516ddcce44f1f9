"""Spatial index tests: cell codec, PIP assignment vs brute force, kNN vs
brute force (including across cell boundaries)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from citygml2objv2_ray import spatial, synth
from citygml2objv2_ray.config import DEFAULT_CONFIG


def brute_assign(idx: spatial.FootprintIndex, cx, cy):
    out = np.full(len(cx), -1, dtype=np.int64)
    for p in range(len(cx)):
        for fi in range(len(idx.building_id)):
            if (
                idx.xmin[fi] <= cx[p] <= idx.xmax[fi]
                and idx.ymin[fi] <= cy[p] <= idx.ymax[fi]
            ):
                from citygml2objv2_ray.geom import point_in_ring_2d

                if point_in_ring_2d(np.array([[cx[p], cy[p]]]), idx.rings[fi])[0]:
                    out[p] = fi
                    break
    return out


class TestCellCodec:
    def test_roundtrip_negative_coords(self):
        ix = np.array([-5, 0, 3, 1000], dtype=np.int64)
        iy = np.array([7, -9, 0, -1000], dtype=np.int64)
        cells = spatial.make_cell(ix, iy)
        rx, ry = spatial.cell_xy(cells)
        assert np.array_equal(rx, ix) and np.array_equal(ry, iy)

    def test_grid_cell_matches_floor(self):
        xs = np.array([-100.0, -0.1, 0.0, 63.9, 64.0, 200.0])
        cells = synth.grid_cell(xs, xs, 64.0)
        ix, iy = spatial.cell_xy(cells)
        assert np.array_equal(ix, np.floor(xs / 64.0).astype(np.int64))


class TestAssign:
    def test_matches_brute_force(self):
        _, fp = synth.make_city(50, seed=42)
        idx = spatial.build_index(fp)
        rng = np.random.default_rng(3)
        cx = rng.uniform(-50, 600, 2000)
        cy = rng.uniform(-50, 600, 2000)
        got = idx.assign(cx, cy)
        want = brute_assign(idx, cx, cy)
        assert np.array_equal(got, want)
        assert (got >= 0).sum() > 0  # some hits

    def test_truth_reproduction(self):
        # images generated with truth_building_id must be reproduced by assign
        _, fp = synth.make_city(40, seed=42)
        imgs = synth.make_image_rows(np.arange(300), fp, seed=42)
        idx = spatial.build_index(fp)
        got = idx.assign(np.asarray(imgs["cx"]), np.asarray(imgs["cy"]))
        got_bid = np.where(got >= 0, idx.building_id[np.maximum(got, 0)], None)
        truth = imgs["truth_building_id"].to_pylist()
        # footprints may overlap: truth picks a specific containing footprint,
        # assign picks first-by-index — both must agree on *containment*
        for g, t in zip(got_bid.tolist(), truth):
            assert (g is None) == (t is None)

    def test_cell_reproduction(self):
        _, fp = synth.make_city(20, seed=42)
        imgs = synth.make_image_rows(np.arange(100), fp, seed=42)
        cells = synth.grid_cell(
            np.asarray(imgs["cx"]), np.asarray(imgs["cy"]), DEFAULT_CONFIG.cell_size
        )
        assert np.array_equal(cells, np.asarray(imgs["truth_cell"]))


class TestKNN:
    def test_matches_brute_force(self):
        _, fp = synth.make_city(60, seed=42)
        idx = spatial.build_index(fp)
        rng = np.random.default_rng(5)
        cx = rng.uniform(0, 500, 500)
        cy = rng.uniform(0, 500, 500)
        k = 3
        got_i, got_d = idx.knn(cx, cy, k)
        # brute force over all centroids
        d = np.hypot(cx[:, None] - idx.ccx[None, :], cy[:, None] - idx.ccy[None, :])
        want_d = np.sort(d, axis=1)[:, :k]
        found = got_i >= 0
        assert found.all()  # max_ring covers this world for every query
        assert np.allclose(np.where(found, got_d, 0), np.where(found, want_d, 0))

    def test_knn_distances_sorted(self):
        _, fp = synth.make_city(30, seed=42)
        idx = spatial.build_index(fp)
        got_i, got_d = idx.knn(np.array([100.0]), np.array([100.0]), 5)
        d = got_d[0][got_i[0] >= 0]
        assert np.all(np.diff(d) >= 0)


class TestRangeJoin:
    def test_matches_brute_force_with_buffer(self):
        _, fp = synth.make_city(40, seed=42)
        idx = spatial.build_index(fp)
        rng = np.random.default_rng(9)
        cx = rng.uniform(-20, 500, 800)
        cy = rng.uniform(-20, 500, 800)
        for buf in (0.0, 3.0, 70.0):
            pi, fi = idx.range_join(cx, cy, buffer=buf)
            got = set(zip(pi.tolist(), fi.tolist()))
            want = set()
            for p in range(len(cx)):
                for f in range(len(idx.building_id)):
                    if (
                        idx.xmin[f] - buf <= cx[p] <= idx.xmax[f] + buf
                        and idx.ymin[f] - buf <= cy[p] <= idx.ymax[f] + buf
                    ):
                        want.add((p, f))
            assert got == want, f"buffer={buf}"

    def test_one_to_many(self):
        _, fp = synth.make_city(30, seed=42)
        idx = spatial.build_index(fp)
        # a point inside the hot cell with a huge buffer hits many footprints
        pi, fi = idx.range_join(np.array([30.0]), np.array([30.0]), buffer=64.0)
        assert len(fi) > 3
        assert (pi == 0).all()
