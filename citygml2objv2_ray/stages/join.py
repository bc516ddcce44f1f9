"""Spatial-join stage: broadcast FootprintIndex, actor-pool lookup.

The big (images) side never shuffles — each actor fetches the index once
from the object store in ``__init__`` (SURVEY.md §4.2 broadcast-vs-partition)
and performs vectorized cell-bucket PIP assignment + kNN per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import DEFAULT_CONFIG, EngineConfig


class SpatialJoin:
    def __init__(self, index_ref, cfg: EngineConfig = DEFAULT_CONFIG, k: int | None = None):
        # FootprintIndex, fetched ONCE per actor
        self.index = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        self.cfg = cfg
        self.k = k or cfg.knn_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = np.asarray(batch["cx"], dtype=np.float64)
        cy = np.asarray(batch["cy"], dtype=np.float64)
        fi = self.index.assign(cx, cy)
        bid = np.where(fi >= 0, self.index.building_id[np.maximum(fi, 0)], None)
        knn_i, knn_d = self.index.knn(cx, cy, self.k)
        # flatten kNN into list columns
        valid = knn_i >= 0
        knn_ids = [
            [self.index.building_id[j] for j in row[rv]]
            for row, rv in zip(knn_i, valid)
        ]
        knn_dist = [list(np.round(row[rv], 6)) for row, rv in zip(knn_d, valid)]
        return (
            batch.append_column("building_id", pa.array(bid, pa.string()))
            .append_column("nn_ids", pa.array(knn_ids, pa.list_(pa.string())))
            .append_column("nn_dist", pa.array(knn_dist, pa.list_(pa.float64())))
        )
