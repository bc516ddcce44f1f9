"""Streaming windowed aggregation: watermark/late-data semantics and
equality with the batch tumbling window (the SQL twin is exercised by
tests/test_oracle.py and the driver gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


class TestStreamWindow:
    def test_equals_batch_window(self, ray_session):
        from citygml2objv2_ray.relational import REGISTRY
        from citygml2objv2_ray import streaming  # noqa: F401
        from citygml2objv2_ray.streaming import stream_window_hourly

        got, stats = stream_window_hourly(SF)
        want = REGISTRY["q_window_hourly"](SF)
        assert stats["late_dropped"] == 0
        assert stats["open_windows"] == 0
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_watermark_finalizes_incrementally(self, ray_session):
        """Windows must be emitted as the watermark passes them — not all
        at flush time."""
        import ray

        from citygml2objv2_ray.streaming import WindowedStreamAggregator

        W = 100
        agg = WindowedStreamAggregator.remote(W, allowed_lateness_us=0)
        b1 = pd.DataFrame({"event_type": ["a", "a"], "ts_us": [10, 150], "value": [1.0, 2.0]})
        out1 = ray.get(agg.ingest.remote(b1))  # watermark 150 → window [0,100) final
        assert [(r["window_start"], r["n"]) for r in out1] == [(0, 1)]
        b2 = pd.DataFrame({"event_type": ["a"], "ts_us": [320], "value": [3.0]})
        out2 = ray.get(agg.ingest.remote(b2))  # watermark 320 → [100,200) and [200,300) (empty) → only open ones emit
        assert [(r["window_start"], r["n"]) for r in out2] == [(100, 1)]
        rest = ray.get(agg.flush.remote())
        assert [(r["window_start"], r["n"]) for r in rest] == [(300, 1)]
        ray.kill(agg)

    def test_late_event_dropped_not_mutating(self, ray_session):
        """An event for an already-finalized window increments late_dropped
        and never changes emitted results (exactly-once window output)."""
        import ray

        from citygml2objv2_ray.streaming import WindowedStreamAggregator

        W = 100
        agg = WindowedStreamAggregator.remote(W, allowed_lateness_us=0)
        out = ray.get(
            agg.ingest.remote(
                pd.DataFrame({"event_type": ["a"], "ts_us": [250], "value": [1.0]})
            )
        )
        assert out == []  # [200,300) still open
        out = ray.get(
            agg.ingest.remote(
                pd.DataFrame({"event_type": ["a"], "ts_us": [400], "value": [1.0]})
            )
        )  # watermark 400 finalizes [200,300)
        assert [(r["window_start"], r["n"]) for r in out] == [(200, 1)]
        # a straggler for the finalized window
        out = ray.get(
            agg.ingest.remote(
                pd.DataFrame({"event_type": ["a"], "ts_us": [210], "value": [9.0]})
            )
        )
        assert out == []
        stats = ray.get(agg.stats.remote())
        assert stats["late_dropped"] == 1
        rest = ray.get(agg.flush.remote())
        # only the [400,500) window remains; the finalized [200,300) is untouched
        assert [(r["window_start"], r["n"]) for r in rest] == [(400, 1)]
        ray.kill(agg)
