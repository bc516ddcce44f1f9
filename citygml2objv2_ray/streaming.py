"""Streaming windowed aggregation with watermarks and late-data handling —
the §2.F capability neither the reference (pure batch, SURVEY.md §2.F
"Streaming/windows/watermarks: none") nor Ray Data natively has.

Semantics (the standard event-time model):

- events arrive in micro-batches in ARRIVAL order (not event-time order);
- each event lands in the tumbling window ``floor(ts / width)``;
- the WATERMARK is ``max(event ts seen) - allowed_lateness``;
- a window [w, w+width) is EMITTED (finalized) once the watermark passes
  its end; events arriving for an already-finalized window are counted in
  ``late_dropped`` instead of mutating emitted results — exactly-once
  window output.

Shape: a single Ray ACTOR holds the open-window state (the brief's
"actor-pool stage holding the needed state" escape hatch — windowed state
with a global watermark is the one thing a stateless map can't express).
At scale this shards by key-hash into an actor pool (one actor per key
range, watermarks per shard); the single-actor form keeps the semantics
auditable and is what the equality-with-batch oracle checks.

With ``allowed_lateness`` >= the stream's true disorder, nothing drops and
the finalized output EQUALS the batch tumbling-window aggregate — which
gives the streaming path a DuckDB SQL oracle for free (q_stream_window_hourly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


@ray.remote
class WindowedStreamAggregator:
    """Actor holding open tumbling-window aggregates keyed by
    (event_type, window_start); emits finalized windows as the watermark
    advances."""

    def __init__(self, width_us: int, allowed_lateness_us: int):
        self.width = int(width_us)
        self.lateness = int(allowed_lateness_us)
        self.open: dict[tuple, list] = {}  # (etype, wstart) → [n, sum_value]
        self.watermark = np.iinfo(np.int64).min
        self.finalized_max = np.iinfo(np.int64).min  # highest finalized window end
        self.late_dropped = 0

    def ingest(self, df: pd.DataFrame) -> list[dict]:
        """One arrival-order micro-batch (event_type, ts_us, value) →
        list of finalized window rows emitted by this batch's watermark
        advance."""
        ts = df["ts_us"].to_numpy()
        wstart = (ts // self.width) * self.width
        # events for windows finalized BEFORE this batch are late drops
        late = wstart < self.finalized_max
        self.late_dropped += int(late.sum())
        live = df[~late].assign(wstart=wstart[~late])
        g = live.groupby(["event_type", "wstart"], sort=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        for (etype, w), row in g.iterrows():
            acc = self.open.setdefault((etype, int(w)), [0, 0.0])
            acc[0] += int(row.n)
            acc[1] += float(row.sum_value)
        if len(ts):
            self.watermark = max(self.watermark, int(ts.max()) - self.lateness)
        return self._emit_ready()

    def _emit_ready(self) -> list[dict]:
        out = []
        for (etype, w) in sorted(k for k in self.open if k[1] + self.width <= self.watermark):
            n, s = self.open.pop((etype, w))
            out.append(
                dict(event_type=etype, window_start=w, n=n, sum_value=s)
            )
            self.finalized_max = max(self.finalized_max, w + self.width)
        return out

    def flush(self) -> list[dict]:
        """End of stream: finalize every remaining open window."""
        self.watermark = np.iinfo(np.int64).max
        return self._emit_ready()

    def stats(self) -> dict:
        return {"late_dropped": self.late_dropped, "open_windows": len(self.open)}


def stream_window_hourly(
    sf_dir: str,
    width_us: int = 3_600_000_000,
    allowed_lateness_us: int = 86_400_000_000,
    batch_size: int = 8192,
) -> tuple[pd.DataFrame, dict]:
    """Drive the events table through the streaming aggregator in
    arrival order (the parquet read order — NOT sorted by event time) and
    return (finalized windows, stream stats). With default lateness >= the
    table's disorder, the result equals the batch tumbling window."""
    import ray.data as rd

    from .relational import _t

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])
    agg = WindowedStreamAggregator.remote(width_us, allowed_lateness_us)
    emitted: list[dict] = []
    for batch in ds.iter_batches(batch_format="pandas", batch_size=batch_size):
        batch = batch.assign(
            ts_us=batch.ts.values.astype("datetime64[us]").astype(np.int64)
        )[["event_type", "ts_us", "value"]]
        emitted.extend(ray.get(agg.ingest.remote(batch)))
    emitted.extend(ray.get(agg.flush.remote()))
    stats = ray.get(agg.stats.remote())
    ray.kill(agg)
    df = pd.DataFrame(emitted, columns=["event_type", "window_start", "n", "sum_value"])
    if len(df):
        df["window_start"] = (df.window_start // 1_000_000).astype(np.int64)  # epoch s
        df["n"] = df.n.astype(np.int64)
        df["sum_value"] = df.sum_value.round(4)
    return (
        df.sort_values(["event_type", "window_start"]).reset_index(drop=True),
        stats,
    )


from .relational import query  # noqa: E402


@query(
    "q_stream_window_hourly",
    """
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY event_type, window_start
    ORDER BY event_type, window_start
    """,
)
def q_stream_window_hourly(sf_dir: str) -> pd.DataFrame:
    """The STREAMING path (arrival order + watermark + late-data drops)
    must finalize to exactly the batch tumbling-window answer when
    allowed_lateness covers the stream's disorder — the DuckDB twin is the
    batch window SQL."""
    df, _ = stream_window_hourly(sf_dir)
    return df


@ray.remote
class StreamingDeduper:
    """Actor pool shard for streaming exact dedup: holds the seen-key set
    for ITS hash range and emits only first occurrences, incrementally.
    Keys are sharded by hash so each actor's state is ~(distinct keys /
    n_shards) — the 100 TB form is this same pool with more shards (state
    never concentrates), exactly the brief's "shared mutable index" case
    that a stateless map can't express."""

    def __init__(self):
        self.seen: set = set()
        self.n_dropped = 0

    def ingest(self, df: pd.DataFrame) -> pd.DataFrame:
        """One arrival-order micro-batch slice (this shard's keys only) →
        the rows whose key is seen for the FIRST time, in arrival order."""
        first_in_batch = ~df["key"].duplicated()
        novel_mask = first_in_batch & ~df["key"].isin(self.seen)
        out = df[novel_mask]
        self.seen.update(out["key"].tolist())
        self.n_dropped += int(len(df) - len(out))
        return out

    def stats(self) -> dict:
        return {"n_seen": len(self.seen), "n_dropped": self.n_dropped}


def stream_dedup_first(
    sf_dir: str, n_shards: int = 4, batch_size: int = 8192
) -> tuple[pd.DataFrame, dict]:
    """Streaming exact dedup of the events table on (user_id, event_type)
    in ARRIVAL order: each micro-batch is hash-sharded across the actor
    pool, every shard emits its first occurrences incrementally, and the
    union of emissions is the keep-first dedup of the whole stream. With
    arrival order == table order, the finalized output EQUALS the batch
    keep-first-by-arrival dedup — a free SQL oracle, like the windowed
    stream above."""
    import ray.data as rd

    from .relational import _t

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "event_type"])
    shards = [StreamingDeduper.remote() for _ in range(n_shards)]
    pending: list = []
    seq = 0
    for batch in ds.iter_batches(batch_format="pandas", batch_size=batch_size):
        batch = batch.assign(
            key=batch.user_id.astype(str) + "\x00" + batch.event_type.astype(str),
            _seq=np.arange(seq, seq + len(batch)),
        )
        seq += len(batch)
        h = pd.util.hash_pandas_object(batch.key, index=False).to_numpy()
        shard_of = (h % n_shards).astype(np.int64)
        # one ingest per shard per micro-batch, all in flight concurrently
        pending.append(
            [
                shards[s].ingest.remote(batch[shard_of == s])
                for s in range(n_shards)
            ]
        )
    parts = [df for futs in pending for df in ray.get(futs) if len(df)]
    stats_list = ray.get([s.stats.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        columns=["event_id", "user_id", "event_type", "key", "_seq"]
    )
    # arrival order within the stream = _seq; emissions are per-shard but
    # each key's first arrival is unique, so sorting by _seq restores it
    out = out.sort_values("_seq").reset_index(drop=True)
    stats = {
        "n_seen": int(sum(s["n_seen"] for s in stats_list)),
        "n_dropped": int(sum(s["n_dropped"] for s in stats_list)),
    }
    return out[["event_id", "user_id", "event_type"]], stats


@query(
    "q_stream_dedup",
    """
    SELECT event_id, user_id, event_type
    FROM (SELECT event_id, user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY event_id) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY event_id
    """,
)
def q_stream_dedup(sf_dir: str) -> pd.DataFrame:
    """Streaming keep-first dedup (sharded stateful actor pool, incremental
    emission) must equal the batch keep-first-by-arrival-order dedup.
    Arrival order is the parquet read order, which for the events table is
    event_id order — so the SQL twin anchors ROW_NUMBER on event_id
    (deterministic under any DuckDB scan parallelism)."""
    df, _ = stream_dedup_first(sf_dir)
    return df.sort_values("event_id").reset_index(drop=True)
