"""Stream-shaped incremental operators: stateful actors fed an ordered log.

Ray Data has no event-time windows/watermarks; for stream-shaped inputs
(an append-only log ordered by event time) the engine keeps incremental
state in actors — one :class:`SessionActor` per key-hash bucket, fed
batches in time order (the standard actor pattern for streaming-shaped
workloads on Ray).
Results are identical to the batch :func:`~transmog_ray.stages.window.
sessionize` over the full log (pinned by tests), but arrive
incrementally with bounded state: per-key (last_ts, session_start) only.

Ordering contract: batches must arrive in non-decreasing event time per
key (a partitioned log guarantees this); late rows violating it belong
to a new session erroneously — detect upstream via watermark checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class SessionState:
    """Incremental gap-sessionization core (plain object, wrapped in a Ray
    actor by :class:`StreamingSessionizer`; kept separate for unit tests)."""

    def __init__(self, key: str, ts: str, gap_seconds: float):
        self.key = key
        self.ts = ts
        self.gap = pd.Timedelta(seconds=gap_seconds)
        # key -> (last_ts, session_start_ts, session_seq)
        self.state: dict = {}

    def process(self, df: pd.DataFrame) -> pd.DataFrame:
        """Assign session ids to a time-ordered batch, carrying state
        across calls. Vectorized per key-run within the batch; state
        touched once per key per batch."""
        df = df.sort_values([self.key, self.ts], kind="mergesort").reset_index(drop=True)
        session_seq = np.empty(len(df), dtype=np.int64)
        session_id: list[str] = [""] * len(df)

        for key_val, grp in df.groupby(self.key, sort=False):
            last_ts, start_ts, seq = self.state.get(key_val, (None, None, -1))
            times = grp[self.ts].tolist()
            for pos, t in zip(grp.index, times):
                if last_ts is None or (t - last_ts) > self.gap:
                    seq += 1
                    start_ts = t
                last_ts = t
                session_seq[pos] = seq
                session_id[pos] = (
                    f"{key_val}|{pd.Timestamp(start_ts).value // 1000}"
                )
            self.state[key_val] = (last_ts, start_ts, seq)

        df["session_seq"] = session_seq
        df["session_id"] = session_id
        return df

    def open_sessions(self) -> pd.DataFrame:
        """Current open-session state (for checkpointing/inspection)."""
        rows = [
            {self.key: k, "last_ts": v[0], "session_start": v[1],
             "session_seq": v[2]}
            for k, v in self.state.items()
        ]
        return pd.DataFrame(rows)


def streaming_sessionize(
    ordered_batches,
    key: str,
    ts: str,
    gap_seconds: float,
    num_buckets: int = 8,
):
    """Feed a time-ordered iterable of pandas batches through a pool of
    session actors (hash-routed by key) and yield sessionized batches.

    The driver routes rows by key hash so each actor sees every row of
    its keys in order; actor calls per batch run concurrently across
    buckets.
    """
    import ray

    from ..stages.partition import key_hash

    ActorCls = ray.remote(SessionState)
    actors = [
        ActorCls.remote(key, ts, gap_seconds) for _ in range(num_buckets)
    ]
    for batch in ordered_batches:
        if batch.empty:
            continue
        buckets = key_hash(batch, [key]) % np.uint64(num_buckets)
        refs = []
        for b in range(num_buckets):
            part = batch[buckets == b]
            if len(part):
                refs.append(actors[b].process.remote(part))
        for out in ray.get(refs):
            yield out


class WatermarkTracker:
    """Event-time watermark over an ordered log: watermark = max seen ts
    minus ``allowed_lateness``. :meth:`split` separates each batch into
    (on-time, late) so late rows can be rerouted/corrected instead of
    silently corrupting order-sensitive state (the ordering-contract
    guard for :class:`SessionState`)."""

    def __init__(self, ts: str, allowed_lateness_s: float = 0.0):
        self.ts = ts
        self.lateness = pd.Timedelta(seconds=allowed_lateness_s)
        self.max_ts = None

    @property
    def watermark(self):
        if self.max_ts is None:
            return None
        return self.max_ts - self.lateness

    def split(self, df: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
        wm = self.watermark
        batch_max = df[self.ts].max()
        # an empty / all-NaT batch must not poison the tracker: NaT
        # compares False against everything, so assigning it once would
        # freeze max_ts (and disable the late-row guard) forever
        if not pd.isna(batch_max) and (
            self.max_ts is None or batch_max > self.max_ts
        ):
            self.max_ts = batch_max
        if wm is None:
            return df, df.iloc[0:0]
        late_mask = df[self.ts] < wm
        return df[~late_mask], df[late_mask]


class TumblingWindowState:
    """Incremental event-time tumbling windows with watermark-driven
    emission: per-(key, window) partial aggregates accumulate as batches
    arrive; a window is FINALIZED and emitted once the watermark (max
    seen ts − allowed lateness) passes its end, after which rows for it
    are counted as dropped-late instead of corrupting an emitted result.

    State is bounded by the number of OPEN windows (keys × windows inside
    the lateness horizon), not by the stream length — the defining
    property of a streaming window operator. Results over a fully
    flushed, in-order stream are identical to the batch tumbling
    aggregate (pinned by tests)."""

    def __init__(self, key: str, ts: str, value: str, window_seconds: float,
                 allowed_lateness_s: float = 0.0):
        self.key = key
        self.ts = ts
        self.value = value
        self.win_ns = np.int64(window_seconds * 1e9)
        self.tracker = WatermarkTracker(ts, allowed_lateness_s)
        # (key, window_start_ns) -> [count, sum, min, max]
        self.partials: dict = {}
        self.emitted_before_ns: int | None = None  # windows < this are closed
        self.dropped_late = 0

    def _accumulate(self, df: pd.DataFrame) -> None:
        ts_ns = df[self.ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
        win = (ts_ns // self.win_ns) * self.win_ns
        g = (
            pd.DataFrame({"k": df[self.key].to_numpy(), "w": win,
                          "v": df[self.value].to_numpy()})
            .groupby(["k", "w"], sort=False)["v"]
            .agg(["count", "sum", "min", "max"])
        )
        for (k, w), row in g.iterrows():
            cur = self.partials.get((k, w))
            if cur is None:
                self.partials[(k, w)] = [int(row["count"]), row["sum"],
                                         row["min"], row["max"]]
            else:
                cur[0] += int(row["count"])
                cur[1] += row["sum"]
                cur[2] = min(cur[2], row["min"])
                cur[3] = max(cur[3], row["max"])

    def _finalize(self, boundary_ns) -> pd.DataFrame:
        """Emit every window whose END ≤ boundary."""
        done = [kw for kw in self.partials if kw[1] + self.win_ns <= boundary_ns]
        rows = []
        for k, w in sorted(done, key=lambda kw: (str(kw[0]), kw[1])):
            c, s, mn, mx = self.partials.pop((k, w))
            rows.append({self.key: k,
                         "window_start": pd.Timestamp(w, unit="ns"),
                         "n": c, "sum_value": s, "min_value": mn,
                         "max_value": mx})
        self.emitted_before_ns = (
            boundary_ns if self.emitted_before_ns is None
            else max(self.emitted_before_ns, boundary_ns)
        )
        cols = [self.key, "window_start", "n", "sum_value", "min_value",
                "max_value"]
        return pd.DataFrame(rows, columns=cols)

    def process(self, df: pd.DataFrame) -> pd.DataFrame:
        """Feed one batch; returns the windows finalized by the advancing
        watermark (often empty)."""
        if len(df):
            if self.emitted_before_ns is not None:
                ts_ns = df[self.ts].to_numpy().astype(
                    "datetime64[ns]").astype(np.int64)
                win = (ts_ns // self.win_ns) * self.win_ns
                closed = win + self.win_ns <= self.emitted_before_ns
                self.dropped_late += int(closed.sum())
                df = df[~closed]
            if len(df):
                self._accumulate(df)
                self.tracker.split(df)  # advance the watermark
        wm = self.tracker.watermark
        if wm is None:
            return self._finalize(np.int64(-(2**62)))
        return self._finalize(np.int64(pd.Timestamp(wm).value))

    def flush(self) -> pd.DataFrame:
        """End of stream: emit every remaining open window."""
        return self._finalize(np.int64(2**62))


def streaming_tumbling(
    ordered_batches,
    key: str,
    ts: str,
    value: str,
    window_seconds: float,
    allowed_lateness_s: float = 0.0,
    num_buckets: int = 8,
):
    """Feed a time-ordered iterable of pandas batches through a pool of
    tumbling-window actors (hash-routed by key); yields finalized-window
    frames as watermarks advance, then the end-of-stream flush."""
    import ray

    from ..stages.partition import key_hash

    ActorCls = ray.remote(TumblingWindowState)
    actors = [
        ActorCls.remote(key, ts, value, window_seconds, allowed_lateness_s)
        for _ in range(num_buckets)
    ]
    for batch in ordered_batches:
        if batch.empty:
            continue
        buckets = key_hash(batch, [key]) % np.uint64(num_buckets)
        refs = []
        for b in range(num_buckets):
            part = batch[buckets == b]
            if len(part):
                refs.append(actors[b].process.remote(part))
        for out in ray.get(refs):
            if len(out):
                yield out
    for out in ray.get([a.flush.remote() for a in actors]):
        if len(out):
            yield out


__all__ = [
    "SessionState",
    "WatermarkTracker",
    "TumblingWindowState",
    "streaming_sessionize",
    "streaming_tumbling",
]
