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

Checkpoint contract: every state class here is a plain picklable object
(pandas frames / numpy arrays / scalars only — no actor handles, no
open resources), so a mid-stream CHECKPOINT is ``pickle.dumps(state)``
and resume is ``pickle.loads`` + keep feeding: the resumed run's
outputs are byte-identical to the uninterrupted run (pinned by the
snapshot-resume equality tests in tests/test_round5c_ops.py). Per-
bucket actors snapshot independently — the per-partition resumability
the north rule asks for, applied to the streaming path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class SessionState:
    """Incremental gap-sessionization core (plain object, wrapped in a Ray
    actor by :func:`streaming_sessionize`; kept separate for unit tests).

    ``allowed_lateness_s`` arms a :class:`WatermarkTracker`: rows older
    than (max seen ts − lateness) are DROPPED from the output and counted
    in ``dropped_late`` instead of silently corrupting per-key session
    state — the enforcement of the ordering contract, not just its
    documentation. ``None`` disables the guard."""

    def __init__(self, key: str, ts: str, gap_seconds: float,
                 allowed_lateness_s: float | None = None):
        self.key = key
        self.ts = ts
        self.gap = pd.Timedelta(seconds=gap_seconds)
        # key -> (last_ts, session_start_ts, session_seq)
        self.state: dict = {}
        self.tracker = (
            WatermarkTracker(ts, allowed_lateness_s)
            if allowed_lateness_s is not None else None
        )
        self.dropped_late = 0

    def process(self, df: pd.DataFrame) -> pd.DataFrame:
        """Assign session ids to a time-ordered batch, carrying state
        across calls. Fully vectorized: the batch `sessionize` segment
        math (prefix sums over new-session flags) with a per-key carry-in
        of (last_ts, session_start, seq) — state is touched once per key
        per batch, never per row."""
        if self.tracker is not None:
            df, late = self.tracker.split(df)
            self.dropped_late += len(late)
        df = df.sort_values([self.key, self.ts], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            df["session_seq"] = pd.Series([], dtype="int64")
            df["session_id"] = pd.Series([], dtype=object)
            return df

        codes, uniques = pd.factorize(df[self.key], use_na_sentinel=False)
        t = df[self.ts].to_numpy().astype("datetime64[ns]")
        head = np.r_[True, codes[1:] != codes[:-1]]
        seg_start = np.flatnonzero(head)
        seg_len = np.diff(np.r_[seg_start, n])
        carried = [
            self.state.get(uniques[codes[s]], (None, None, -1))
            for s in seg_start
        ]

        # previous-event time, with the carried last_ts at segment heads
        prev = np.empty(n, dtype="datetime64[ns]")
        prev[1:] = t[:-1]
        prev[seg_start] = np.array(
            [np.datetime64("NaT") if c[0] is None
             else np.datetime64(pd.Timestamp(c[0]).to_datetime64(), "ns")
             for c in carried],
            dtype="datetime64[ns]",
        )
        gap_ns = np.timedelta64(int(self.gap.value), "ns")
        new_sess = np.isnat(prev) | ((t - prev) > gap_ns)

        # session_seq = carried_seq + running count of new-session flags
        # within the segment (inclusive)
        cs = np.cumsum(new_sess)
        within = cs - np.repeat(cs[seg_start] - new_sess[seg_start], seg_len)
        carried_seq = np.repeat(
            np.array([c[2] for c in carried], dtype=np.int64), seg_len
        )
        session_seq = carried_seq + within

        # session_start: the ts at new-session rows, else inherited — a
        # segment head ALWAYS has a value (new session, or the carried
        # start when continuing), so one global ffill fills the rest
        start = np.where(new_sess, t, np.datetime64("NaT"))
        cont = seg_start[~new_sess[seg_start]]
        if len(cont):
            start[cont] = np.array(
                [np.datetime64(pd.Timestamp(carried[i][1]).to_datetime64(),
                               "ns")
                 for i in np.flatnonzero(~new_sess[seg_start])],
                dtype="datetime64[ns]",
            )
        start = pd.Series(start).ffill().to_numpy()

        epoch_us = start.astype("datetime64[ns]").astype(np.int64) // 1000
        df["session_seq"] = session_seq
        df["session_id"] = (
            df[self.key].astype(str) + "|"
            + pd.Series(epoch_us, index=df.index).astype(str)
        )

        # carry state forward: last row of each segment
        seg_end = seg_start + seg_len - 1
        for i, e in enumerate(seg_end):
            self.state[uniques[codes[e]]] = (
                pd.Timestamp(t[e]), pd.Timestamp(start[e]),
                int(session_seq[e]),
            )
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
    allowed_lateness_s: float | None = 0.0,
):
    """Feed a time-ordered iterable of pandas batches through a pool of
    session actors (hash-routed by key) and yield sessionized batches.

    The driver routes rows by key hash so each actor sees every row of
    its keys in order; actor calls per batch run concurrently across
    buckets. The ordering contract is ENFORCED by default: each actor
    tracks an event-time watermark (max seen ts − ``allowed_lateness_s``)
    and drops rows behind it (counted in the actor's ``dropped_late``)
    rather than corrupting session state; pass ``None`` to disable.
    """
    import ray

    from ..stages.partition import key_hash

    ActorCls = ray.remote(SessionState)
    actors = [
        ActorCls.remote(key, ts, gap_seconds, allowed_lateness_s)
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


class StreamingDedupState:
    """Incremental exact dedup over an unbounded stream with BOUNDED
    state: a row passes iff its key was not seen within the
    ``horizon_seconds`` event-time window; seen-keys older than
    ``watermark − horizon`` are evicted, so state holds only the keys
    active inside the horizon — never the stream history.

    Semantics are session-gap ("touch-on-access"): ANY occurrence of a
    key — emitted or suppressed — refreshes its suppression window, so
    a near-continuous duplicate stream stays suppressed, and a key is
    re-admitted only after a full ``horizon`` of silence (exactly the
    first row of each (key, horizon-gap) session — the prefix-summable
    form, so the kernel is fully vectorized like :class:`SessionState`).
    Eviction is safe by construction: a key silent past
    ``watermark − horizon`` would be novel anyway."""

    def __init__(self, keys, ts: str, horizon_seconds: float,
                 allowed_lateness_s: float = 0.0):
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.ts = ts
        self.horizon = pd.Timedelta(seconds=horizon_seconds)
        self.tracker = WatermarkTracker(ts, allowed_lateness_s)
        self.seen: dict = {}  # key (tuple) -> last SEEN ts (any occurrence)
        self.dropped_late = 0

    def _key_series(self, df: pd.DataFrame) -> pd.Series:
        if len(self.keys) == 1:
            return df[self.keys[0]]
        return pd.Series(
            list(map(tuple, df[self.keys].itertuples(index=False))),
            index=df.index,
        )

    def process(self, df: pd.DataFrame) -> pd.DataFrame:
        """Feed one batch, return its NOVEL rows. Late rows (behind the
        watermark) are counted and dropped — admitting them could
        contradict an already-emitted dedup decision."""
        df, late = self.tracker.split(df)
        self.dropped_late += len(late)
        if len(df) == 0:
            return df
        df = df.sort_values([*self.keys, self.ts], kind="mergesort")
        k = self._key_series(df)
        t = df[self.ts].to_numpy().astype("datetime64[ns]")
        prev = np.empty(len(df), dtype="datetime64[ns]")
        prev[1:] = t[:-1]
        # factorize like SessionState: NaN/pd.NA keys group into ONE code
        # (a raw != scan would make every null row its own head and null
        # dict keys never match across batches)
        codes, uniques = pd.factorize(k, use_na_sentinel=False)
        heads = np.r_[True, codes[1:] != codes[:-1]]
        head_pos = np.flatnonzero(heads)

        def norm(u):
            # dict-safe key: null scalars/components → None (a singleton)
            if isinstance(u, tuple):
                return tuple(None if pd.isna(x) else x for x in u)
            return None if pd.isna(u) else u

        head_keys = [norm(uniques[codes[p]]) for p in head_pos]
        prev[head_pos] = np.array(
            [np.datetime64(pd.Timestamp(c).to_datetime64(), "ns")
             if (c := self.seen.get(hk)) is not None else np.datetime64("NaT")
             for hk in head_keys],
            dtype="datetime64[ns]",
        )
        gap_ns = np.timedelta64(int(self.horizon.value), "ns")
        novel_mask = np.isnat(prev) | ((t - prev) > gap_ns)
        novel = df[novel_mask]
        # touch-on-access: the latest occurrence per key refreshes state;
        # max() so an on-time OUT-OF-ORDER row (allowed lateness > 0)
        # can't rewind the suppression window
        last_pos = np.r_[head_pos[1:] - 1, len(df) - 1]
        for hk, p in zip(head_keys, last_pos):
            ts_ = pd.Timestamp(t[p])
            old = self.seen.get(hk)
            self.seen[hk] = ts_ if old is None or ts_ > old else old
        wm = self.tracker.watermark
        if wm is not None:
            cut = wm - self.horizon
            self.seen = {key: ts_ for key, ts_ in self.seen.items()
                         if ts_ >= cut}
        return novel


class TumblingWindowState:
    """Incremental event-time tumbling (or, with ``hop_seconds``,
    HOPPING) windows with watermark-driven emission: per-(key, window)
    partial aggregates accumulate as batches arrive; a window is
    FINALIZED and emitted once the watermark (max seen ts − allowed
    lateness) passes its end, after which rows for it are counted as
    dropped-late instead of corrupting an emitted result. Hopping
    windows overlap: each row lands in ``window/hop`` windows
    (``window_seconds`` must be a multiple of ``hop_seconds``);
    assignments to already-closed windows are discarded at accumulate
    time so a late-but-not-fully-late row updates only its open windows.

    State is bounded by the number of OPEN windows (keys × windows inside
    the lateness horizon), not by the stream length — the defining
    property of a streaming window operator. Results over a fully
    flushed, in-order stream are identical to the batch tumbling /
    hopping aggregate (pinned by tests)."""

    def __init__(self, key: str, ts: str, value: str, window_seconds: float,
                 allowed_lateness_s: float = 0.0,
                 hop_seconds: float | None = None):
        self.key = key
        self.ts = ts
        self.value = value
        self.win_ns = np.int64(window_seconds * 1e9)
        self.hop_ns = np.int64((hop_seconds or window_seconds) * 1e9)
        if self.win_ns % self.hop_ns:
            raise ValueError("window_seconds must be a multiple of hop_seconds")
        self.tracker = WatermarkTracker(ts, allowed_lateness_s)
        # (key, window_start_ns) -> [count, sum, min, max]
        self.partials: dict = {}
        self.emitted_before_ns: int | None = None  # windows < this are closed
        self.dropped_late = 0

    def _accumulate(self, df: pd.DataFrame) -> None:
        ts_ns = df[self.ts].to_numpy().astype("datetime64[ns]").astype(np.int64)
        nw = int(self.win_ns // self.hop_ns)
        win = (ts_ns // self.hop_ns) * self.hop_ns
        keys = df[self.key].to_numpy()
        vals = df[self.value].to_numpy()
        if nw > 1:  # hopping: replicate each row over its nw windows
            win = (
                win[:, None]
                - self.hop_ns * np.arange(nw, dtype=np.int64)[None, :]
            ).reshape(-1)
            keys = np.repeat(keys, nw)
            vals = np.repeat(vals, nw)
            if self.emitted_before_ns is not None:
                open_mask = win + self.win_ns > self.emitted_before_ns
                win, keys, vals = win[open_mask], keys[open_mask], vals[open_mask]
        g = (
            pd.DataFrame({"k": keys, "w": win,
                          "v": vals})
            .groupby(["k", "w"], sort=False)["v"]
            .agg(["count", "sum", "min", "max"])
        )
        # vectorized batch aggregation above; merging the (bounded) set of
        # touched (key, window) partials below iterates TUPLES, not a
        # pandas row view per group (itertuples is ~50× iterrows)
        partials = self.partials
        for kw, c, s, mn, mx in g.itertuples(name=None):
            cur = partials.get(kw)
            if cur is None:
                partials[kw] = [int(c), s, mn, mx]
            else:
                cur[0] += int(c)
                cur[1] += s
                if mn < cur[2]:
                    cur[2] = mn
                if mx > cur[3]:
                    cur[3] = mx

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
                # a row is FULLY late only when even its latest window
                # (start = floor(ts/hop)*hop) has closed; partially-late
                # rows keep their open windows (_accumulate filters the
                # closed assignments)
                win = (ts_ns // self.hop_ns) * self.hop_ns
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
    hop_seconds: float | None = None,
):
    """Feed a time-ordered iterable of pandas batches through a pool of
    tumbling-window actors (hash-routed by key); yields finalized-window
    frames as watermarks advance, then the end-of-stream flush.
    ``hop_seconds`` switches the pool to overlapping HOPPING windows."""
    import ray

    from ..stages.partition import key_hash

    ActorCls = ray.remote(TumblingWindowState)
    actors = [
        ActorCls.remote(key, ts, value, window_seconds, allowed_lateness_s,
                        hop_seconds)
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


class StreamingAsofState:
    """Streaming point-in-time (as-of) join: FEATURE rows and EVENT rows
    arrive in interleaved batches; each event joins the latest feature
    with ``feature_ts <= ts`` for its key — but is emitted only once the
    FEATURE-side watermark has passed its timestamp, i.e. once every
    feature at-or-before it is guaranteed to have arrived. That gives
    both halves of point-in-time correctness under streaming ingest:
    zero temporal leakage (never a future feature) and zero missed
    features (never an emit before the past is complete).

    State is bounded when ``event_horizon_s`` is set: events older than
    ``feature_watermark − event_horizon`` are counted dropped-late, and
    features per key are evicted once no admissible event can reach
    them (everything strictly older than the key's latest feature at or
    below that bound). Without a horizon, features accumulate (the
    caller owns the trade-off).

    Results over fully flushed streams are identical to the batch
    :func:`~transmog_ray.stages.asof.asof_join` (pinned by tests).
    Deploy per key shard inside an actor pool exactly like
    :class:`SessionState` — hash-route batches by key so a key never
    spans actors.
    """

    def __init__(self, key: str, left_ts: str, right_ts: str,
                 right_cols, allowed_lateness_s: float = 0.0,
                 event_horizon_s: float | None = None):
        self.key = key
        self.lts = left_ts
        self.rts = right_ts
        self.rcols = list(right_cols)
        self.tracker = WatermarkTracker(right_ts, allowed_lateness_s)
        self.event_horizon = (
            pd.Timedelta(seconds=event_horizon_s)
            if event_horizon_s is not None else None
        )
        self._feat_parts: list[pd.DataFrame] = []
        self._feat: pd.DataFrame | None = None  # consolidated, sorted
        self._pending: list[pd.DataFrame] = []
        self.dropped_late_features = 0
        self.dropped_late_events = 0

    def add_features(self, df: pd.DataFrame) -> None:
        """Ingest a feature batch; rows behind the watermark are dropped
        (events at their timestamps may already have been emitted)."""
        ok, late = self.tracker.split(df)
        self.dropped_late_features += len(late)
        if len(ok):
            # consolidation happens lazily; the existing consolidated
            # frame stays live and merges with these parts on next use
            self._feat_parts.append(
                ok[[self.key, self.rts, *self.rcols]].copy()
            )

    def _consolidated(self) -> pd.DataFrame:
        """Lazy single sorted feature frame (re-sorted only after new
        feature batches arrive)."""
        if self._feat is None or self._feat_parts:
            live = [p for p in ([self._feat] + self._feat_parts)
                    if p is not None and len(p)]
            self._feat = (
                pd.concat(live, ignore_index=True)
                .sort_values([self.key, self.rts], kind="mergesort")
                .reset_index(drop=True)
                if live
                else pd.DataFrame(
                    {self.key: [], self.rts: [],
                     **{c: [] for c in self.rcols}}
                )
            )
            self._feat_parts = []
        return self._feat

    def _evict(self, bound) -> None:
        """Drop features no admissible event (ts ≥ bound) can join: all
        but the latest per key among rows strictly below the bound."""
        feat = self._consolidated()
        if not len(feat):
            return
        old = (feat[self.rts] < bound).to_numpy()
        if not old.any():
            return
        # sorted by (key, ts): an old row is evictable iff the NEXT row
        # exists, is the same key, and is also old (a newer feature that
        # every admissible event would match instead)
        keys = feat[self.key].to_numpy()
        next_same_key_old = np.zeros(len(feat), dtype=bool)
        next_same_key_old[:-1] = old[1:] & (keys[:-1] == keys[1:])
        self._feat = feat[~(old & next_same_key_old)].reset_index(drop=True)

    def process(self, events_df: pd.DataFrame | None = None) -> pd.DataFrame:
        """Buffer an event batch (optional) and emit every buffered event
        whose timestamp the feature watermark has passed."""
        wm = self.tracker.watermark
        if events_df is not None and len(events_df):
            if self.event_horizon is not None and wm is not None:
                bound = wm - self.event_horizon
                late = events_df[self.lts] < bound
                self.dropped_late_events += int(late.sum())
                events_df = events_df[~late]
            if len(events_df):
                self._pending.append(events_df)
        if wm is None or not self._pending:
            return self._empty_out()
        pending = pd.concat(self._pending, ignore_index=True)
        # STRICTLY behind the watermark: a feature with ts == watermark
        # is not yet late (late is strict <) and could still arrive, so
        # an equal-ts event emitted now might miss it
        ready_mask = pending[self.lts] < wm
        ready = pending[ready_mask]
        self._pending = (
            [pending[~ready_mask]] if (~ready_mask).any() else []
        )
        if self.event_horizon is not None:
            self._evict(wm - self.event_horizon)
        return self._join(ready)

    def flush(self) -> pd.DataFrame:
        """End of both streams: emit every still-buffered event against
        the full feature state."""
        if not self._pending:
            return self._empty_out()
        pending = pd.concat(self._pending, ignore_index=True)
        self._pending = []
        return self._join(pending)

    def _join(self, events: pd.DataFrame) -> pd.DataFrame:
        from ..stages.asof import _merge_asof

        if not len(events):
            return self._empty_out()
        return _merge_asof(
            events, self._consolidated(), self.key, self.lts, self.rts,
            self.rcols, tolerance_seconds=None,
        )

    def _empty_out(self) -> pd.DataFrame:
        cols = {self.key: [], self.lts: [], self.rts: [],
                **{c: [] for c in self.rcols}}
        return pd.DataFrame(cols)


class StreamingIntervalState:
    """Streaming interval (range) join: WINDOW rows (key, win_id,
    [start, end]) and EVENT rows (key, ts, payload) arrive in
    interleaved batches; each event joins EVERY window containing its
    timestamp. An event is emitted only once the window-side watermark
    (driven by window START times) strictly passes its timestamp: every
    window with start ≤ ts is then guaranteed to have arrived, and a
    window with start > ts can never contain it — so emissions are
    complete AND leak-free. Windows arriving behind that watermark are
    counted ``dropped_late_windows`` (events they could have matched may
    already be out).

    State is bounded: a window is evicted once nothing can still land
    inside it — its end is below BOTH the event-side watermark (no
    future arrival can be earlier) and the earliest still-buffered
    event. Fully-flushed output equals the batch
    :func:`~transmog_ray.functions.relational.range_join` (pinned by
    tests). Shard by key hash inside an actor pool like the other
    streaming states."""

    def __init__(self, key: str, left_ts: str, win_start: str,
                 win_end: str, win_cols,
                 allowed_lateness_s: float = 0.0):
        self.key = key
        self.lts = left_ts
        self.ws = win_start
        self.we = win_end
        self.wcols = list(win_cols)
        self.win_tracker = WatermarkTracker(win_start, allowed_lateness_s)
        self.ev_tracker = WatermarkTracker(left_ts, allowed_lateness_s)
        self._wins: list[pd.DataFrame] = []
        self._pending: list[pd.DataFrame] = []
        self.dropped_late_windows = 0

    def add_windows(self, df: pd.DataFrame) -> None:
        ok, late = self.win_tracker.split(df)
        self.dropped_late_windows += len(late)
        if len(ok):
            self._wins.append(
                ok[[self.key, self.ws, self.we, *self.wcols]].copy())

    def _win_frame(self) -> pd.DataFrame:
        if len(self._wins) > 1:
            self._wins = [pd.concat(self._wins, ignore_index=True)]
        return self._wins[0] if self._wins else pd.DataFrame(
            {self.key: [], self.ws: [], self.we: [],
             **{c: [] for c in self.wcols}})

    def process(self, events_df: pd.DataFrame | None = None) -> pd.DataFrame:
        if events_df is not None and len(events_df):
            self.ev_tracker.split(events_df)  # advance the event watermark
            self._pending.append(events_df)
        wm = self.win_tracker.watermark
        if wm is None or not self._pending:
            return pd.DataFrame()
        pending = pd.concat(self._pending, ignore_index=True)
        ready_mask = (pending[self.lts] < wm).to_numpy()
        ready = pending[ready_mask]
        rest = pending[~ready_mask]
        self._pending = [rest] if len(rest) else []
        out = self._join(ready)
        # eviction: a window whose end is below both the event watermark
        # and every still-buffered event can never match again
        ewm = self.ev_tracker.watermark
        if ewm is not None:
            bound = ewm if not len(rest) else min(ewm, rest[self.lts].min())
            wf = self._win_frame()
            if len(wf):
                keep = (wf[self.we] >= bound).to_numpy()
                if not keep.all():
                    self._wins = [wf[keep].reset_index(drop=True)]
        return out

    def flush(self) -> pd.DataFrame:
        if not self._pending:
            return pd.DataFrame()
        pending = pd.concat(self._pending, ignore_index=True)
        self._pending = []
        return self._join(pending)

    def _join(self, events: pd.DataFrame) -> pd.DataFrame:
        if not len(events):
            return pd.DataFrame()
        w = self._win_frame()
        if not len(w):
            return pd.DataFrame()
        m = events.merge(w, on=self.key)
        inside = ((m[self.lts] >= m[self.ws])
                  & (m[self.lts] <= m[self.we])).to_numpy()
        return m[inside]


def streaming_interval_join(
    stream,
    key: str,
    left_ts: str,
    win_start: str,
    win_end: str,
    win_cols,
    num_shards: int = 8,
    allowed_lateness_s: float = 0.0,
):
    """Distributed streaming interval join: replay an interleaved stream
    of ``("window", df)`` / ``("event", df)`` batches through
    ``num_shards`` actor-held :class:`StreamingIntervalState` shards
    (hash-routed by key — a key never spans shards). Yields joined
    frames as the window watermark releases them; flushes at end."""
    import ray

    from ..stages.partition import key_hash

    state_cls = ray.remote(StreamingIntervalState)
    actors = [
        state_cls.remote(key, left_ts, win_start, win_end, win_cols,
                         allowed_lateness_s)
        for _ in range(num_shards)
    ]
    for kind, batch in stream:
        if batch.empty:
            continue
        buckets = key_hash(batch, [key]) % np.uint64(num_shards)
        refs = []
        for b in range(num_shards):
            part = batch[buckets == b]
            if not len(part):
                continue
            if kind == "window":
                refs.append(actors[b].add_windows.remote(part))
            else:
                refs.append(actors[b].process.remote(part))
        for out in ray.get(refs):
            if out is not None and len(out):
                yield out
    for out in ray.get([a.flush.remote() for a in actors]):
        if out is not None and len(out):
            yield out


def streaming_asof(
    stream,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols,
    num_shards: int = 8,
    allowed_lateness_s: float = 0.0,
    event_horizon_s: float | None = None,
):
    """Distributed streaming point-in-time join: replay an interleaved
    stream of ``("feature", df)`` / ``("event", df)`` batches through
    ``num_shards`` actor-held :class:`StreamingAsofState` shards
    (hash-routed by key — a key never spans shards, the same contract as
    :func:`streaming_sessionize`). Yields joined event frames as the
    feature watermark releases them; flushes at end of stream."""
    import ray

    from ..stages.partition import key_hash

    state_cls = ray.remote(StreamingAsofState)
    actors = [
        state_cls.remote(key, left_ts, right_ts, right_cols,
                         allowed_lateness_s, event_horizon_s)
        for _ in range(num_shards)
    ]
    for kind, batch in stream:
        if batch.empty:
            continue
        buckets = key_hash(batch, [key]) % np.uint64(num_shards)
        refs = []
        for b in range(num_shards):
            part = batch[buckets == b]
            if not len(part):
                continue
            if kind == "feature":
                refs.append(actors[b].add_features.remote(part))
            else:
                refs.append(actors[b].process.remote(part))
        for out in ray.get(refs):
            if out is not None and len(out):
                yield out
    for out in ray.get([a.flush.remote() for a in actors]):
        if len(out):
            yield out


__all__ = [
    "SessionState",
    "WatermarkTracker",
    "TumblingWindowState",
    "StreamingDedupState",
    "StreamingAsofState",
    "StreamingIntervalState",
    "streaming_sessionize",
    "streaming_asof",
    "streaming_interval_join",
    "streaming_tumbling",
]
