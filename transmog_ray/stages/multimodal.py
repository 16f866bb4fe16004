"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Ray-side plumbing — schema contract, actor-pool stages, small batch
sizes for fat binary rows, deterministic outputs — is real and tested.
The CODEC layer is stubbed: this container ships no image/audio
libraries, so real decoding raises ``NotImplementedError`` unless the
optional dependency is importable, and a deterministic byte-level
fallback ("fake decode") keeps pipelines runnable end-to-end.

Schema contract for a media table:

    media(id: int64, media_type: string,   # "image" | "audio" | "video"
          payload: binary,                 # opaque encoded bytes
          meta: string)                    # JSON sidecar (codec, dims, …)

Scale notes: payload rows are MBs — stages here default to SMALL
``batch_size`` (64) so batch × concurrency stays within worker heaps,
and features are emitted WITHOUT the payload column so downstream
shuffles never move the bytes.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

FEATURE_DIM = 16


def byte_histogram_features(payloads, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic per-blob features from raw bytes (the 'fake decode'):
    a normalized ``dim``-bin byte histogram + log-length. Vectorized per
    blob with numpy — real compute, stable across processes."""
    out = np.zeros((len(payloads), dim + 1), dtype=np.float64)
    for i, b in enumerate(payloads):
        if b is None or len(b) == 0:
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=dim)[:dim]
        out[i, :dim] = hist / len(arr)
        out[i, dim] = np.log1p(len(arr))
    return out


class ImageDecodeStage:
    """Actor-pool stage: decode + feature-extract image payloads.

    ``__init__`` (once per actor) probes for PIL; ``__call__`` (per
    batch) decodes when available, else either raises (strict) or uses
    the deterministic byte-histogram fallback.
    Use: ``ds.map_batches(ImageDecodeStage, fn_constructor_kwargs=
    {"strict": False}, batch_size=64, concurrency=N)``.
    """

    def __init__(self, strict: bool = False, resize_to: tuple[int, int] = (32, 32)):
        self.strict = strict
        self.resize_to = resize_to
        try:  # optional dependency — absent in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self._pil is not None:  # pragma: no cover — PIL not shipped here
            feats = self._decode_real(df["payload"])
        elif self.strict:
            raise NotImplementedError(
                "image decoding requires Pillow, which is not installed; "
                "construct with strict=False for the deterministic "
                "byte-level fallback"
            )
        else:
            feats = byte_histogram_features(df["payload"].tolist())
        out = df.drop(columns=["payload"])  # bytes never leave this stage
        out["features"] = list(feats)
        out["feature_dim"] = feats.shape[1]
        out["decoder"] = "pil" if self._pil is not None else "byte-histogram-stub"
        return out

    def _decode_real(self, payloads):  # pragma: no cover
        import io

        rows = []
        for b in payloads:
            img = self._pil.open(io.BytesIO(b)).convert("L").resize(self.resize_to)
            arr = np.asarray(img, dtype=np.float64) / 255.0
            rows.append(arr.reshape(-1)[: FEATURE_DIM + 1])
        return np.vstack(rows)


class FrameSampleStage:
    """Video frame-sampling stub: emits the frame-index PLAN (which frames
    a real decoder would extract) so scheduling/fan-out is testable
    without a codec. One row per sampled frame."""

    def __init__(self, every_n_seconds: float = 1.0, max_frames: int = 8):
        self.every = every_n_seconds
        self.max_frames = max_frames

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"id": [], "frame_index": [], "frame_ts_s": []}
        if len(df) == 0:  # typed empty (actor pools emit filler blocks)
            return pd.DataFrame({
                "id": pd.Series(dtype="int64"),
                "frame_index": pd.Series(dtype="int64"),
                "frame_ts_s": pd.Series(dtype="float64"),
            })
        for rid, meta in zip(df["id"], df["meta"]):
            info = json.loads(meta) if meta else {}
            duration = float(info.get("duration_s", 0.0))
            fps = float(info.get("fps", 30.0))
            n = min(self.max_frames, max(1, int(duration / self.every)))
            for k in range(n):
                ts = k * self.every
                rows["id"].append(rid)
                rows["frame_index"].append(int(ts * fps))
                rows["frame_ts_s"].append(ts)
        return pd.DataFrame(rows)


class ByteHistogramStage:
    """Actor-pool stage emitting the EXACT integer sufficient statistics of
    the byte-histogram decode — exploded (id, media_type, decoder, bucket,
    count, blob_len) rows, one per non-empty bucket. All-integer output makes
    the stage hash-comparable against a DuckDB oracle over per-byte rows
    (unlike the float features, which divide/log). Fully vectorized: all
    blobs in a batch concatenate into ONE uint8 array, ids repeat by length,
    and a single ``bincount`` over ``row*nbuckets + (byte>>shift)`` produces
    every histogram at once."""

    OUT_COLS = ("id", "media_type", "decoder", "bucket", "count", "blob_len")

    def __init__(self, bucket_bits: int = 4):
        self.shift = 8 - bucket_bits
        self.nbuckets = 1 << bucket_bits

    def _empty(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": pd.Series(dtype="int64"),
                "media_type": pd.Series(dtype="object"),
                "decoder": pd.Series(dtype="object"),
                "bucket": pd.Series(dtype="int64"),
                "count": pd.Series(dtype="int64"),
                "blob_len": pd.Series(dtype="int64"),
            }
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return self._empty()
        payloads = df["payload"].tolist()
        lens = np.array(
            [0 if b is None else len(b) for b in payloads], dtype=np.int64
        )
        total = int(lens.sum())
        if total == 0:
            return self._empty()
        arr = np.frombuffer(b"".join(b for b in payloads if b), dtype=np.uint8)
        row_idx = np.repeat(np.arange(len(payloads), dtype=np.int64), lens)
        key = row_idx * self.nbuckets + (arr >> self.shift)
        counts = np.bincount(
            key, minlength=len(payloads) * self.nbuckets
        ).reshape(len(payloads), self.nbuckets)
        rows, buckets = np.nonzero(counts)
        return pd.DataFrame(
            {
                "id": df["id"].to_numpy()[rows],
                "media_type": df["media_type"].to_numpy()[rows],
                "decoder": "byte-histogram-stub",
                "bucket": buckets.astype(np.int64),
                "count": counts[rows, buckets].astype(np.int64),
                "blob_len": lens[rows],
            }
        )


def media_histogram(ds, concurrency: int = 2, batch_size: int = 64):
    """Exploded exact byte-histogram features over a media table (actor
    pool, small batches for fat rows, payload dropped inside the stage so
    bytes never shuffle). Oracle-pairable: every output column is an
    integer or constant string."""
    return ds.map_batches(
        ByteHistogramStage,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def write_media(out_dir: str, n: int = 256, seed: int = 9) -> str:
    """Write the deterministic media fixture: ``media.parquet`` (id,
    media_type, payload BLOB, meta) + ``media_bytes.parquet`` — the same
    payloads exploded to (id, pos, byteval) rows so ANSI SQL can
    recompute byte-level features (histograms, int16 sample decoding)
    exactly. Idempotent per directory."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, "media.parquet")
    # v2: per-byte rows carry their POSITION (audio sample decoding
    # needs byte parity); the name bump invalidates stale v1 fixtures
    bpath = os.path.join(out_dir, "media_bytes_v2.parquet")
    if os.path.exists(mpath) and os.path.exists(bpath):
        return out_dir
    df = synth_media_table(n=n, seed=seed)
    lens = np.array([len(b) for b in df["payload"]], dtype=np.int64)
    ids = np.repeat(df["id"].to_numpy(np.int64), lens)
    pos = np.concatenate([np.arange(ln, dtype=np.int64) for ln in lens])
    byteval = np.frombuffer(b"".join(df["payload"]), dtype=np.uint8)
    bytes_tbl = pa.table(
        {"id": ids, "pos": pos, "byteval": byteval.astype(np.int64)}
    )
    media_tbl = pa.Table.from_pandas(df, preserve_index=False)
    for path, tbl in ((mpath, media_tbl), (bpath, bytes_tbl)):
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return out_dir


class AudioFrameStage:
    """Actor-pool stage: windowed energy statistics over audio payloads.

    The 'decode' interprets the opaque payload as little-endian int16
    PCM samples (a trailing odd byte is dropped) and emits one row per
    ``window`` samples: (id, window_id, n_samples, sum_abs, max_abs) —
    all integers, so the stage hash-compares against a DuckDB oracle
    that re-decodes the samples from per-byte fixture rows. A real
    audio codec would slot in front of the same windowing (the codec
    layer stays stubbed — no audio libs in this container); bytes never
    leave the stage."""

    OUT = ("id", "window_id", "n_samples", "sum_abs", "max_abs")

    def __init__(self, window: int = 256):
        self.window = window

    def _empty(self) -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in self.OUT})

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return self._empty()
        out = []
        for rid, payload in zip(df["id"], df["payload"]):
            if payload is None or len(payload) < 2:
                continue
            samples = np.frombuffer(
                payload[: len(payload) // 2 * 2], dtype="<i2"
            ).astype(np.int64)
            a = np.abs(samples)
            n = len(a)
            n_win = (n + self.window - 1) // self.window
            wid = np.arange(n, dtype=np.int64) // self.window
            sums = np.bincount(wid, weights=a, minlength=n_win).astype(np.int64)
            counts = np.bincount(wid, minlength=n_win).astype(np.int64)
            maxs = np.maximum.reduceat(
                a, np.arange(0, n, self.window, dtype=np.int64)
            )
            out.append(pd.DataFrame({
                "id": np.int64(rid),
                "window_id": np.arange(n_win, dtype=np.int64),
                "n_samples": counts,
                "sum_abs": sums,
                "max_abs": maxs,
            }))
        return pd.concat(out, ignore_index=True) if out else self._empty()


def audio_features(ds, window: int = 256, concurrency: int = 2,
                   batch_size: int = 64):
    """Windowed audio-energy pipeline over a media table (actor pool,
    small batches for fat rows)."""
    return ds.map_batches(
        AudioFrameStage,
        fn_constructor_kwargs={"window": window},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_features(ds, concurrency: int = 2, batch_size: int = 64):
    """Image-feature pipeline over a media table (actor pool, small
    batches for fat rows, payload dropped before any shuffle)."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"strict": False},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 64, seed: int = 9) -> pd.DataFrame:
    """Deterministic fake media table for tests/benches (payload bytes
    derived from the id — no external data)."""
    rng = np.random.default_rng(seed)
    rows = {"id": [], "media_type": [], "payload": [], "meta": []}
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        size = int(rng.integers(256, 4096))
        payload = (np.arange(size, dtype=np.uint8) * ((i % 250) + 3)).tobytes()
        rows["id"].append(i)
        rows["media_type"].append(kind)
        rows["payload"].append(payload)
        rows["meta"].append(
            json.dumps({"codec": "fake", "duration_s": float(i % 7), "fps": 25.0})
        )
    return pd.DataFrame(rows)


__all__ = [
    "ImageDecodeStage",
    "FrameSampleStage",
    "ByteHistogramStage",
    "AudioFrameStage",
    "media_features",
    "media_histogram",
    "audio_features",
    "byte_histogram_features",
    "synth_media_table",
    "write_media",
    "FEATURE_DIM",
]
