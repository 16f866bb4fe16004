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
    "media_features",
    "byte_histogram_features",
    "synth_media_table",
    "FEATURE_DIM",
]
