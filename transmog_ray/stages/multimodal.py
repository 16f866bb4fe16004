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


# -------------------------------------------------- pure-Python codecs
#
# One REAL decode path per modality with zero dependencies: uncompressed
# 24-bit BMP and binary PPM (P6) for images, RIFF/WAVE int16 PCM for
# audio. Anything these can't sniff falls back to the byte-level stub
# (or raises in strict mode) — the codec LAYER is real end-to-end for
# the trivial containers while exotic codecs stay honestly stubbed.


def encode_bmp(gray: np.ndarray) -> bytes:
    """Encode a (H, W) uint8 grayscale array as an uncompressed 24-bit
    bottom-up BMP (r=g=b) — fixture/test helper for :func:`decode_bmp`."""
    import struct

    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = np.repeat(gray[:, :, None], 3, axis=2)  # B=G=R=gray
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    return header + info + rows[::-1].tobytes()  # bottom-up row order


def decode_bmp(b: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to (H, W) uint8 grayscale
    (integer mean ``(r+g+b)//3`` — exact, no float rounding)."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression="
                         f"{compression}); only uncompressed 24-bit")
    flip = h > 0  # positive height = bottom-up
    h = abs(h)
    row_size = (3 * w + 3) // 4 * 4
    need = off + row_size * h
    if len(b) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=off)
    px = rows.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if flip:
        px = px[::-1]
    return (px.astype(np.int64).sum(axis=2) // 3).astype(np.uint8)


def encode_ppm(gray: np.ndarray) -> bytes:
    """Encode a (H, W) uint8 grayscale array as binary PPM (P6, r=g=b)."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval 255) to (H, W) uint8 grayscale
    (integer mean)."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments starting '#' allowed), then ONE whitespace byte
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    if len(b) - pos < need:
        raise ValueError("truncated PPM payload")
    px = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos)
    px = px.reshape(h, w, 3)
    return (px.astype(np.int64).sum(axis=2) // 3).astype(np.uint8)


def sniff_image(b) -> str | None:
    """Container sniff for the pure-Python image decoders."""
    if b is None:
        return None
    if len(b) >= 54 and b[:2] == b"BM":
        return "bmp"
    if len(b) >= 2 and b[:2] == b"P6":
        return "ppm"
    return None


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Encode int16 PCM samples (interleaved if multi-channel) as a
    RIFF/WAVE payload — fixture/test helper for :func:`parse_wav`."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    block_align = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(b: bytes):
    """Parse a RIFF/WAVE payload → (int16 samples of channel 0,
    sample_rate, channels). Walks chunks, so extra chunks (LIST, fact)
    between fmt and data are fine. Only PCM (format 1) 16-bit."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={fmt_code}, bits={bits}); "
                    "only 16-bit PCM")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    if channels and channels > 1:
        samples = samples[::channels]  # channel 0
    return samples, rate, channels


def sniff_wav(b) -> bool:
    return (b is not None and len(b) >= 12 and b[:4] == b"RIFF"
            and b[8:12] == b"WAVE")


class ImageDecodeStage:
    """Actor-pool stage: decode + feature-extract image payloads.

    ``__init__`` (once per actor) probes for PIL; ``__call__`` (per
    batch) decodes with PIL when available. Without PIL, payloads that
    sniff as uncompressed 24-bit BMP or binary PPM go through the REAL
    pure-Python decoders above and emit features over the DECODED
    grayscale pixels (the same 16-bin-histogram + log-length recipe,
    computed on pixels instead of encoded bytes); anything else either
    raises (strict) or uses the deterministic byte-histogram fallback.
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
            decoders = ["pil"] * len(df)
        else:
            feats = np.zeros((len(df), FEATURE_DIM + 1), dtype=np.float64)
            decoders = []
            for i, b in enumerate(df["payload"]):
                kind = sniff_image(b)
                if kind == "bmp":
                    gray = decode_bmp(b)
                elif kind == "ppm":
                    gray = decode_ppm(b)
                elif self.strict:
                    raise NotImplementedError(
                        "payload is not a BMP/PPM container and real "
                        "codec decoding requires Pillow, which is not "
                        "installed; construct with strict=False for the "
                        "deterministic byte-level fallback"
                    )
                else:
                    feats[i] = byte_histogram_features([b])[0]
                    decoders.append("byte-histogram-stub")
                    continue
                feats[i] = byte_histogram_features([gray.tobytes()])[0]
                decoders.append(f"{kind}-pure")
        out = df.drop(columns=["payload"])  # bytes never leave this stage
        out["features"] = list(feats)
        out["feature_dim"] = feats.shape[1]
        out["decoder"] = decoders
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

    Payloads that sniff as RIFF/WAVE go through the REAL pure-Python
    header parse (:func:`parse_wav` — fmt/data chunk walk, channel-0
    extraction); anything else is interpreted as raw little-endian
    int16 PCM (a trailing odd byte is dropped). Either way the stage
    emits one row per ``window`` samples: (id, window_id, n_samples,
    sum_abs, max_abs) — all integers, so it hash-compares against a
    DuckDB oracle that re-decodes the samples from per-byte fixture
    rows. Exotic audio codecs stay stubbed (no audio libs in this
    container); bytes never leave the stage."""

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
            if sniff_wav(payload):
                samples = parse_wav(payload)[0].astype(np.int64)
                if len(samples) == 0:
                    continue
            else:
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
    "encode_bmp",
    "decode_bmp",
    "encode_ppm",
    "decode_ppm",
    "encode_wav",
    "parse_wav",
    "sniff_image",
    "sniff_wav",
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
