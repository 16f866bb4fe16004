"""User-API surface (flatten/flatten_stream/save) and multimodal stages."""

from __future__ import annotations

import csv
import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import transmog_ray as tm
from transmog_ray.stages.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    byte_histogram_features,
    media_features,
    synth_media_table,
)

DATA = [
    {"id": 1, "name": "=danger", "meta": {"v": 2}, "kids": [{"k": "a"}, {"k": "b"}]},
    {"id": 2, "name": "ok", "meta": {"v": 3}, "kids": []},
]


def test_flatten_api_shape():
    r = tm.flatten(DATA, name="thing", config=tm.FlattenConfig(id_generation="hash"))
    assert set(r.all_tables) == {"thing", "thing_kids"}
    assert len(r.main) == 2 and len(r.tables["thing_kids"]) == 2
    assert r.main[0]["meta_v"] == 2


def test_flatten_string_and_jsonl_inputs():
    js = json.dumps(DATA)
    assert len(tm.flatten(js).main) == 2
    jsonl = "\n".join(json.dumps(d) for d in DATA)
    assert len(tm.flatten(jsonl).main) == 2


def test_flatten_file_inputs(tmp_path):
    p = tmp_path / "d.json"
    p.write_text(json.dumps(DATA))
    assert len(tm.flatten(p).main) == 2
    pl = tmp_path / "d.jsonl"
    pl.write_text("\n".join(json.dumps(d) for d in DATA))
    assert len(tm.flatten(str(pl)).main) == 2


def test_save_multi_table_csv_with_injection_guard(tmp_path):
    r = tm.flatten(DATA, name="t", config=tm.FlattenConfig(id_generation="hash"))
    files = r.save(tmp_path / "out", "csv")
    assert {f.name for f in files} == {"t.csv", "t_kids.csv"}
    with open(tmp_path / "out" / "t.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["name"] == "'=danger"  # formula-injection sanitized


def test_save_parquet_roundtrip(tmp_path):
    r = tm.flatten(DATA, name="t", config=tm.FlattenConfig(id_generation="hash"))
    files = r.save(tmp_path / "out", "parquet")
    t = pq.read_table([f for f in files if f.name == "t.parquet"][0])
    assert t.num_rows == 2
    assert "meta_v" in t.column_names


def test_flatten_stream_parts(tmp_path):
    records = [{"i": i, "kids": [{"j": i * 10}]} for i in range(25)]
    files = tm.flatten_stream(
        records, tmp_path / "out", name="r", output_format="parquet",
        config=tm.FlattenConfig(id_generation="hash"), batch_size=10,
    )
    mains = [f for f in files if f.parent.name == "r"]
    kids = [f for f in files if f.parent.name == "r_kids"]
    assert len(mains) == 3  # 10 + 10 + 5
    total = sum(pq.read_table(f).num_rows for f in mains)
    assert total == 25
    assert sum(pq.read_table(f).num_rows for f in kids) == 25


# ------------------------------------------------------------ multimodal


def test_byte_histogram_deterministic():
    blobs = [b"hello world", b"", None, bytes(range(256))]
    a = byte_histogram_features(blobs)
    b = byte_histogram_features(blobs)
    assert np.array_equal(a, b)
    assert a.shape == (4, 17)
    assert np.allclose(a[3, :16], 16 / 256)  # uniform bytes → uniform hist


def test_image_decode_stub_strict_raises():
    stage = ImageDecodeStage(strict=True)
    if stage._pil is None:
        with pytest.raises(NotImplementedError):
            stage(synth_media_table(4))


def test_media_features_pipeline(ray_session):
    import ray.data as rd

    media = synth_media_table(32)
    out = media_features(rd.from_pandas(media), concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 32
    assert "payload" not in out.columns  # bytes never leave the stage
    assert out["decoder"].iloc[0] == "byte-histogram-stub"
    assert all(len(f) == 17 for f in out["features"])
    # deterministic across runs
    out2 = media_features(rd.from_pandas(media), concurrency=2, batch_size=8).to_pandas()
    assert [list(x) for x in out.sort_values("id")["features"]] == [
        list(x) for x in out2.sort_values("id")["features"]
    ]


def test_byte_histogram_stage_matches_loop_reference():
    from transmog_ray.stages.multimodal import ByteHistogramStage

    df = synth_media_table(16)
    out = ByteHistogramStage()(df)
    # per-blob python-loop reference
    for rid, payload in zip(df["id"], df["payload"]):
        arr = np.frombuffer(payload, dtype=np.uint8)
        want = {b: int(c) for b, c in enumerate(np.bincount(arr >> 4, minlength=16)) if c}
        got = out[out["id"] == rid]
        assert dict(zip(got["bucket"], got["count"])) == want
        assert (got["blob_len"] == len(payload)).all()
    # zero-row filler block (actor-pool artifact) → typed empty frame
    empty = ByteHistogramStage()(df.iloc[0:0])
    assert list(empty.columns) == list(out.columns)
    assert empty["id"].dtype == np.int64 and len(empty) == 0


def test_write_media_fixture_roundtrip(tmp_path):
    import pyarrow.parquet as pq

    from transmog_ray.stages.multimodal import write_media

    d = write_media(str(tmp_path / "m"), n=8)
    media = pq.read_table(f"{d}/media.parquet")
    bytes_tbl = pq.read_table(f"{d}/media_bytes_v2.parquet")
    assert media.num_rows == 8
    # exploded rows reassemble each blob's length exactly
    lens = dict(
        zip(
            bytes_tbl["id"].to_pandas().value_counts().index,
            bytes_tbl["id"].to_pandas().value_counts().values,
        )
    )
    for rid, payload in zip(media["id"].to_pylist(), media["payload"].to_pylist()):
        assert lens[rid] == len(payload)
    # idempotent: second call keeps files
    assert write_media(str(tmp_path / "m"), n=8) == d


def test_frame_sample_plan():
    df = synth_media_table(9)
    out = FrameSampleStage(every_n_seconds=1.0, max_frames=4)(df)
    assert set(out.columns) == {"id", "frame_index", "frame_ts_s"}
    # id=6 has duration 6s → 4 frames (capped)
    assert (out[out["id"] == 6]["frame_index"].to_numpy() == [0, 25, 50, 75]).all()


def test_streaming_csv_frozen_header_and_drift(tmp_path):
    records = [{"a": 1, "kids": [{"k": 1}]}, {"a": 2, "b": "new"}]
    files = tm.flatten_stream(
        records, tmp_path / "out", name="r", output_format="csv",
        config=tm.FlattenConfig(id_generation="hash"), batch_size=1,
    )
    with open([f for f in files if f.name == "r.csv"][0]) as f:
        rows = list(csv.DictReader(f))
    # header frozen from first batch: drifted field 'b' silently dropped
    assert "b" not in rows[0]
    assert len(rows) == 2

    with pytest.raises(ValueError, match="schema drift"):
        tm.flatten_stream(
            records, tmp_path / "strict", name="r", output_format="csv",
            config=tm.FlattenConfig(id_generation="hash"), batch_size=1,
            csv_drift="strict",
        )


def test_progress_callbacks():
    records = [{"i": i} for i in range(25)]
    calls = []
    tm.flatten(records, config=tm.FlattenConfig(id_generation="hash", batch_size=10),
               progress_callback=lambda done, total: calls.append((done, total)))
    assert calls == [(10, 25), (20, 25), (25, 25)]
    calls2 = []
    tm.flatten_stream(records, "/tmp/progress_out", name="r",
                      config=tm.FlattenConfig(id_generation="hash"),
                      batch_size=10,
                      progress_callback=lambda d, t: calls2.append((d, t)))
    assert calls2 == [(10, 25), (20, 25), (25, 25)]


def test_jsonl_bad_line_raises_validation_error(tmp_path):
    """VERDICT r3 #8: non-object / invalid JSONL lines must fail at parse
    time with the line number (reference iterators.py:372-400), not later
    as a TypeError inside flattening."""
    from transmog_ray.api import ValidationError, iter_records

    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\n[1, 2, 3]\n{"a": 2}\n')
    with pytest.raises(ValidationError, match="line 2"):
        list(iter_records(str(p)))
    p2 = tmp_path / "invalid.jsonl"
    p2.write_text('{"a": 1}\n{"a": 1}\n{not json\n')
    with pytest.raises(ValidationError, match="line 3"):
        list(iter_records(str(p2)))
    # string input goes through the same validation
    with pytest.raises(ValidationError, match="line 2"):
        list(iter_records('{"a": 1}\n42\n{"a": 3}'))


def test_flatten_progress_callback_streams_generator():
    """VERDICT r3 #6: a callback must not defeat the streaming input —
    the generator is consumed batch by batch (total=None), never list()ed."""
    calls = []

    def gen():
        for i in range(25):
            yield {"a": i}

    res = tm.flatten(
        gen(), config=tm.FlattenConfig(batch_size=10, id_generation="hash"),
        progress_callback=lambda done, total: calls.append((done, total)),
    )
    assert len(res.main) == 25
    assert calls == [(10, None), (20, None), (25, None)]
    # sized input reports its total
    calls.clear()
    tm.flatten(
        [{"a": i} for i in range(25)],
        config=tm.FlattenConfig(batch_size=10, id_generation="hash"),
        progress_callback=lambda done, total: calls.append((done, total)),
    )
    assert calls == [(10, 25), (20, 25), (25, 25)]


def test_parquet_writer_options_roundtrip(tmp_path):
    """VERDICT r3 #7: compression / row_group_size reach the parquet
    writers (reference defaults snappy/10000, writers/parquet.py:38-66)."""
    import pyarrow.parquet as pq

    res = tm.flatten(
        [{"a": i, "kids": [{"k": i}]} for i in range(250)],
        config=tm.FlattenConfig(id_generation="hash"),
    )
    out = res.save(tmp_path / "opt", output_format="parquet",
                   compression="gzip", row_group_size=100)
    for path in out:
        meta = pq.ParquetFile(path).metadata
        assert meta.row_group(0).column(0).compression == "GZIP"
        assert meta.row_group(0).num_rows == 100
    # default save stays on the reference defaults (snappy)
    out2 = res.save(tmp_path / "dflt", output_format="parquet")
    meta2 = pq.ParquetFile(out2[0]).metadata
    assert meta2.row_group(0).column(0).compression == "SNAPPY"
    # streaming writer honors the same knobs
    files = tm.flatten_stream(
        [{"a": i} for i in range(300)], tmp_path / "stream", name="r",
        output_format="parquet", batch_size=300,
        config=tm.FlattenConfig(id_generation="hash"),
        compression="gzip", row_group_size=150,
    )
    m = pq.ParquetFile(files[0]).metadata
    assert m.row_group(0).column(0).compression == "GZIP"
    assert m.row_group(0).num_rows == 150


def test_audio_frame_stage_matches_loop_reference():
    from transmog_ray.stages.multimodal import AudioFrameStage

    df = synth_media_table(12)
    df.loc[3, "payload"] = b"\x07"  # single trailing byte → no samples
    out = AudioFrameStage(window=64)(df)
    for rid, payload in zip(df["id"], df["payload"]):
        samples = np.frombuffer(payload[: len(payload) // 2 * 2], "<i2")
        got = out[out["id"] == rid].sort_values("window_id")
        if len(samples) == 0:
            assert len(got) == 0
            continue
        want_n = [len(samples[i:i + 64]) for i in range(0, len(samples), 64)]
        want_sum = [int(np.abs(samples[i:i + 64].astype(np.int64)).sum())
                    for i in range(0, len(samples), 64)]
        want_max = [int(np.abs(samples[i:i + 64].astype(np.int64)).max())
                    for i in range(0, len(samples), 64)]
        assert list(got["n_samples"]) == want_n
        assert list(got["sum_abs"]) == want_sum
        assert list(got["max_abs"]) == want_max
    # zero-row filler block → typed empty frame
    empty = AudioFrameStage()(df.iloc[0:0])
    assert list(empty.columns) == list(AudioFrameStage.OUT)
