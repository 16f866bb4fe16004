"""Round-5 fixes: hive sink hardening (collision-free partition names,
empty-input tolerance, stale-partition pruning) and the de-drivered
streaming replay harnesses."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest


def test_hive_partition_names_collision_free(ray_session, tmp_path):
    """Values differing only in non-alnum chars ('en US' vs 'en_US' vs
    'en/US') must land in DISTINCT partition dirs — a lossy sanitizer
    would let one silently overwrite the other (ADVICE r4)."""
    import ray.data as rd

    from transmog_ray.state.checkpoint import write_hive_partitioned

    df = pd.DataFrame({
        "doc_id": range(6),
        "lang": ["en US", "en US", "en_US", "en_US", "en/US", "en/US"],
    })
    out = str(tmp_path / "hive")
    meta = write_hive_partitioned(rd.from_pandas(df), out, "lang", "fp1",
                                  order_by=["doc_id"])
    assert meta["num_partitions"] == 3
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(dirs) == 3
    got = pd.concat(
        [pd.read_parquet(os.path.join(out, d, "data.parquet")) for d in dirs],
        ignore_index=True,
    )
    assert sorted(got["doc_id"]) == list(range(6))
    # every distinct value round-trips through its own manifest
    vals = set()
    for d in dirs:
        with open(os.path.join(out, d, "manifest.json")) as f:
            m = json.load(f)
        vals.add(m["partition_value"])
        assert m["rows_out"] == 2
    assert vals == {"en US", "en_US", "en/US"}


def test_hive_empty_input_writes_empty_run(ray_session, tmp_path):
    """A fully-empty dataset (whose to_pandas loses its columns) must
    produce an empty run, not a KeyError (ADVICE r4)."""
    import ray.data as rd

    from transmog_ray.state.checkpoint import write_hive_partitioned

    empty = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "lang": pd.Series([], dtype=object)})
    )
    out = str(tmp_path / "hive-empty")
    meta = write_hive_partitioned(empty, out, "lang", "fp1")
    assert meta["num_partitions"] == 0
    assert meta["rows_out"] == 0
    assert os.path.exists(os.path.join(out, "_run.json"))


def test_hive_stale_partitions_pruned(ray_session, tmp_path):
    """Partition dirs for values absent from the current data are
    removed, so resume/load_metrics never surface stale output
    (ADVICE r4)."""
    import ray.data as rd

    from transmog_ray.state.checkpoint import (load_metrics,
                                               write_hive_partitioned)

    out = str(tmp_path / "hive")
    df1 = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                        "lang": ["en", "en", "de", "fr"]})
    write_hive_partitioned(rd.from_pandas(df1), out, "lang", "fp1",
                           order_by=["doc_id"])
    assert os.path.isdir(os.path.join(out, "lang=fr"))

    # second run: 'fr' vanished from the input (and the fingerprint
    # changed, as input lineage in a fingerprint would make it)
    df2 = pd.DataFrame({"doc_id": [0, 1, 2], "lang": ["en", "en", "de"]})
    write_hive_partitioned(rd.from_pandas(df2), out, "lang", "fp2",
                           order_by=["doc_id"])
    assert not os.path.exists(os.path.join(out, "lang=fr"))
    m = load_metrics(out)
    assert set(m["partition_value"]) == {"en", "de"}
    assert (m["run_fingerprint"] == "fp2").all()


def test_streaming_replay_matches_batch(ray_session):
    """The block-replay harnesses (no driver-side full-table pandas)
    still equal their batch-path oracles."""
    import duckdb

    from transmog_ray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    for name in ("sessionize_streaming", "asof_purchase_streaming"):
        got = QUERIES[name](sf)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        want = con.execute(ORACLE_SQL[name]).df()
        got = got[sorted(got.columns)].sort_values(
            sorted(got.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(
            sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    con.close()


# ------------------------------------------------- pure-Python codecs


def test_bmp_roundtrip_and_decode():
    from transmog_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = __import__("numpy").random.default_rng(3)
    for h, w in [(1, 1), (3, 5), (7, 4), (16, 16)]:  # odd widths hit padding
        gray = rng.integers(0, 256, size=(h, w)).astype("uint8")
        got = decode_bmp(encode_bmp(gray))
        assert (got == gray).all(), (h, w)
    with pytest.raises(ValueError):
        decode_bmp(b"nope" * 20)


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from transmog_ray.stages.multimodal import decode_ppm, encode_ppm

    gray = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert (decode_ppm(encode_ppm(gray)) == gray).all()
    # header with a comment line still parses
    body = np.repeat(gray[:, :, None], 3, axis=2).tobytes()
    with_comment = b"P6\n# fixture\n6 4\n255\n" + body
    assert (decode_ppm(with_comment) == gray).all()


def test_wav_parse_roundtrip_and_channel0():
    import numpy as np

    from transmog_ray.stages.multimodal import encode_wav, parse_wav

    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    got, rate, ch = parse_wav(encode_wav(s, sample_rate=8000))
    assert rate == 8000 and ch == 1
    assert (got == s).all()
    # stereo: interleave L/R, parse returns channel 0
    inter = np.empty(12, dtype=np.int16)
    inter[0::2] = s
    inter[1::2] = -1
    got2, _, ch2 = parse_wav(encode_wav(inter, channels=2))
    assert ch2 == 2 and (got2 == s).all()


def test_image_stage_real_bmp_decode():
    """A BMP payload goes through the REAL decode (features over decoded
    pixels, not encoded bytes) — and strict mode succeeds on it."""
    import numpy as np

    from transmog_ray.stages.multimodal import (ImageDecodeStage,
                                                byte_histogram_features,
                                                encode_bmp)

    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype("uint8")
    df = pd.DataFrame({
        "id": [0, 1],
        "media_type": ["image", "image"],
        "payload": [encode_bmp(gray), b"\x00\x01\x02\x03" * 40],
        "meta": ["{}", "{}"],
    })
    stage = ImageDecodeStage(strict=False)
    if stage._pil is not None:
        pytest.skip("PIL present — pure-Python path not exercised")
    out = stage(df)
    assert list(out["decoder"]) == ["bmp-pure", "byte-histogram-stub"]
    want = byte_histogram_features([gray.tobytes()])[0]
    assert np.allclose(np.asarray(out["features"].iloc[0]), want)
    # strict succeeds on the decodable payload, raises on the raw one
    assert ImageDecodeStage(strict=True)(df.iloc[[0]])["decoder"].iloc[0] == \
        "bmp-pure"
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(df.iloc[[1]])


def test_audio_stage_wav_equals_raw_pcm():
    """WAV-wrapped samples produce the same windowed energy rows as the
    identical raw-PCM payload."""
    import numpy as np

    from transmog_ray.stages.multimodal import AudioFrameStage, encode_wav

    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, size=700).astype(np.int16)
    df = pd.DataFrame({
        "id": [0, 1],
        "media_type": ["audio", "audio"],
        "payload": [encode_wav(s, sample_rate=16000), s.tobytes()],
        "meta": ["{}", "{}"],
    })
    out = AudioFrameStage(window=64)(df)
    a = out[out["id"] == 0].drop(columns=["id"]).reset_index(drop=True)
    b = out[out["id"] == 1].drop(columns=["id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------- incremental MinHash


def _mk_docs(n=120, seed=3):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_neardup import make_docs

    return make_docs(n, seed)


def test_minhash_ingest_matches_batch(ray_session, tmp_path):
    """Three sequential shard ingests reproduce the one-shot batch
    clustering exactly (the cumulative edge set is the same)."""
    import ray.data as rd

    from transmog_ray.functions.neardup import (minhash_clusters,
                                                minhash_ingest)

    docs = _mk_docs()
    kw = dict(n_perm=32, n_bands=8, jaccard_threshold=0.8, num_buckets=8)
    want = (minhash_clusters(rd.from_pandas(docs), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))

    cache = str(tmp_path / "mh")
    # split so dup families SPAN shards (consecutive ids split apart)
    shards = [docs.iloc[i::3].reset_index(drop=True) for i in range(3)]
    seen = []
    got = None
    for sh in shards:
        seen.append(sh)
        corpus = pd.concat(seen, ignore_index=True)
        got = minhash_ingest(cache, rd.from_pandas(sh),
                             rd.from_pandas(corpus), **kw)
    got = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_ingest_single_shot_matches_batch(ray_session, tmp_path):
    """First ingest over the whole corpus == the batch path."""
    import ray.data as rd

    from transmog_ray.functions.neardup import (minhash_clusters,
                                                minhash_ingest)

    docs = _mk_docs(60, seed=9)
    kw = dict(n_perm=32, n_bands=8, jaccard_threshold=0.8, num_buckets=8)
    want = (minhash_clusters(rd.from_pandas(docs), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = (minhash_ingest(str(tmp_path / "mh"), rd.from_pandas(docs),
                          rd.from_pandas(docs), **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_ingest_param_change_rejected(ray_session, tmp_path):
    import ray.data as rd

    from transmog_ray.functions.neardup import minhash_ingest

    docs = _mk_docs(20, seed=1)
    cache = str(tmp_path / "mh")
    minhash_ingest(cache, rd.from_pandas(docs), rd.from_pandas(docs),
                   n_perm=32, n_bands=8, num_buckets=4)
    with pytest.raises(ValueError, match="different parameters"):
        minhash_ingest(cache, rd.from_pandas(docs), rd.from_pandas(docs),
                       n_perm=16, n_bands=8, num_buckets=4)


def test_minhash_retract_matches_batch_on_survivors(ray_session, tmp_path):
    """Ingest everything, retract a slice: the assignment must equal a
    fresh batch run over the surviving corpus — edge validity is
    pairwise, so retraction is a pure filter."""
    import ray.data as rd

    from transmog_ray.functions.neardup import (minhash_clusters,
                                                minhash_ingest,
                                                minhash_retract)

    docs = _mk_docs(90, seed=5)
    kw = dict(n_perm=32, n_bands=8, jaccard_threshold=0.8, num_buckets=8)
    forget = docs["doc_id"][docs["doc_id"] % 10 == 3]
    survivors = docs[~docs["doc_id"].isin(set(forget))].reset_index(
        drop=True)
    want = (minhash_clusters(rd.from_pandas(survivors), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))

    cache = str(tmp_path / "mh")
    minhash_ingest(cache, rd.from_pandas(docs), rd.from_pandas(docs),
                   **kw)
    got = (minhash_retract(cache, forget.tolist(),
                           rd.from_pandas(survivors), **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_retract_then_ingest_skips_tombstones(ray_session,
                                                      tmp_path):
    """Interleaving: ingest shard0, retract part of it, ingest shard1 —
    the final state equals a batch run over (corpus minus the
    retracted set); a tombstoned doc must never re-enter as a
    candidate partner."""
    import ray.data as rd

    from transmog_ray.functions.neardup import (minhash_clusters,
                                                minhash_ingest,
                                                minhash_retract)

    docs = _mk_docs(90, seed=7)
    kw = dict(n_perm=32, n_bands=8, jaccard_threshold=0.8, num_buckets=8)
    sh0 = docs.iloc[0::2].reset_index(drop=True)
    sh1 = docs.iloc[1::2].reset_index(drop=True)
    forget = sh0["doc_id"][sh0["doc_id"] % 6 == 0]
    sh0_left = sh0[~sh0["doc_id"].isin(set(forget))]
    survivors = pd.concat([sh0_left, sh1], ignore_index=True)
    want = (minhash_clusters(rd.from_pandas(survivors), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))

    cache = str(tmp_path / "mh")
    minhash_ingest(cache, rd.from_pandas(sh0), rd.from_pandas(sh0), **kw)
    minhash_retract(cache, forget.tolist(),
                    rd.from_pandas(sh0_left), **kw)
    got = (minhash_ingest(cache, rd.from_pandas(sh1),
                          rd.from_pandas(survivors), **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_retract_requires_cache_and_same_params(ray_session,
                                                        tmp_path):
    import ray.data as rd

    from transmog_ray.functions.neardup import (minhash_ingest,
                                                minhash_retract)

    docs = _mk_docs(20, seed=2)
    with pytest.raises(ValueError, match="existing ingest cache"):
        minhash_retract(str(tmp_path / "none"), [1],
                        rd.from_pandas(docs), n_perm=32, n_bands=8)
    cache = str(tmp_path / "mh")
    minhash_ingest(cache, rd.from_pandas(docs), rd.from_pandas(docs),
                   n_perm=32, n_bands=8, num_buckets=4)
    with pytest.raises(ValueError, match="different parameters"):
        minhash_retract(cache, [1], rd.from_pandas(docs),
                        n_perm=16, n_bands=8, num_buckets=4)
