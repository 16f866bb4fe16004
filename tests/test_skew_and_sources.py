"""Skew handling (salted == unsalted on hot-key data), hot-key detection,
and the Ray-native JSONL flatten path."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from transmog_ray.core.config import FlattenConfig
from transmog_ray.functions.relational import grouped_agg
from transmog_ray.functions.skew import detect_hot_keys, salted_grouped_agg
from transmog_ray.stages.flatten import flatten_json_file


@pytest.fixture()
def skewed_df():
    rng = np.random.default_rng(21)
    n = 20_000
    # one key owns ~50% of rows
    keys = np.where(rng.random(n) < 0.5, "hot", rng.choice([f"k{i}" for i in range(50)], n))
    return pd.DataFrame({"k": keys, "v": rng.normal(size=n), "w": rng.integers(0, 100, n)})


def canon(df):
    return df.sort_values("k").reset_index(drop=True)


def test_salted_equals_unsalted(ray_session, skewed_df):
    import ray.data as rd

    specs = {
        "sum_v": ("v", "sum"),
        "n": ("v", "count"),
        "min_w": ("w", "min"),
        "max_w": ("w", "max"),
        "mean_v": ("v", "mean"),
    }
    plain = canon(grouped_agg(rd.from_pandas(skewed_df), ["k"], specs).to_pandas())
    salted = canon(
        salted_grouped_agg(rd.from_pandas(skewed_df), ["k"], specs,
                           num_salts=8).to_pandas()
    )
    assert plain["n"].sum() == len(skewed_df)
    pd.testing.assert_series_equal(plain["n"], salted["n"])
    assert np.allclose(plain["sum_v"], salted["sum_v"])
    assert np.allclose(plain["mean_v"], salted["mean_v"])
    assert (plain["min_w"] == salted["min_w"]).all()
    assert (plain["max_w"] == salted["max_w"]).all()


def test_detect_hot_keys(ray_session, skewed_df):
    import ray.data as rd

    hot = detect_hot_keys(rd.from_pandas(skewed_df), "k",
                          sample_fraction=0.3, hot_share=0.1)
    assert list(hot["k"])[:1] == ["hot"]
    assert hot.iloc[0]["share"] > 0.3


def test_flatten_json_file(ray_session, tmp_path):
    import ray.data as rd

    path = tmp_path / "in.jsonl"
    with open(path, "w") as f:
        for i in range(200):
            f.write(json.dumps(
                {"id": i, "meta": {"v": i % 5}, "kids": [{"k": j} for j in range(i % 4)]}
            ) + "\n")
    out = flatten_json_file(
        str(path), str(tmp_path / "out"), entity="rec",
        config=FlattenConfig(id_generation="hash"), extract_time="T",
    )
    assert set(out) == {"rec", "rec_kids"}
    main = rd.read_parquet(out["rec"]).to_pandas()
    kids = rd.read_parquet(out["rec_kids"]).to_pandas()
    assert len(main) == 200
    assert len(kids) == sum(i % 4 for i in range(200))
    assert "meta_v" in main.columns
    # parent linkage intact
    assert set(kids["_parent_id"]) <= set(main["_id"])


def test_semi_anti_join(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import semi_join

    df = pd.DataFrame({"k": ["a", "b", "c", "a"], "v": [1, 2, 3, 4]})
    keys = pd.DataFrame({"k": ["a", "z"]})
    kept = semi_join(rd.from_pandas(df), keys, on="k").to_pandas()
    assert sorted(kept["v"]) == [1, 4]
    dropped = semi_join(rd.from_pandas(df), keys, on="k", anti=True).to_pandas()
    assert sorted(dropped["v"]) == [2, 3]
    # multi-column key
    keys2 = pd.DataFrame({"k": ["a"], "v": [4]})
    kept2 = semi_join(rd.from_pandas(df), keys2, on=["k", "v"]).to_pandas()
    assert list(kept2["v"]) == [4]


def test_bloom_prefilter(ray_session):
    import ray.data as rd

    from transmog_ray.functions.relational import BloomFilter, bloom_prefilter

    rng = np.random.default_rng(3)
    keys = pd.Series([f"k{i}" for i in range(1000)])
    member = keys.sample(200, random_state=1)
    bloom = BloomFilter(len(member), fp_rate=0.01)
    bloom.add(member)
    # zero false negatives
    assert bloom.contains(member).all()
    # false-positive rate bounded (generous 5x margin on 1% target)
    others = pd.Series([f"x{i}" for i in range(20_000)])
    fp = bloom.contains(others).mean()
    assert fp < 0.05, fp

    df = pd.DataFrame({"k": keys, "v": np.arange(1000)})
    out = bloom_prefilter(rd.from_pandas(df), member, on="k").to_pandas()
    assert set(member) <= set(out["k"])          # superset (no misses)
    assert len(out) <= len(member) + 0.05 * 1000  # few extras


def test_langid_latin_and_script_detection():
    import pandas as pd

    from transmog_ray.functions.text import LangId

    lid = LangId()
    df = pd.DataFrame({"text": [
        "the cat sat on the mat and it was happy",
        "der Hund ist nicht mit der Katze auf dem Sofa",
        "le chat est dans la maison pour les vacances",
        "el perro es una mascota por la casa para todos",
        "il gatto non sono nel giardino della casa",
        "o cachorro que está em um parque para brincar",
        "de hond is een dier dat op de bank zit",
        "这是一个中文句子用于测试语言识别",
        "これはにほんごのぶんしょうです",
        "это русское предложение для теста",
        "",
        None,
        "zzz qqq xxx",  # no profile hits
    ]})
    out = lid(df.copy())
    got = list(out["lang_guess"])
    assert got[:7] == ["en", "de", "fr", "es", "it", "pt", "nl"]
    assert got[7] == "zh" and got[8] == "ja" and got[9] == "ru"
    assert got[10] == "und" and got[11] == "und" and got[12] == "und"
    # single-text wrapper agrees with the batch kernel
    assert lid.guess("the cat and the dog") == "en"


def test_salted_agg_all_null_group_is_sql_null(ray_session):
    """VERDICT r2 item 4: an all-null (key, value) group must merge to SQL
    NULL (min_count=1 in the stage-2 salt merge), not pandas' 0.0."""
    import ray.data as rd

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 6,
        "v": [1.0, 2.0, None, 3.0, 4.0, 5.0] + [None] * 6,
    })
    out = (
        salted_grouped_agg(rd.from_pandas(df), ["k"],
                           {"s": ("v", "sum"), "n": ("v", "count"),
                            "m": ("v", "mean")},
                           num_salts=4, num_buckets=4)
        .to_pandas()
        .set_index("k")
    )
    assert out.loc["a", "s"] == 15.0 and out.loc["a", "n"] == 5
    assert pd.isna(out.loc["b", "s"])  # SQL SUM of all NULLs is NULL
    assert out.loc["b", "n"] == 0
    assert pd.isna(out.loc["b", "m"])


def test_assign_split_entity_coherent(ray_session):
    """Every row of one entity lands in the same split; percents must
    sum to 100; proportions are roughly honored."""
    import ray.data as rd

    from transmog_ray.functions.sampling import assign_split

    df = pd.DataFrame({
        "row": np.arange(5000),
        "user": np.repeat(np.arange(500), 10),
    })
    out = assign_split(
        rd.from_pandas(df).repartition(6), "user",
        {"train": 80, "valid": 10, "test": 10},
    ).to_pandas()
    per_user = out.groupby("user")["split"].nunique()
    assert (per_user == 1).all()  # no entity straddles splits
    frac = out[out["split"] == "train"].shape[0] / len(out)
    assert 0.7 < frac < 0.9
    with pytest.raises(ValueError, match="sum to 100"):
        assign_split(rd.from_pandas(df), "user", {"train": 90, "test": 5})


def test_weighted_sample_deterministic_and_monotone(ray_session):
    """Same rows survive across runs/partitionings; p=1 keeps all,
    p=0 keeps none; temperature flattens toward uniform."""
    import ray.data as rd

    from transmog_ray.functions.sampling import weighted_sample

    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                       "w": np.linspace(0, 1, 400)})
    a = weighted_sample(rd.from_pandas(df), "doc_id",
                        lambda d: d["w"]).to_pandas()
    b = weighted_sample(rd.from_pandas(df).repartition(7), "doc_id",
                        lambda d: d["w"]).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    ones = weighted_sample(rd.from_pandas(df), "doc_id",
                           lambda d: pd.Series(np.ones(len(d)))).to_pandas()
    assert len(ones) == len(df)
    zeros = weighted_sample(rd.from_pandas(df), "doc_id",
                            lambda d: pd.Series(np.zeros(len(d)))).to_pandas()
    assert len(zeros) == 0
    # high temperature pushes survival rate toward the p→1 uniform limit
    hot = weighted_sample(rd.from_pandas(df), "doc_id",
                          lambda d: d["w"], temperature=8.0).to_pandas()
    assert len(hot) > len(a)


def test_weighted_sample_rejects_bad_temperature(ray_session):
    import ray.data as rd

    from transmog_ray.functions.sampling import weighted_sample

    ds = rd.from_items([{"doc_id": 1}])
    for bad in (0.0, -1.0):
        with pytest.raises(ValueError, match="temperature"):
            weighted_sample(ds, "doc_id", lambda d: d["doc_id"],
                            temperature=bad)


def test_assign_folds_and_temporal_split(ray_session):
    """Entity-coherent folds (every row of a user in ONE fold); purged
    temporal split labels the embargo gap."""
    import ray.data as rd

    from transmog_ray.functions.sampling import assign_folds, temporal_split

    ev = pd.DataFrame({
        "user_id": np.repeat(np.arange(30, dtype=np.int64), 4),
        "ts": pd.Timestamp("2024-01-18") + pd.to_timedelta(
            np.tile(np.arange(4) * 86400, 30), unit="s"),
    })
    out = assign_folds(rd.from_pandas(ev), "user_id", k=3).to_pandas()
    per_user = out.groupby("user_id")["fold"].nunique()
    assert (per_user == 1).all()
    assert set(out["fold"]) <= {0, 1, 2}
    with pytest.raises(ValueError, match="k must be"):
        assign_folds(rd.from_pandas(ev), "user_id", k=1)

    ts = temporal_split(rd.from_pandas(ev), "ts", "2024-01-20",
                        embargo_seconds=86400).to_pandas()
    assert (ts.loc[ts["ts"] < pd.Timestamp("2024-01-19"), "split"]
            == "train").all()
    assert (ts.loc[ts["ts"] >= pd.Timestamp("2024-01-20"), "split"]
            == "test").all()
    gap = ts[(ts["ts"] >= pd.Timestamp("2024-01-19"))
             & (ts["ts"] < pd.Timestamp("2024-01-20"))]
    assert len(gap) and (gap["split"] == "embargo").all()


def test_plan_mixture_budget_and_saturation(ray_session):
    """Rates hit the weighted budget; an undersupplied source saturates
    at 1.0 and reports its shortfall; unknown sources raise."""
    import ray.data as rd

    from transmog_ray.functions.sampling import plan_mixture

    rows = (
        [{"source": "big", "tok": 100}] * 50      # 5000 available
        + [{"source": "small", "tok": 100}] * 2   # 200 available
    )
    plan = plan_mixture(rd.from_items(rows), "source", "tok",
                        target_tokens=2000,
                        weights={"big": 1.0, "small": 1.0})
    p = plan.set_index("source")
    # small wants 1000 but only has 200 → rate 1.0, planned 200
    assert p.loc["small", "rate"] == 1.0
    assert p.loc["small", "planned_tokens"] == 200.0
    assert p.loc["big", "rate"] == 1000 / 5000
    assert p.loc["big", "planned_tokens"] == 1000.0

    import pytest
    with pytest.raises(ValueError, match="no mixture weight"):
        plan_mixture(rd.from_items(rows), "source", "tok", 100,
                     weights={"big": 1.0})
