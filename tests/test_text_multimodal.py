"""Text-analysis functions and multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from cloud_crawler_spark.functions import multimodal as MM
from cloud_crawler_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and it was good", "en"),
        (1, "der hund und die katze sind nicht da, ich bin ein tier", "de"),
        (2, "le chat et la souris sont dans les champs", "fr"),
        (3, "el perro y la casa de los gatos en una calle", "es"),
        (4, "zzzz qqqq wwww", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_id(spark, docs):
    out = dict(
        docs.select("lang", TX.lang_id(F.col("text")).alias("p")).collect()
    )
    assert out["en"] == "en"
    assert out["de"] == "de"
    assert out["fr"] == "fr"
    assert out["es"] == "es"
    assert out["und"] == "und"


def test_token_counts(spark, docs):
    row = docs.where("doc_id = 0").select(
        TX.token_count(F.col("text")).alias("n"),
        TX.bpe_token_count(F.col("text")).alias("b"),
    ).first()
    assert row["n"] == 10
    assert row["b"] == 10  # plain words; punctuation would add tokens


def test_bpe_tokens_split_punct_and_numbers(spark):
    df = spark.createDataFrame([("ab12,cd!",)], "text string")
    n = df.select(TX.bpe_token_count(F.col("text")).alias("n")).first()["n"]
    assert n == 5  # ab | 12 | , | cd | !


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",)], "text string"
    )
    fps = [r[0] for r in df.select(TX.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 16


def test_rolling_hash(spark):
    from cloud_crawler_spark.functions.text import rolling_hash_py

    a = rolling_hash_py("abcdefghijklmnopqr", window=16)
    b = rolling_hash_py("XYZabcdefghijklmnopqr", window=16)
    # shared 16-char windows produce shared hashes (content-defined)
    assert set(a) & set(b)
    df = spark.createDataFrame([("abcdefghijklmnopqr",)], "text string")
    got = df.select(TX.rolling_hash_udf(F.col("text")).alias("h")).first()["h"]
    assert got == a


def test_quality_features(spark):
    df = spark.createDataFrame([("Hi there. All good!",)], "text string")
    row = df.select(*TX.quality_features(F.col("text"))).first()
    assert row["n_chars_meas"] == 19
    assert row["n_tokens"] == 4
    assert row["n_punct"] == 2


# ---------------------------------------------------------- multimodal


def test_multimodal_features_deterministic(spark):
    media = MM.synth_media(spark, 24)
    out = MM.extract_features(media, decode_stub=True, dim=8)
    rows = out.collect()
    assert len(rows) == 24
    by_id = {r["media_id"]: r for r in rows}
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: second run identical
    rows2 = MM.extract_features(media, decode_stub=True, dim=8).collect()
    assert {r["media_id"]: r["digest"] for r in rows2} == {
        r["media_id"]: r["digest"] for r in rows
    }
    assert by_id[0]["n_bytes"] > 0
    # feature_csv is the sortable permille form of the float feature
    for r in rows:
        pm = [int(x) for x in r["feature_csv"].split(",")]
        assert [round(f * 1000) for f in r["feature"]] == pm


def test_multimodal_stub_gate(spark):
    media = MM.synth_media(spark, 3)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        MM.extract_features(media, decode_stub=False).collect()


def test_frame_sampling_plumbing(spark):
    media = MM.synth_media(spark, 30)
    frames = MM.sample_frames(media, every_n_bytes=16, max_frames=3)
    rows = frames.collect()
    assert rows, "video rows must produce frames"
    vids = {r["media_id"] for r in rows}
    kinds = dict(media.select("media_id", "kind").collect())
    assert all(kinds[m] == "video" for m in vids)
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in per.values())
