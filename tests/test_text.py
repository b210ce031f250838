"""Text analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.operators import text


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], ["t"]).select(expr(F.col("t")).alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a b  c", text.token_count) == 3
    assert _one(spark, "", text.token_count) == 0
    assert _one(spark, "   ", text.token_count) == 0
    assert _one(spark, "one", text.token_count) == 1


def test_punct_ratio(spark):
    assert _one(spark, "ab,.", text.punct_ratio) == pytest.approx(0.5)
    assert _one(spark, "", text.punct_ratio) == 0.0


def test_uppercase_ratio(spark):
    assert _one(spark, "AAbb", text.uppercase_ratio) == pytest.approx(0.5)


def test_quality_bounds(spark):
    df = spark.createDataFrame(
        [("",), ("hi",), ("THE QUICK!!! ???",), (" ".join(["word"] * 30),)], ["t"]
    )
    out = df.select(text.quality_score(F.col("t")).alias("q")).collect()
    for r in out:
        assert 0.0 <= r["q"] <= 1.0
    assert out[3]["q"] == 1.0  # long clean text maxes out


def test_detect_language(spark):
    assert _one(spark, "the cat and the dog of the house", text.detect_language) == "en"
    assert _one(spark, "der hund und die katze ist hier", text.detect_language) == "de"
    assert _one(spark, "xyzzy qwerty", text.detect_language) == "und"


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", text.fingerprint)
    b = _one(spark, "hello world", text.fingerprint)
    c = _one(spark, "hello worlds", text.fingerprint)
    assert a == b and a != c


def test_profile_schema(spark):
    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    out = text.profile(df)
    assert set(out.columns) == {
        "doc_id", "n_chars_measured", "n_tokens", "n_word_tokens",
        "punct_ratio", "upper_ratio", "mean_word_len", "quality",
        "lang_detected", "fingerprint",
    }
    assert out.count() == 1
