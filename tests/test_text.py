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


def test_redact_pii_patterns(spark):
    from worlddatapipeline_spark.operators.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@corp.example.org end",),
            ("server at 192.168.1.200 port 80",),
            ("call +86-555-0199 now",),
            ("clean text, no pii here. version 1.2 x@y",),
        ],
        "t string",
    )
    hits = pii_counts(F.col("t"))
    rows = df.select(
        redact_pii(F.col("t")).alias("r"),
        *[c.alias(k) for k, c in hits.items()],
    ).collect()
    assert rows[0]["r"] == "mail <EMAIL> end"
    assert rows[0]["email_hits"] == 1
    assert rows[1]["r"] == "server at <IP> port 80"
    assert rows[1]["ip_hits"] == 1
    assert rows[2]["r"] == "call <PHONE> now"
    assert rows[2]["phone_hits"] == 1
    # no false positives: bare version numbers / malformed emails untouched
    assert rows[3]["r"] == rows[3]["r"]
    assert rows[3]["email_hits"] == 0 and rows[3]["ip_hits"] == 0 and rows[3]["phone_hits"] == 0


def test_repetition_stats(spark):
    from worlddatapipeline_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "buy now " * 20),               # one bigram dominates -> drop
            (2, "the quick brown fox jumps over the lazy sleeping dog"),
            (3, "word"),                         # 1-word edge: no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["top_bigram"] == "buy now"
    assert rows[1]["top_bigram_share"] > 0.2 and not rows[1]["keep_doc"]
    assert rows[2]["distinct_word_frac"] > 0.8 and rows[2]["keep_doc"]
    assert rows[3]["total_words"] == 1
    assert rows[3]["top_bigram"] == "" and rows[3]["top_bigram_count"] == 0
    assert rows[3]["top_bigram_share"] == 0.0


def test_gopher_quality_flags_hand_values(spark):
    from worlddatapipeline_spark.operators.text import gopher_quality_flags

    docs = spark.createDataFrame(
        [
            # 4 sentences, one duplicated, one bullet, one ellipsis-ended
            (1, "the cat sat here. the cat sat here. - bullet item. trailing off..."),
            # repetitive junk: words without letters
            (2, "123 456 789 000"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == 0.25          # 1 duplicate of 4
    assert r1["bullet_ratio"] == 0.25
    assert r1["ellipsis_ratio"] == 0.25
    r2 = out[2]
    assert r2["alpha_word_frac"] == 0.0
    assert r2["mean_word_len"] == 3.0
    assert not r2["keep_doc"]                   # fails alpha-word rule


def test_unigram_lm_scores_hand_values(spark):
    import math

    from worlddatapipeline_spark.operators.text import unigram_lm_scores

    # Corpus: 4 tokens total — "a" x3, "b" x1.  p(a)=3/4, p(b)=1/4.
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in unigram_lm_scores(docs).collect()}
    # doc 1: 3 tokens of -log2(3/4); doc 2: one token of -log2(1/4) = 2.
    assert out[1]["n_tokens"] == 3
    assert out[1]["bits_per_token"] == round(-math.log2(3 / 4), 6)
    assert out[2]["n_tokens"] == 1
    assert out[2]["bits_per_token"] == 2.0


def test_dsir_logweights_direction(spark):
    from pyspark.sql import functions as F

    from worlddatapipeline_spark.operators.text import dsir_logweights

    # Target = docs 1-2 (English-ish vocabulary); raw adds junk docs that
    # share no tokens with the target.  A doc made of target-only tokens
    # must weigh strictly more than a doc of junk-only tokens.
    docs = spark.createDataFrame(
        [
            (1, "the cat sat", 1),
            (2, "the dog ran", 1),
            (3, "zzz qqq xxx", 0),
            (4, "qqq zzz vvv", 0),
        ],
        "doc_id long, text string, is_en int",
    )
    out = {
        r["id"]: r["log2_weight"]
        for r in dsir_logweights(docs, F.col("is_en") == 1).collect()
    }
    assert out[1] > 0 > out[3]
    assert out[2] > out[4]


def test_dsir_logweights_bucket_count_independence(spark):
    from pyspark.sql import functions as F

    from worlddatapipeline_spark.operators.text import dsir_logweights

    # With every doc in the target, target == raw, so every smoothed
    # bucket ratio is log2(1) = 0 regardless of bucket count.
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    for nb in (16, 256):
        rows = dsir_logweights(docs, F.lit(True), n_buckets=nb).collect()
        assert all(r["log2_weight"] == 0.0 for r in rows)
