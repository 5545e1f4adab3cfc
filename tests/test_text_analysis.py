"""Text-analysis function tests (token counting, quality, lang-id, fingerprint)."""
import hashlib
import re

import pytest
from pyspark.sql import functions as F

from dlp_dataflow_deidentification_spark.functions import text as T


def vals(spark, rows, expr_fn):
    df = spark.createDataFrame([(r,) for r in rows], "v string")
    return [r[0] for r in df.select(expr_fn(F.col("v")).alias("o")).collect()]


def test_token_count(spark):
    assert vals(spark, ["a b  c", "", "  ", "one"], T.token_count) == [3, 0, 0, 1]


def test_bpe_ish_token_count(spark):
    # "hello, world42" → hello , world 4 2
    assert vals(spark, ["hello, world42"], T.bpe_ish_token_count) == [5]


def test_punct_ratio(spark):
    out = vals(spark, ["abc!", "....", "abcd", ""], T.punct_ratio)
    assert out == [0.25, 1.0, 0.0, 0.0]


def test_quality_score_monotone_band(spark):
    rich = "the quick brown fox and the lazy dog went to the market for a while " * 5
    junk = "!!! ??? ### $$$ %%%"
    hi, lo = vals(spark, [rich, junk], T.quality_score)
    assert 0 <= lo < hi <= 1.0


def test_lang_id(spark):
    out = vals(
        spark,
        [
            "the cat is in the house and it is warm",
            "der hund ist nicht auf der couch und das ist gut",
            "el gato es un animal y la casa es grande",
            "zzz qqq xxx",
        ],
        T.lang_id,
    )
    assert out == ["en", "de", "es", "und"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a, b, c = vals(spark, ["Hello   World", "hello world", "hello worlds"], T.fingerprint)
    assert a == b != c
    assert a == hashlib.md5(b"hello world").hexdigest()


def test_all_native_plans(spark):
    df = spark.createDataFrame([("x",)], "v string").select(
        T.token_count(F.col("v")),
        T.quality_score(F.col("v")),
        T.lang_id(F.col("v")),
        T.fingerprint(F.col("v")),
    )
    assert "Python" not in df._jdf.queryExecution().executedPlan().toString()
