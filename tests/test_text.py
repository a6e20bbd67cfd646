"""Golden tests for the curation-signal text operators (gopher gates,
repetition, PII redaction) on crafted documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timebox_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], schema="doc_id long, text string"
    )


def test_redact_golden(spark):
    df = _docs(
        spark,
        [
            "contact me at jane.doe+x@example.co.uk or on +1 555-123 4567 now",
            "see https://example.com/a?b=c#d and http://x.io",
            "no pii here",
        ],
    )
    rows = df.select(text.redact().alias("r")).orderBy("doc_id").collect()
    assert rows[0]["r"] == "contact me at <EMAIL> or on <PHONE> now"
    assert rows[1]["r"] == "see <URL> and <URL>"
    assert rows[2]["r"] == "no pii here"


def test_dup_2gram_fraction_golden(spark):
    df = _docs(
        spark,
        [
            "a b a b a b",      # 2-grams: ab ba ab ba ab -> 5 grams, 2 distinct
            "all words differ here",
            "one",              # <2 tokens -> 0
            "",
        ],
    )
    rows = (
        df.select(F.round(text.dup_2gram_fraction() * 1e6).alias("q"))
        .orderBy("doc_id")
        .collect()
    )
    assert rows[0]["q"] == 600000  # 3 dups / 5 grams
    assert rows[1]["q"] == 0
    assert rows[2]["q"] == 0
    assert rows[3]["q"] == 0


def test_gopher_pass_gates(spark):
    ok = "the quick brown fox jumps over a lazy dog and it runs on"
    too_short = "the dog"
    repetitive = "the " + "spam spam " * 30
    df = _docs(spark, [ok, too_short, repetitive])
    rows = df.select(text.gopher_pass().alias("g")).orderBy("doc_id").collect()
    assert [r["g"] for r in rows] == [1, 0, 0]


def test_mean_word_length_empty_doc(spark):
    df = _docs(spark, ["abc de", ""])
    rows = df.select(text.mean_word_length().alias("m")).orderBy("doc_id").collect()
    assert rows[0]["m"] == pytest.approx(2.5)
    assert rows[1]["m"] == 0.0
