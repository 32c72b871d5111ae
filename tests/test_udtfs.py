"""UDTF surface tests: registration + lateral-join usage from SQL."""

from __future__ import annotations

from conduit_connector_s3_iceberg_spark.functions.udtfs import register_udtfs


def test_word_ngrams_lateral(spark):
    register_udtfs(spark)
    spark.sql(
        "SELECT 'the quick brown fox' AS text"
    ).createOrReplaceTempView("t_ngram_in")
    rows = spark.sql(
        """
        SELECT t.text, g.pos, g.ngram
        FROM t_ngram_in t, LATERAL word_ngrams(t.text, 2) g
        ORDER BY g.pos
        """
    ).collect()
    assert [(r["pos"], r["ngram"]) for r in rows] == [
        (0, "the quick"),
        (1, "quick brown"),
        (2, "brown fox"),
    ]


def test_flatten_json(spark):
    register_udtfs(spark)
    rows = spark.sql(
        """SELECT * FROM flatten_json('{"a": 1, "b": "x", "c": null, "d": [1,2]}')"""
    ).collect()
    got = {r["field"]: r["value"] for r in rows}
    assert got == {"a": "1", "b": "x", "d": "[1, 2]"}
