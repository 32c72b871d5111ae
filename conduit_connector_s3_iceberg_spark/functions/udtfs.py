"""Python UDTF surface (SURVEY.md §2C 'UDF surface' row).

Table functions for set-returning transforms that SQL callers want in a
``LATERAL`` position. These are Python-side row expansion — NOT the hot
path at 100 TB (the dedup pipeline builds its shingles with JVM
``explode``/``array_distinct`` expressions, ``operators/dedup.py``); a UDTF
is the ergonomic surface for ad-hoc SQL exploration of the same logic, with
``useArrow`` batching to keep the interchange columnar.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string", useArrow=True)
class WordNGrams:
    """Word n-grams of a text: ``SELECT * FROM word_ngrams(text, 3)``."""

    def eval(self, text: str, n: int):
        if not text or not n or n <= 0:
            return
        words = text.split()
        for i in range(len(words) - n + 1):
            yield i, " ".join(words[i : i + n])


@udtf(returnType="field string, value string", useArrow=True)
class FlattenJson:
    """Top-level (field, value-as-text) pairs of a JSON object — the UDTF
    twin of the key-decode rules in :mod:`..records` (scalars kept, null
    dropped, nested values rendered as JSON text rather than rejected,
    since exploration shouldn't throw)."""

    def eval(self, raw: str):
        import json

        if not raw:
            return
        try:
            obj = json.loads(raw)
        except json.JSONDecodeError:
            return
        if not isinstance(obj, dict):
            return
        for k, v in obj.items():
            if v is None:
                continue
            yield k, v if isinstance(v, str) else json.dumps(v)


def register_udtfs(spark: SparkSession) -> None:
    """Expose the UDTFs to SQL: ``word_ngrams``, ``flatten_json``."""
    spark.udtf.register("word_ngrams", WordNGrams)
    spark.udtf.register("flatten_json", FlattenJson)
