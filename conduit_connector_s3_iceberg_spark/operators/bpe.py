"""Byte-pair-encoding vocabulary training over the corpus.

The production BPE shape (Sennrich et al., ACL 2016): training never
iterates over the corpus — it iterates over the WORD-FREQUENCY TABLE,
which one map-side-combined groupBy produces from the corpus and which is
orders of magnitude smaller (vocabulary-sized). Per merge round:

* adjacent-symbol-pair counts: one explode over each word's symbol array
  weighted by word count, one hash agg — all on the word table;
* the winning pair: a 1-row driver fetch (same bounded-driver-traffic
  discipline as the k-means/CC loops — only the argmax crosses, never
  data);
* merge application: a pure fold expression (``aggregate``) over each
  word's symbol array — greedy left-to-right non-overlapping, the
  standard BPE merge — so the update is a narrow map, no UDF, no shuffle.

``text_bpe_pair_stats`` registers the oracle-checkable first round (pair
statistics are plain SQL); ``bpe_fit`` runs the full loop and is checked
against an independent pure-Python reference in tests.

Reference scope note: the reference connector has no text surface; this
is part of the north-star LLM-pipeline extensions (BASELINE.json
``north_star``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

TOP_PAIRS = 20  # rows reported by the registered pair-stats query


@query(
    "text_bpe_pair_stats",
    oracle=f"""
    WITH wf AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(string_split(trim(text), ' ')) AS token
        FROM documents
      )
      GROUP BY token
    ), pairs AS (
      SELECT substr(token, i, 2) AS pair, cnt
      FROM (
        SELECT token, cnt,
               unnest(generate_series(1, length(token) - 1)) AS i
        FROM wf WHERE length(token) >= 2
      )
    ), agg AS (
      SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq
      FROM pairs GROUP BY pair
    )
    SELECT pair, freq, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY freq DESC, pair
      ) AS INTEGER) AS rank
      FROM agg
    ) WHERE rank <= {TOP_PAIRS}
    """,
    doc=f"BPE round-1 statistics: adjacent character-pair frequencies "
        "weighted by word count, over the word-frequency table (ONE corpus "
        f"pass builds it; the pair math never re-reads the corpus) — top "
        f"{TOP_PAIRS} merge candidates. The oracle-checkable face of the "
        "bpe_fit training loop.",
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pairs = wf.filter(F.length("token") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    agg = pairs.groupBy("pair").agg(F.sum("cnt").cast("long").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_PAIRS)
        .select("pair", "freq", "rank")
    )


def _merge_expr(a: str, b: str) -> str:
    """Greedy left-to-right merge of adjacent (a, b) -> a||b as a fold
    over the symbol array. Standard BPE application: non-overlapping,
    restarting after each merge ("aaa" with pair (a,a) -> [aa, a])."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "\\'") + "'"

    return (
        "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {lit(a)}"
        f" AND x = {lit(b)}"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array({lit(a + b)}))"
        " ELSE concat(acc, array(x)) END)"
    )


def words_to_symbols(wf: DataFrame) -> DataFrame:
    """(token, cnt) -> (token, cnt, syms array<string>) with syms = the
    token's characters — BPE's initial symbolization."""
    return wf.withColumn(
        "syms",
        F.expr(
            "transform(sequence(1, length(token)), i -> substring(token, i, 1))"
        ),
    )


def bpe_fit(
    wf: DataFrame, n_merges: int, checkpoint_every: int = 4
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (token, cnt) word-frequency
    frame. Returns (ordered merge list, final symbolized word frame).

    The loop runs entirely on the word table; per round one explode + one
    hash agg + a 1-row argmax fetch + one narrow merge map. Ties break by
    lexicographic pair order (deterministic across partitionings).
    ``localCheckpoint`` every ``checkpoint_every`` rounds cuts the
    accumulated fold-expression lineage. Stops early when no adjacent
    pair remains."""
    symbolized = words_to_symbols(wf).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        best = (
            # guard: sequence(1, 0) DESCENDS in Spark, so fully-merged
            # single-symbol words must not reach the pair transform
            symbolized.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS a,"
                        " element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.col("freq").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        symbolized = symbolized.withColumn("syms", F.expr(_merge_expr(a, b)))
        if (r + 1) % checkpoint_every == 0:
            symbolized = symbolized.localCheckpoint(eager=False)
    return merges, symbolized


def bpe_encode(tokens: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges in order to a (token, ...) frame, adding a
    ``syms`` column — the narrow-map inference path (broadcast-free: the
    merge list is baked into the expression tree as constants)."""
    out = words_to_symbols(tokens)
    for a, b in merges:
        out = out.withColumn("syms", F.expr(_merge_expr(a, b)))
    return out
