"""Cross-engine bit-exact aggregation helpers for the oracle-checked suite.

Double ``SUM`` is order-dependent (Spark shuffles partials, DuckDB scans
sequentially), and DuckDB's int128-decimal→double cast is not correctly
rounded at high scale. The suite therefore follows three rules, verified
empirically against DuckDB 1.0 (see tools/check_correctness.py):

1. **Exact ingestion**: every measure column in the warehouse has ≤2-decimal
   content, so ``CAST(x AS DECIMAL(18,2))`` is lossless in both engines.
2. **Exact accumulation**: decimal arithmetic (sum, product of decimals) is
   exact and associative → order-independent. Products widen the scale
   deterministically: price(2dp)×factor(2dp) → 4dp, ×factor(2dp) → 6dp.
3. **Exact emission**: before the final cast to double, reduce the sum to
   its true content scale (2/4/6 dp). The scaled integer then stays below
   2^53 (scale 4 → |v| < 9e11, scale 6 → |v| < 9e9), where BOTH engines'
   decimal→double casts are exactly the correctly-rounded IEEE value →
   bit-identical doubles. (DuckDB CAST truncates on scale reduction while
   Spark rounds HALF_UP — irrelevant here because content-scale reduction
   drops only zeros; where real rounding is intended use ``round()``, which
   is half-away-from-zero in both engines for positives.)

Averages: ``CAST(exact_dec_sum AS DOUBLE) / COUNT(*)`` — one IEEE double
division on identical inputs in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"   # lossless measure ingestion type
DEC_S = "decimal(8,2)"  # small factors like (1 - discount)


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Bit-exact sum of a 2dp-content double measure, emitted as double."""
    return F.sum(dec(col)).cast("decimal(38,2)").cast("double").alias(alias)


def dsum_prod(prod: Column, alias: str, scale: int) -> Column:
    """Bit-exact sum of a decimal product with known content ``scale``."""
    return F.sum(prod).cast(f"decimal(38,{scale})").cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal numerator, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(dec(c)).cast("decimal(38,2)").cast("double") / F.count(F.lit(1))
    ).alias(alias)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) — exact decimal, content 4dp."""
    return dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(DEC_S)


def charge() -> Column:
    """l_extendedprice*(1-l_discount)*(1+l_tax) — exact decimal, 6dp."""
    return disc_price() * (F.lit(1) + F.col("l_tax")).cast(DEC_S)


# --- SQL oracle fragments mirroring the same discipline -------------------
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))"
)
SQL_CHARGE = SQL_DISC_PRICE + " * CAST(1 + l_tax AS DECIMAL(8,2))"


def sql_dsum(inner: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({inner} AS DECIMAL(18,2))) AS DECIMAL(38,2)) "
        f"AS DOUBLE) AS {alias}"
    )


def sql_dsum_expr(dec_expr: str, alias: str, scale: int = 4) -> str:
    """Sum of an already-decimal SQL product with content ``scale``."""
    return (
        f"CAST(CAST(SUM({dec_expr}) AS DECIMAL(38,{scale})) AS DOUBLE) AS {alias}"
    )


def sql_davg(inner: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({inner} AS DECIMAL(18,2))) AS DECIMAL(38,2)) "
        f"AS DOUBLE) / COUNT(*) AS {alias}"
    )
