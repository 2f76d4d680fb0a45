"""Order-insensitive exact aggregation helpers.

IEEE-754 double addition is not associative, so a distributed SUM over
doubles returns different low bits depending on partitioning — Spark at 32
shuffle partitions vs DuckDB's morsel scheduler will disagree. Every
hash-checked aggregate therefore sums in DECIMAL (exact, associative) and
casts the final value to double once; both engines then produce identical
bits for identical inputs.

The same trick is what you want at 100 TB anyway: money-typed decimal
aggregation avoids silent drift across re-partitions/retries, and Spark's
decimal sum is codegen'd JVM-side (no UDF, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

#: Money-ish columns (o_totalprice, l_extendedprice ≤ ~1e6, 2 decimals).
MONEY = DecimalType(12, 2)
#: Rates/discounts in [0, 1], 2 decimals.
RATE = DecimalType(4, 2)
#: Quantities (2 decimals in the generator).
QTY = DecimalType(12, 2)


def dsum(c: Column, dtype: DecimalType = MONEY) -> Column:
    """Exact decimal SUM surfaced as double.

    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    return F.sum(c.cast(dtype)).cast("double")


def davg(c: Column, dtype: DecimalType = MONEY) -> Column:
    """Exact-sum average: decimal sum → double, divided by COUNT(x).

    One double division on identical operands is bit-identical across
    engines. DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)
    / COUNT(x)``.
    """
    return F.sum(c.cast(dtype)).cast("double") / F.count(c)
