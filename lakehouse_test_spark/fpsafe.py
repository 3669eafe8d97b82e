"""Deterministic float aggregation for oracle comparison.

Summing doubles is order-sensitive at the ulp level; Spark's partial
aggregation order differs from DuckDB's sequential scan, so a rounded
sum can straddle a rounding boundary and flake (observed on TPC-H Q9:
4632866.365… rounding to .36 vs .37).

Fix: cast each term to DECIMAL(18,6) *before* aggregation. The
per-row doubles are bit-identical in both engines (same IEEE
expression tree), double→decimal rounding is value-deterministic, and
decimal addition is exact and associative — so the aggregate is
identical regardless of accumulation order. Ratios/averages then
divide as doubles (identical inputs → identical result).

Columns whose values are integral doubles (e.g. l_quantity) sum
exactly in any order and don't need this.

Caveat: apply ``dsum`` only to DOUBLE expressions. A FLOAT column
must be cast to double first — float→decimal casts disagree between
engines (~0.4% of values flip one quantum, because the float's
~1e-7 relative noise straddles the 1e-6 decimal grid and the
engines round the scaled product differently), while float→double
is exact and double→decimal agrees to ~1e-17 relative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(expr: Column) -> Column:
    """Order-insensitive sum of a double expression (decimal-cast)."""
    return F.sum(expr.cast(DEC))


def dround(expr: Column, scale: int) -> Column:
    """Round a decimal aggregate and surface it as DOUBLE."""
    return F.round(expr, scale).cast("double")


def ddiv(num: Column, den: Column) -> Column:
    """Double division of two decimal aggregates (identical inputs →
    identical quotient in both engines)."""
    return num.cast("double") / den.cast("double")


#: DuckDB twin: wrap a term for order-insensitive summation.
def sql_dsum(term: str) -> str:
    return f"sum(CAST({term} AS DECIMAL(18,6)))"
