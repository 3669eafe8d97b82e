"""Query registry — the single source of truth for the driver contract.

Every operator the engine claims is registered here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
a DuckDB-dialect oracle SQL string computing the same result on the
same parquet fixtures. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Oracle-comparison rules enforced by convention in every query:
- alias every computed column identically in Spark and SQL;
- round floating aggregates (2 dp for price-magnitude sums, 4-6 dp
  for averages/ratios) and CAST to DOUBLE in the oracle;
- never emit raw ``events.ts`` (ns in parquet, µs in Spark): bucket
  to >= 1 second or convert to epoch-seconds BIGINT first;
- deterministic total order before any LIMIT (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a named query with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
