"""Aggregated query registry — importing this module registers every
named query in the engine (relational, scalar, LLM-data, streaming,
synthetic-ingest). ``__spark_entry__`` re-exports from here.
"""

from __future__ import annotations

# Import order is cosmetic; each module registers into registry.REGISTRY.
import lakehouse_test_spark.queries_aggwin2  # noqa: F401
import lakehouse_test_spark.queries_relational  # noqa: F401
import lakehouse_test_spark.queries_scalar  # noqa: F401
import lakehouse_test_spark.queries_misc  # noqa: F401
import lakehouse_test_spark.queries_profile  # noqa: F401
import lakehouse_test_spark.queries_scalar2  # noqa: F401
import lakehouse_test_spark.queries_tpch2  # noqa: F401
import lakehouse_test_spark.queries_sql  # noqa: F401
import lakehouse_test_spark.queries_wave3  # noqa: F401
import lakehouse_test_spark.queries_wave4  # noqa: F401
import lakehouse_test_spark.queries_wave5  # noqa: F401
import lakehouse_test_spark.queries_wave6  # noqa: F401
import lakehouse_test_spark.queries_wave7  # noqa: F401
import lakehouse_test_spark.queries_wave8  # noqa: F401
import lakehouse_test_spark.queries_wave9  # noqa: F401
import lakehouse_test_spark.queries_wave10  # noqa: F401
import lakehouse_test_spark.queries_wave11  # noqa: F401
import lakehouse_test_spark.queries_wave12  # noqa: F401
import lakehouse_test_spark.queries_wave13  # noqa: F401
import lakehouse_test_spark.queries_wave14  # noqa: F401
import lakehouse_test_spark.queries_wave15  # noqa: F401
import lakehouse_test_spark.queries_wave16  # noqa: F401
import lakehouse_test_spark.queries_wave17  # noqa: F401
import lakehouse_test_spark.queries_wave18  # noqa: F401
import lakehouse_test_spark.queries_wave19  # noqa: F401
import lakehouse_test_spark.queries_wave20  # noqa: F401
import lakehouse_test_spark.queries_wave21  # noqa: F401
import lakehouse_test_spark.queries_wave22  # noqa: F401
import lakehouse_test_spark.queries_wave23  # noqa: F401
import lakehouse_test_spark.queries_wave24  # noqa: F401
import lakehouse_test_spark.queries_wave25  # noqa: F401
import lakehouse_test_spark.queries_wave26  # noqa: F401
import lakehouse_test_spark.queries_wave27  # noqa: F401
import lakehouse_test_spark.queries_wave28  # noqa: F401
import lakehouse_test_spark.queries_wave29  # noqa: F401
import lakehouse_test_spark.queries_wave30  # noqa: F401
import lakehouse_test_spark.queries_wave31  # noqa: F401
import lakehouse_test_spark.queries_wave32  # noqa: F401
import lakehouse_test_spark.queries_wave33  # noqa: F401
import lakehouse_test_spark.queries_wave34  # noqa: F401
import lakehouse_test_spark.queries_wave35  # noqa: F401
import lakehouse_test_spark.queries_wave36  # noqa: F401
import lakehouse_test_spark.queries_wave37  # noqa: F401
import lakehouse_test_spark.queries_wave38  # noqa: F401
import lakehouse_test_spark.queries_wave39  # noqa: F401
import lakehouse_test_spark.queries_wave40  # noqa: F401
import lakehouse_test_spark.queries_wave41  # noqa: F401
import lakehouse_test_spark.sources.python_datasource  # noqa: F401
import lakehouse_test_spark.queries_dq  # noqa: F401

from lakehouse_test_spark.registry import REGISTRY, all_oracles, all_queries

# Optional modules land as they are built; keep imports tolerant so a
# broken optional surface never takes down the whole registry.
for _mod in (
    "lakehouse_test_spark.operators.dedup",
    "lakehouse_test_spark.operators.similarity",
    "lakehouse_test_spark.operators.ann_index",
    "lakehouse_test_spark.operators.text",
    "lakehouse_test_spark.operators.tokens",
    "lakehouse_test_spark.operators.joins",
    "lakehouse_test_spark.operators.multimodal",
    "lakehouse_test_spark.operators.udfs",
    "lakehouse_test_spark.operators.cluster",
    "lakehouse_test_spark.operators.recsys",
    "lakehouse_test_spark.sources.synthetic",
    "lakehouse_test_spark.streaming.jobs",
    "lakehouse_test_spark.plans.delta_export",
    "lakehouse_test_spark.plans.iceberg_export",
):
    try:
        __import__(_mod)
    except ImportError:
        pass

__all__ = ["REGISTRY", "all_queries", "all_oracles"]
