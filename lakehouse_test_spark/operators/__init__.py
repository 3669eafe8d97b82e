"""Custom operators beyond vanilla Spark SQL: LLM-data-pipeline ops
(dedup, similarity, text analysis, multimodal) and join patterns
Spark lacks as built-ins (as-of, binned range join).

Everything is a composition of DataFrame ops where semantics allow;
Arrow-batched pandas UDFs only where they genuinely can't express the
kernel (multimodal decode plumbing).
"""
