"""Call-recording wrapper around the CDF stream reader.

The r8 ``seedChunkFiles`` bug shipped because its tests hand-drove the
offset API (``initialOffset``/``latestOffset``/``partitions``/
``commit``) in an ASSUMED call order; the real engine follows a
different one. This wrapper records every offset-API call a REAL
stream makes — one JSON line per call appended to the ``traceFile``
option — so tests can PIN the engine's order and the admission logic
can be asserted against the engine, not against a model of it.

Traced facts (pyspark 4.1.2, ``tools/probe_call_order.py``):

- FRESH start (processingTime AND AvailableNow): ``latestOffset()``
  runs FIRST — blind, before ``initialOffset()`` — then
  ``initialOffset()``, then ``partitions(initial, latest)``.
- EVERY restart (clean or mid-batch): ``partitions(...)`` over the
  checkpointed offsets runs BEFORE the first ``latestOffset()``
  (Spark re-plans the last checkpointed batch first), so the version
  floor is known before the first capped admission answer.

Usage::

    spark.dataSource.register(TracedCDFDataSource)
    spark.readStream.format("lakehouse_cdf_traced")
        .option("path", p).option("traceFile", "/tmp/trace.jsonl")...

``read_trace(path)`` parses the file back into a list of dicts.
"""
from __future__ import annotations

import json
from pathlib import Path

from lakehouse_test_spark.sources.cdf_datasource import (
    LakehouseCDFDataSource,
    LakehouseCDFStreamReader,
)


class TracedCDFStreamReader(LakehouseCDFStreamReader):
    """Appends one JSON line per offset-API call to ``traceFile``.

    The trace writes happen in Spark's driver-side Python runner
    process (offset calls never run on executors), so a plain local
    append is ordered and complete for a single query."""

    def _trace(self, call: str, **kw) -> None:
        tf = self.options.get("traceFile") or self.options.get("tracefile")
        if tf:
            with open(tf, "a") as f:
                f.write(json.dumps({"call": call, **kw}) + "\n")

    def initialOffset(self):
        o = super().initialOffset()
        self._trace("initialOffset", ret=o)
        return o

    def latestOffset(self):
        o = super().latestOffset()
        self._trace("latestOffset", ret=o)
        return o

    def partitions(self, start, end):
        parts = super().partitions(start, end)
        self._trace("partitions", start=start, end=end, n=len(list(parts)))
        return parts

    def commit(self, end):
        self._trace("commit", end=end)
        super().commit(end)


class TracedCDFDataSource(LakehouseCDFDataSource):
    @classmethod
    def name(cls) -> str:
        return "lakehouse_cdf_traced"

    def streamReader(self, schema) -> TracedCDFStreamReader:
        data = [
            f
            for f in schema.fields
            if f.name
            not in ("_change_type", "_commit_version", "_commit_timestamp")
        ]
        return TracedCDFStreamReader(
            self.options,
            [f.name for f in data],
            {f.name: f.dataType.simpleString().lower() for f in data},
        )


def read_trace(path: str) -> list[dict]:
    p = Path(path)
    if not p.exists():
        return []
    return [json.loads(ln) for ln in p.read_text().splitlines() if ln.strip()]


def register(spark) -> None:
    spark.dataSource.register(TracedCDFDataSource)
