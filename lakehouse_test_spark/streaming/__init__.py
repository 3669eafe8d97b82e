"""Structured Streaming surface: bounded runs, event-time windows,
watermarks, session windows, streaming dedup, foreachBatch.
"""
