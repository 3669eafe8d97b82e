"""Sinks: partitioned/fan-out writers with compression control —
the reference's producer surface (SURVEY.md §2a ops 10-16) on
columnar storage.
"""
