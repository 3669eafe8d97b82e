"""Sources: file scans (CSV/JSON/parquet), deterministic synthetic
record generators (the reference's load generators re-expressed as
DataFrame programs), and the Avro codec.
"""
