"""Table-layout / plan-level components: the versioned lakehouse
table (commit log over parquet) that dissolves the reference's
tiered-storage scan coordination into snapshot reads.
"""
