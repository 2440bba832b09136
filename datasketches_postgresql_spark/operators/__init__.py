"""DataFrame-level aggregate operators (the reference's aggregate protocol
re-expressed as explicit two-phase Spark aggregation)."""
