"""Web-scale near-duplicate detection + clustering pipeline (the north-rule
target): extraction -> shingling -> MinHash -> LSH banding -> SimHash
verification -> suffix-array containment -> connected-components clustering,
with per-stage checkpoints, lineage sketch metrics, and exact resume."""
