"""Structured Streaming variants: watermarked streaming dedup and
foreachBatch sketch metrics."""
