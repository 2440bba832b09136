"""Multimodal (image/audio/video) column plumbing over opaque binary
columns. Decoders are STUBBED (no codec libraries in this environment); the
Spark-side plumbing — schemas, partitioning, UDF signatures, Arrow batch
shapes — is real and tested."""
