"""Training-data pipeline operators over document/embedding tables:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine / SemDeDup semantic clusters), benchmark decontamination
(n-gram overlap vs an eval set), ANN similarity search, and text analysis
(language-ID, quality scoring, token counting, fingerprinting)."""
