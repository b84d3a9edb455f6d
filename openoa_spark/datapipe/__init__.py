"""Large-scale training-data pipeline operators: deduplication,
similarity search, text analysis, multimodal column plumbing."""
