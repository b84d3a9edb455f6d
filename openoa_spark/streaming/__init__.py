"""Structured Streaming ingestion: the batch resample semantics mapped
onto event-time windows with watermarks."""
