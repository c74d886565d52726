"""Structured Streaming surface (beyond the batch-only reference)."""
