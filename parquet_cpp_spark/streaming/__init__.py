"""Structured Streaming encode: continuous ingestion of token files."""
