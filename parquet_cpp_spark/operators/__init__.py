"""Spark operators: vectorized applyInPandas encode/decode of column chunks."""
