"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash),
similarity search (quantized inner-product, cosine, LSH-bucketed), and text
analysis (token counting, quality scoring, language-ID heuristic,
fingerprinting). All built from declarative DataFrame ops so Catalyst
optimizes them; no per-row Python in any hot path."""
