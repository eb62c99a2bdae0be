"""Operator library: geo predicates (reference §2.2 P5-P6) + the
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing)."""
