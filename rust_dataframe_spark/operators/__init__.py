"""Operators beyond plain DataFrame verbs: histogram, dedup, similarity,
text analysis, multimodal plumbing."""
