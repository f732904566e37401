"""Dataflow operators (SURVEY.md §2): extraction paths, dedup, re-zip,
corpus-level dedup, similarity search, text analysis, multimodal
plumbing."""
