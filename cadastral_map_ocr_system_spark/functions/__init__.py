"""Scalar rule layer: regex constants, geometry math, similarity.

These are the single source of truth for the extraction *rules*; both
the Spark pipeline and the single-process oracle read the same
constants, so any divergence is an implementation bug, not a spec
drift.
"""
