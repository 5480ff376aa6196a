"""Scalar/column helper functions (SURVEY.md §2.8)."""
