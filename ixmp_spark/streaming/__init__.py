"""Structured Streaming surface (SURVEY.md §2.9 — extension; the
reference is batch-only)."""
