"""Reusable DataFrame operator library — the engine's building blocks.

Each module re-expresses one operator family from SURVEY.md §2 as
composable, Catalyst-friendly DataFrame transforms (no row-at-a-time
Python in any hot path).
"""
