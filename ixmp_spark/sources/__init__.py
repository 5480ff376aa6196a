"""Storage backends and file-format readers/writers (SURVEY.md §2.1)."""
