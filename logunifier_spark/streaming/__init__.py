"""Structured Streaming variants of the pipeline (SURVEY.md §2.9)."""
