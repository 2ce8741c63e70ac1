"""Structured Streaming facade (SURVEY.md §2.10 — optional surface)."""
