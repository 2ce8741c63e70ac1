"""DataFrame operators re-grounding the reference's semantics (SURVEY.md §2)."""
