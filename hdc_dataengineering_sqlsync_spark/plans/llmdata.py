"""SURVEY.md §2 — llmdata (to be filled in)."""
