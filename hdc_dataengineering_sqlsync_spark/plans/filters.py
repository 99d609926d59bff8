"""SURVEY.md §2 — filters (to be filled in)."""
