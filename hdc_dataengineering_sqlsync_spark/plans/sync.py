"""SURVEY.md §2 — sync (to be filled in)."""
