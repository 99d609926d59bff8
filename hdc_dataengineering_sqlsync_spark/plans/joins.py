"""SURVEY.md §2 — joins (to be filled in)."""
