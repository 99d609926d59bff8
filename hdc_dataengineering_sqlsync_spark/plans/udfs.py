"""SURVEY.md §2 — udfs (to be filled in)."""
