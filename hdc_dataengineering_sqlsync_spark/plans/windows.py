"""SURVEY.md §2 — windows (to be filled in)."""
