"""SURVEY.md §2 — scalar_fns (to be filled in)."""
