"""SURVEY.md §2 — sorts_sets (to be filled in)."""
