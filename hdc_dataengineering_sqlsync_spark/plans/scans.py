"""SURVEY.md §2 — scans (to be filled in)."""
