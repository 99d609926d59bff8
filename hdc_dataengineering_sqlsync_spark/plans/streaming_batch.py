"""SURVEY.md §2 — streaming_batch (to be filled in)."""
