"""Structured Streaming forms of the engine's operators (SURVEY.md §2.10)."""
