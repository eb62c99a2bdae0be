"""Keyed state storage (SURVEY.md §2.1 S9)."""
