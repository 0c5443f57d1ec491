"""Similarity operators (SURVEY.md §7 M5) — filled in incrementally."""
