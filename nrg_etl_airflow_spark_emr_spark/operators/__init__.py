"""Operator library (SURVEY.md §2 inventory + extensions)."""
