"""Structured Streaming over the events table (SURVEY.md §2.11, §7 M4)."""
