"""Reference-shaped ETL pipelines (SURVEY.md §2.12)."""
