"""Reusable column-expression builders shared by operators."""
