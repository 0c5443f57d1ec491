"""Batch-equivalent forms of the streaming windows — filled in incrementally."""
