"""Checkpoint / lineage state for resumable pipelines."""
