"""Checkpoint / lineage state: resumable partitioned output."""
