"""Lineage, resumable partitioned output, extraction metrics."""
