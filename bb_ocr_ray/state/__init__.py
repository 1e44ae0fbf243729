"""Persistent run state: lineage manifest, resumable partitioned output."""
