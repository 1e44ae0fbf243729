"""Ray Data stages: batch UDFs and actor classes for map_batches."""
