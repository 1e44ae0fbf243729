"""Sources: Parquet readers + the deterministic synthetic pages generator."""
