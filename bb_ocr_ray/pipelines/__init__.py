"""End-to-end pipeline assembly (read -> repartition -> extract -> sinks)."""
