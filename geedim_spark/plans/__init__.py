"""Plan-level utilities: metrics accumulators + lineage emission."""
