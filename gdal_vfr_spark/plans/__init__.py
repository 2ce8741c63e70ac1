"""Job-level planning: lineage checkpoints, resume, skew planning."""
