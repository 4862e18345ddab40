"""Physical planning helpers: partitioning, skew, checkpointed runs."""
