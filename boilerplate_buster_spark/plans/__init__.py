"""End-to-end pipelines: checkpointing, per-partition lineage, metrics, resume."""
