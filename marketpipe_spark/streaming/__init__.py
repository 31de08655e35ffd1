"""Incremental-batch processing: checkpoints, resumable ingestion, and the
event-chained aggregation/validation legs."""
