"""Text analysis + deduplication operators for training-data pipelines."""
