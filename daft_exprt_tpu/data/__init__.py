"""Data pipeline: alignment ingestion, feature extraction, stats, sets,
and the training data loader."""
