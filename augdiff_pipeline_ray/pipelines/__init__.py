"""End-to-end pipelines: synthetic worldgen, snapshot indexer, streaming augmented diff."""
