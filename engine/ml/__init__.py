"""Embedding similarity search + near-duplicate operators."""
