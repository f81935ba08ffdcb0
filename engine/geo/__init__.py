"""Spatial operators: cells, tiles, bbox, PIP, joins, kNN, skew handling."""
