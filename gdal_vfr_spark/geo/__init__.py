"""Vectorized geospatial core: cell index, WKB codec, PIP, kNN, tiles."""
