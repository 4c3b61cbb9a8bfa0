"""Similarity search over ``embeddings`` (north-star; filled in
incrementally). See osarchiver_spark/operators/similarity.py."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
