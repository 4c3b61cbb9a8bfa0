"""Deduplication operators over ``documents`` (north-star; filled in
incrementally). See osarchiver_spark/operators/dedup.py."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
