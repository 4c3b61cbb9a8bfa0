"""Multimodal (binary-column) plumbing (north-star; filled in
incrementally). See osarchiver_spark/operators/multimodal.py."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
