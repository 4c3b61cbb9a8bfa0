"""Text-analysis operators over ``documents`` (north-star; filled in
incrementally). See osarchiver_spark/functions/text.py."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
