"""Vector column functions over ``array<float>`` embeddings.

Built-in higher-order functions (zip_with/aggregate) keep the dot
product JVM-side and codegen'd — no Python crossing per row. Floats
are cast to double BEFORE any arithmetic so Spark and the DuckDB
oracle accumulate in identical precision (both sum left-to-right in
float64 → bit-identical results).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (never NaN/div0 —
    keeps ANSI mode happy and the oracle branch-identical)."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def hyperplane_sign_bits(vec: Column, n_planes: int, dim: int, seed: str = "lsh") -> Column:
    """Random-hyperplane LSH bucket key (SimHash for vectors).

    Plane k's i-th coordinate is a deterministic pseudo-random value
    in [-1, 1) derived from md5(f'{seed}|{k}|{i}') — reproducible in
    any engine, no RNG state. Returns an int bucket in [0, 2^n_planes).

    Scale path: cosine-similar vectors collide with high probability,
    so candidate generation is a bucket equi-join instead of an O(n²)
    cross join.
    """
    dvec = as_double(vec)
    bucket = F.lit(0)
    for k in range(n_planes):
        coeffs = F.array(*[F.lit(_pseudo_coeff(seed, k, i)) for i in range(dim)])
        proj = F.aggregate(
            F.zip_with(dvec, coeffs, lambda x, c: x * c), F.lit(0.0), lambda acc, x: acc + x
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << k)).otherwise(F.lit(0))
    return bucket


def _pseudo_coeff(seed: str, plane: int, i: int) -> float:
    """Deterministic coefficient in [-1, 1): first 12 hex digits of
    md5, scaled. Mirrors the SQL `from_hex`-free construction used in
    oracles (they recompute it the same way when needed)."""
    import hashlib

    h = hashlib.md5(f"{seed}|{plane}|{i}".encode()).hexdigest()[:12]
    return int(h, 16) / float(1 << 48) * 2.0 - 1.0
