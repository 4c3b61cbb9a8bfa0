"""PageRank (operators/graph.py) on graphs with known structure.

Oracle parity on the fixture is covered by test_oracle_parity; these
pin the algorithm's invariants on constructed graphs where the
stationary structure is known analytically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osarchiver_spark.operators.graph import pagerank, trade_graph_edges


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_sums_to_one_and_star_center_dominates(spark):
    # star: hub h connected to 4 spokes — hub must outrank every spoke,
    # spokes are symmetric (equal ranks), total mass = 1
    edges = _sym(spark, [("h", f"s{i}") for i in range(4)])
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=6).collect()}
    assert ranks["h"] == max(ranks.values())
    spoke_ranks = {v for k, v in ranks.items() if k != "h"}
    assert len(spoke_ranks) == 1  # symmetry → identical spoke ranks
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: the uniform vector is stationary, so
    # every iteration count must return exactly 1/4 per node
    edges = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    ranks = [r.rank for r in pagerank(edges, iterations=3).collect()]
    assert ranks == pytest.approx([0.25] * 4, abs=1e-12)


def test_trade_graph_edges_are_symmetrized_and_distinct(spark, sf_small):
    from osarchiver_spark.sources.parquet import load_table

    edges = trade_graph_edges(
        load_table(spark, sf_small, "orders"), load_table(spark, sf_small, "lineitem")
    )
    n = edges.count()
    assert n == edges.distinct().count()  # no duplicate edges
    # symmetry: reversing every edge yields the same set
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert edges.exceptAll(rev).count() == 0
    # bipartite signed-long encoding: every edge joins a customer
    # (positive) and a supplier (negative); zero is unused
    bad = edges.filter(
        (F.col("src") * F.col("dst") >= 0) | (F.col("src") == 0) | (F.col("dst") == 0)
    ).count()
    assert bad == 0


def test_pagerank_matches_independent_numpy_reference(spark):
    # differential check against a from-scratch NumPy power iteration
    # on seeded random graphs — same damping, same iteration count
    import numpy as np

    rng = np.random.default_rng(42)
    for _ in range(3):
        n = 12
        pairs = {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, n, size=(25, 2))
            if a != b
        }
        edge_rows = [(f"n{a}", f"n{b}") for a, b in pairs] + [
            (f"n{b}", f"n{a}") for a, b in pairs
        ]
        nodes = sorted({x for e in edge_rows for x in e})
        idx = {x: i for i, x in enumerate(nodes)}
        deg = np.zeros(len(nodes))
        for s, _ in edge_rows:
            deg[idx[s]] += 1
        d, iters = 0.85, 3
        r = np.full(len(nodes), 1.0 / len(nodes))
        for _ in range(iters):
            nxt = np.full(len(nodes), (1.0 - d) / len(nodes))
            for s, t in edge_rows:
                nxt[idx[t]] += d * r[idx[s]] / deg[idx[s]]
            r = nxt
        got = {
            row.node: row.rank
            for row in pagerank(
                spark.createDataFrame(edge_rows, ["src", "dst"]),
                damping=d,
                iterations=iters,
            ).collect()
        }
        assert set(got) == set(nodes)
        for x in nodes:
            assert got[x] == pytest.approx(r[idx[x]], abs=1e-12), x
