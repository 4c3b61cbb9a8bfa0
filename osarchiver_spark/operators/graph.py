"""Iterative graph analytics over relational edge lists — PageRank
by power iteration.

The reference has no graph surface at all; this is a north-star
extension in the same family as the connected-components min-label
propagation in ``operators/dedup.py`` (the other iterative-algorithm
shape a 100 TB pipeline needs, e.g. for ranking crawl domains or
scoring entities in a training corpus).

Scale design:

- The edge list is built once from a relational join, de-duplicated,
  symmetrized, joined with out-degrees, and **persisted**: every
  power iteration reuses the same keyed relation instead of
  recomputing the orders ⋈ lineitem join.
- Each iteration is one equi-join (edges ⋈ ranks on ``src``) and one
  map-combinable sum aggregation keyed by ``dst`` — no windows, no
  cross products, state per node is a single double. Both shuffles
  key on node ids, so a cluster run can pre-partition edges by
  ``src`` and reuse the exchange across iterations.
- Iteration count is a fixed, shallow constant here (the oracle
  mirrors each step as a CTE); an until-convergence variant would
  add ``localCheckpoint()`` per round exactly like
  ``connected_components`` (operators/dedup.py) to truncate lineage.
- The only driver-side values are the node count N and the loop
  counter — model-sized scalars, never data.

Undirected formulation: every edge is added in both directions, so
every node in the edge list has out-degree >= 1 and the dangling-mass
term of directed PageRank vanishes (no rank leaks; the stationary
vector sums to 1). Nodes with no edges at all are excluded — they
would sit at the teleport floor (1-d)/N forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 3


def pagerank(
    edges: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    broadcast_nodes_max: int = 2_000_000,
) -> DataFrame:
    """Power-iteration PageRank over an undirected edge list.

    ``edges`` must have columns (src, dst) with one row per directed
    edge, already symmetrized and DE-DUPLICATED (``trade_graph_edges``
    below guarantees both — re-deduplicating here would add a full
    extra shuffle for callers that already paid it).
    Returns (node, rank) with ranks summing to 1 over the node set.

    The degree table and each iteration's rank vector hold one row
    per NODE — orders of magnitude smaller than the edge list. The
    node count is already on the driver (it sizes the teleport term),
    so when it fits a broadcast (<= ``broadcast_nodes_max``, ~48 MB
    at 24 B/row) every edges-side join becomes a map-side broadcast
    probe of the persisted edge cache: no Exchange+Sort of the edge
    list in the build, no edge shuffle per iteration — the only
    per-iteration shuffle is the map-combined contribution sum keyed
    by dst. Above the cap (web-scale graphs) the joins fall back to
    shuffle joins on node id, where the persisted edge partitioning
    is reused across iterations.
    """
    from osarchiver_spark.operators.cache import transient

    # node-sized and consumed three times (count, the edge join, the
    # rank init) — each use would otherwise recompute the union+agg;
    # transient (not persist): the returned ranks reference these, so
    # blocks auto-release when the caller drops the result
    deg = transient(edges.groupBy("src").agg(F.count("*").alias("deg")))
    n_nodes = deg.count()  # scalar only — sizes teleport + join strategy
    teleport = (1.0 - damping) / n_nodes
    small = n_nodes <= broadcast_nodes_max

    # cached: every iteration probes the same keyed relation
    edges_deg = transient(edges.join(F.broadcast(deg) if small else deg, "src"))

    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        r = F.broadcast(ranks) if small else ranks
        contrib = edges_deg.join(r, edges_deg.src == r["node"]).select(
            F.col("dst"), (F.col("rank") / F.col("deg")).alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(teleport) + damping * F.sum("c")).alias("rank")
        )
    return ranks


def trade_graph_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetrized, de-duplicated customer <-> supplier edge list from
    the TPC-H-ish fixture: an edge wherever a customer's order
    contains a supplier's line item.

    Node ids are SIGNED LONGS — customer ``custkey + 1`` positive,
    supplier ``-(suppkey + 1)`` negative — so the two key spaces
    can't collide and every downstream shuffle hashes/sorts
    fixed-width integers instead of strings (render to display form
    only at the output edge). The deduped half-edge list is cached
    (transient — auto-released when the caller drops the result)
    before symmetrization: the union consumes it twice, and without
    the cache the source join + distinct would execute twice."""
    from osarchiver_spark.operators.cache import transient

    pairs = transient(
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") + 1).alias("src"),
            (-(F.col("l_suppkey") + 1)).alias("dst"),
        )
        .distinct()
    )
    return pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
