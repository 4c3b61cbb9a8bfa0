"""connected_components semantics on known graphs: chains force
multi-round label propagation; the rep is always the component min."""

from __future__ import annotations

from osarchiver_spark.operators.dedup import connected_components


def _run(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(pairs)
    return {r.doc_id: r.cluster_rep for r in out.collect()}


def test_cc_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5 (diameter 4 → several propagation rounds),
    # triangle 10-11-12, disjoint pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _run(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_cc_rep_is_min_regardless_of_edge_direction(spark):
    # high id on the left: symmetry must still pull labels downhill
    got = _run(spark, [(9, 3), (3, 7)])
    assert got == {3: 3, 7: 3, 9: 3}


def test_cc_long_chain_converges(spark):
    # 12-vertex chain: diameter exceeds a couple of rounds; the
    # fixpoint loop must keep going until labels stop changing
    edges = [(i, i + 1) for i in range(100, 111)]
    got = _run(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 12
