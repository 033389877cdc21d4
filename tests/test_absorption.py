"""k-step absorption probability (algorithms/absorption.py)."""

from gunrock_spark.algorithms.absorption import absorption_probability
from gunrock_spark.graph.edge_table import EdgeTable


def _graph(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return EdgeTable.from_df(df)


def test_hand_computed_two_steps(spark):
    # 1 -> 0(seed); 2 -> {1, 3}; 3 -> 3 (self-absorbing away from S)
    g = _graph(spark, [(1, 0), (2, 1), (2, 3), (3, 3)])
    got = {r.v: r.absorb_p for r in absorption_probability(g, [0], k=2).collect()}
    assert got[0] == 1.0
    assert got[1] == 1.0  # one hop to seed
    assert got[2] == 0.5  # half its mass reaches via 1 at step 2
    assert got[3] == 0.0  # self-loop never reaches


def test_seed_stays_absorbed(spark):
    # seed has an out-edge to a sink; its probability must stay 1
    g = _graph(spark, [(0, 9), (9, 9), (5, 0)])
    got = {r.v: r.absorb_p for r in absorption_probability(g, [0], k=3).collect()}
    assert got[0] == 1.0
    assert got[5] == 1.0
    assert got[9] == 0.0


def test_dangling_nonseed_is_zero(spark):
    # 7 has no out-edges: the walk halts outside S
    g = _graph(spark, [(1, 7), (1, 0), (0, 1)])
    got = {r.v: r.absorb_p for r in absorption_probability(g, [0], k=4).collect()}
    assert got[7] == 0.0
    assert got[1] == 0.5  # half to seed, half stuck at 7
    assert got[0] == 1.0


def test_monotone_in_k(spark):
    # chain 3 -> 2 -> 1 -> 0(seed): reachable only with enough steps
    g = _graph(spark, [(3, 2), (2, 1), (1, 0)])
    k1 = {r.v: r.absorb_p for r in absorption_probability(g, [0], k=1).collect()}
    k3 = {r.v: r.absorb_p for r in absorption_probability(g, [0], k=3).collect()}
    assert k1[3] == 0.0 and k3[3] == 1.0
    assert all(k3[v] >= k1[v] for v in k1)
