"""Random-walk sampling (algorithms/walks.py) and deterministic
dataset samplers (pipeline/sampling.py) against pure-Python oracles.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gunrock_spark.algorithms.walks import (
    HASH_A,
    HASH_P,
    HASH_STEP,
    HASH_WALK,
    node2vec_walks,
    random_walks,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.pipeline.sampling import hash_sample, stratified_sample


def _rand_edges(n_v=60, n_e=300, seed=3):
    rng = random.Random(seed)
    es = {(rng.randrange(n_v), rng.randrange(n_v)) for _ in range(n_e)}
    return sorted((s, d) for s, d in es if s != d)


def _adj(edges):
    adj: dict[int, list[int]] = {}
    verts = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        verts.update((s, d))
    for v in adj:
        adj[v].sort()
    return adj, verts


def _hash(cur, t, wid, seed):
    return ((cur % HASH_P) * HASH_A + t * HASH_STEP + (wid % HASH_P) * HASH_WALK + seed) % HASH_P


def _py_walks(edges, walk_length, walks_per_vertex, seed):
    """The documented contract, straight-line Python."""
    adj, verts = _adj(edges)
    out = []
    for v in sorted(verts):
        for w in range(walks_per_vertex):
            wid = v * walks_per_vertex + w
            cur = v
            out.append((v, w, 0, v))
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_hash(cur, t, wid, seed) % len(nbrs)]
                out.append((v, w, t, cur))
    return sorted(out)


def _py_node2vec(edges, walk_length, p, q, walks_per_vertex, seed):
    """node2vec contract: integer weights (q, p*q, p) for
    (return, distance-1, distance-2) candidates in rnk order,
    inverse-CDF draw r = hash % total; step 1 is uniform."""
    adj, verts = _adj(edges)
    eset = set(edges)
    out = []
    for v in sorted(verts):
        for w in range(walks_per_vertex):
            wid = v * walks_per_vertex + w
            out.append((v, w, 0, v))
            nbrs = adj.get(v)
            if not nbrs or walk_length < 1:
                continue
            prev, cur = v, nbrs[_hash(v, 1, wid, seed) % len(nbrs)]
            out.append((v, w, 1, cur))
            for t in range(2, walk_length + 1):
                cand = adj.get(cur)
                if not cand:
                    break
                ws = [
                    q if x == prev else (p * q if (prev, x) in eset else p)
                    for x in cand
                ]
                r = _hash(cur, t, wid, seed) % sum(ws)
                acc = 0
                for x, wt in zip(cand, ws):
                    acc += wt
                    if acc > r:
                        prev, cur = cur, x
                        break
                out.append((v, w, t, cur))
    return sorted(out)


def _graph(spark, edges):
    return EdgeTable.from_df(
        spark.createDataFrame(edges, "src long, dst long")
    )


def test_walks_match_python_oracle(spark):
    edges = _rand_edges()
    got = random_walks(_graph(spark, edges), walk_length=4, walks_per_vertex=2, seed=9)
    rows = sorted((r.start, r.walk, r.step, r.v) for r in got.collect())
    assert rows == _py_walks(edges, 4, 2, 9)


def test_walks_stop_at_sinks(spark):
    # 0 -> 1 -> 2, 2 is a sink: every walk is exactly the chain prefix
    g = _graph(spark, [(0, 1), (1, 2)])
    rows = sorted(
        (r.start, r.step, r.v)
        for r in random_walks(g, walk_length=5, seed=1).collect()
    )
    assert rows == [
        (0, 0, 0), (0, 1, 1), (0, 2, 2),
        (1, 0, 1), (1, 1, 2),
        (2, 0, 2),
    ]


def test_walks_deterministic_and_partition_invariant(spark):
    edges = _rand_edges(seed=5)
    df = spark.createDataFrame(edges, "src long, dst long")
    a = random_walks(EdgeTable.from_df(df), walk_length=3, seed=4).collect()
    b = random_walks(EdgeTable.from_df(df.repartition(7)), walk_length=3, seed=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_walks_same_vertex_same_step_decorrelated(spark):
    """Two walks meeting at the same vertex at the same step must draw
    different next hops (the wid term): on the two-chain-into-cycle
    graph below, starts 0 and 1 both reach vertex 2 at step 1; their
    step-2 choices must not be forced equal by construction."""
    # 0->2, 1->2, 2->{3,4,5,6}, and a couple of onward edges
    g = _graph(spark, [(0, 2), (1, 2), (2, 3), (2, 4), (2, 5), (2, 6)])
    rows = {
        (r.start, r.step): r.v
        for r in random_walks(g, walk_length=2, seed=0).collect()
    }
    assert rows[(0, 1)] == 2 and rows[(1, 1)] == 2
    # with 4 choices and the wid mixed in, seed 0 separates them
    assert rows[(0, 2)] != rows[(1, 2)]


def _py_khop(edges, fanouts, seed, seeds=None):
    """khop_neighbor_sample's documented contract, straight-line."""
    adj, verts = _adj(edges)
    frontier = sorted(verts) if seeds is None else sorted(set(seeds))
    out = []
    for t, fanout in enumerate(fanouts, start=1):
        hop_edges = set()
        for v in frontier:
            nbrs = adj.get(v)
            if not nbrs:
                continue
            for j in range(fanout):
                h = ((v % HASH_P) * HASH_A + t * HASH_STEP + j * HASH_WALK + seed) % HASH_P
                hop_edges.add((v, nbrs[h % len(nbrs)]))
        out.extend((t, s, d) for s, d in sorted(hop_edges))
        frontier = sorted({d for _, d in hop_edges})
    return sorted(out)


def test_khop_sample_matches_python_oracle(spark):
    from gunrock_spark.algorithms.walks import khop_neighbor_sample

    edges = _rand_edges(n_v=50, n_e=260, seed=13)
    got = khop_neighbor_sample(_graph(spark, edges), [3, 2], seed=6)
    rows = sorted((r.hop, r.src, r.dst) for r in got.collect())
    assert rows == _py_khop(edges, [3, 2], 6)


def test_khop_sample_bounded_fanout_and_seeded(spark):
    from gunrock_spark.algorithms.walks import khop_neighbor_sample

    edges = _rand_edges(n_v=40, n_e=400, seed=21)
    g = _graph(spark, edges)
    seeds = spark.createDataFrame([(0,), (7,), (13,)], "v long")
    got = khop_neighbor_sample(g, [2, 3], seeds=seeds, seed=1)
    rows = [(r.hop, r.src, r.dst) for r in got.collect()]
    assert sorted(rows) == _py_khop(edges, [2, 3], 1, seeds=[0, 7, 13])
    # hop-1 sources are exactly the seed vertices that have out-edges
    adj, _ = _adj(edges)
    h1_src = {s for h, s, _ in rows if h == 1}
    assert h1_src == {v for v in (0, 7, 13) if adj.get(v)}
    # <= fanout distinct neighbors per (hop, src)
    from collections import Counter

    per = Counter((h, s) for h, s, _ in rows)
    assert all(n <= (2 if h == 1 else 3) for (h, _), n in per.items())


def test_node2vec_matches_python_oracle(spark):
    edges = _rand_edges(n_v=40, n_e=200, seed=11)
    got = node2vec_walks(
        _graph(spark, edges), walk_length=4, p=2, q=3, walks_per_vertex=2, seed=5
    )
    rows = sorted((r.start, r.walk, r.step, r.v) for r in got.collect())
    assert rows == _py_node2vec(edges, 4, 2, 3, 2, 5)


def test_node2vec_p1_q1_equals_uniform_walks(spark):
    edges = _rand_edges(n_v=30, n_e=120, seed=7)
    g = _graph(spark, edges)
    a = sorted(map(tuple, node2vec_walks(g, walk_length=3, p=1, q=1, seed=4).collect()))
    b = sorted(map(tuple, random_walks(g, walk_length=3, seed=4).collect()))
    assert a == b


def test_node2vec_return_bias(spark):
    """On 0<->1 with p=1,q=1 every step-2 move returns to the previous
    vertex (only candidate); with a branch 1->{0,2,3,...} a huge p
    (return penalty) must pick a non-return candidate whenever one
    exists, for every walk."""
    g = _graph(spark, [(0, 1), (1, 0), (1, 2), (1, 3), (2, 1), (3, 1)])
    rows = {
        (r.start, r.walk, r.step): r.v
        for r in node2vec_walks(
            g, walk_length=2, p=1_000_003, q=1, walks_per_vertex=3, seed=2
        ).collect()
    }
    for (start, walk, step), v in rows.items():
        if step != 2:
            continue
        prev = rows[(start, walk, step - 2)]
        cur = rows[(start, walk, step - 1)]
        if cur == 1:  # vertex 1 has non-return alternatives {0,2,3}-{prev}
            assert v != prev, (start, walk, prev, cur, v)


def test_node2vec_validation(spark):
    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError):
        node2vec_walks(g, walk_length=1, p=0)
    with pytest.raises(ValueError):
        node2vec_walks(g, walk_length=1, q=0)


def test_walks_validation(spark):
    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError):
        random_walks(g, walk_length=-1)
    with pytest.raises(ValueError):
        random_walks(g, walk_length=1, walks_per_vertex=0)


@pytest.fixture()
def docs(spark):
    rows = [(i, f"t{i}", ["en", "de", "fr"][i % 3]) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_sample_python_oracle_and_stability(docs):
    got = {r.doc_id for r in hash_sample(docs, "doc_id", 1, 4, seed=13).collect()}
    want = {
        i
        for i in range(200)
        if (((i % 900_000_007) * 1_000_003 + 13) % 900_000_007) % 4 < 1
    }
    assert got == want
    # stable under repartition (rand()-based sampling is not)
    again = {
        r.doc_id
        for r in hash_sample(docs.repartition(5), "doc_id", 1, 4, seed=13).collect()
    }
    assert again == got
    assert 0 < len(got) < 200


def test_hash_sample_edges_of_fraction(docs):
    assert hash_sample(docs, "doc_id", 0, 4).count() == 0
    assert hash_sample(docs, "doc_id", 4, 4).count() == 200
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 5, 4)


def test_stratified_sample_exact_k_per_stratum(docs):
    out = stratified_sample(docs, "lang", "doc_id", k=5, seed=2)
    per = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 5, "de": 5, "fr": 5}
    assert set(out.columns) == set(docs.columns)
    # k larger than a stratum returns the whole stratum
    small = docs.where(F.col("doc_id") < 4)  # en:2 de:1 fr:1
    out2 = stratified_sample(small, "lang", "doc_id", k=5)
    assert out2.count() == 4


def test_stratified_sample_deterministic(docs):
    a = sorted(r.doc_id for r in stratified_sample(docs, "lang", "doc_id", 7, seed=3).collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(docs.repartition(6), "lang", "doc_id", 7, seed=3).collect()
    )
    assert a == b


def test_skipgram_pairs_window_and_counts(spark):
    from gunrock_spark.algorithms.walks import skipgram_pairs

    # two walks: (0,0): 5-6-7-8 ; (0,1): 5-6-5 (repeat pair)
    rows = [
        (0, 0, 0, 5), (0, 0, 1, 6), (0, 0, 2, 7), (0, 0, 3, 8),
        (0, 1, 0, 5), (0, 1, 1, 6), (0, 1, 2, 5),
    ]
    w = spark.createDataFrame(rows, schema="start long, walk int, step int, v long")
    got = {(r.center, r.context): r.n for r in skipgram_pairs(w, 2).collect()}
    # window 1 pairs from walk 0: (5,6),(6,5),(6,7),(7,6),(7,8),(8,7)
    # window 2 adds (5,7),(7,5),(6,8),(8,6)
    assert got[(5, 7)] == 1 and got[(6, 8)] == 1
    # walk 1 contributes (5,6)x2 (steps 0-1 and 2-1), (5,5)x2, (6,5)x2
    assert got[(5, 6)] == 1 + 2
    assert got[(5, 5)] == 2
    # symmetric counts overall
    assert all(got[(a, b)] == got[(b, a)] for (a, b) in got)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skipgram_pairs(w, 0)


def test_skipgram_plan_no_self_join_shuffle(spark):
    """Pair generation is in-array: the physical plan has exactly the
    two aggregate exchanges (walk gather + pair count), no join."""
    from gunrock_spark.algorithms.walks import skipgram_pairs

    rows = [(0, 0, 0, 5), (0, 0, 1, 6)]
    w = spark.createDataFrame(
        rows, schema="start long, walk int, step int, v long"
    ).localCheckpoint(eager=True)
    plan = skipgram_pairs(w, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- negative_samples (word2vec/LINE negative sampling) ---------------------


def _neg_oracle(pairs, weights, m, seed):
    P, A, CTX, JP = 900_000_007, 1_000_003, 104_729, 7_919
    vs = sorted(v for v, w in weights.items() if w > 0)
    cdf, lo = [], 0
    for v in vs:
        cdf.append((v, lo, lo + weights[v]))
        lo += weights[v]
    total = lo
    out = []
    for c, x in pairs:
        for j in range(1, m + 1):
            r = ((c % P) * A + (x % P) * CTX + j * JP + seed) % P % total
            neg = next(v for v, a, b in cdf if a <= r < b)
            out.append((c, x, j, neg))
    return sorted(out)


def test_negative_samples_match_python_oracle(spark):
    from gunrock_spark.algorithms.walks import negative_samples

    weights = {1: 3, 2: 1, 5: 6, 9: 2}
    pairs = [(1, 2), (7, 5), (2, 9), (5, 1)]
    pdf = spark.createDataFrame(pairs, "center long, context long")
    wdf = spark.createDataFrame(list(weights.items()), "v long, w long")
    got = sorted(
        (r.center, r.context, r.j, r.neg)
        for r in negative_samples(pdf, wdf, m=4, seed=9).collect()
    )
    assert got == _neg_oracle(pairs, weights, 4, 9)


def test_negative_samples_row_count_and_range(spark):
    from gunrock_spark.algorithms.walks import negative_samples

    pdf = spark.createDataFrame(
        [(i, (i * 3) % 7) for i in range(20)], "center long, context long"
    )
    wdf = spark.createDataFrame([(v, v + 1) for v in range(7)], "v long, w long")
    rows = negative_samples(pdf, wdf, m=5, seed=1).collect()
    assert len(rows) == 20 * 5  # exactly one vocab hit per draw
    assert all(0 <= r.neg < 7 for r in rows)


def test_negative_samples_weight_proportionality(spark):
    from gunrock_spark.algorithms.walks import negative_samples

    # one heavy item should dominate the draws
    pdf = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "center long, context long"
    )
    wdf = spark.createDataFrame([(0, 90), (1, 5), (2, 5)], "v long, w long")
    rows = negative_samples(pdf, wdf, m=4, seed=3).collect()
    frac0 = sum(1 for r in rows if r.neg == 0) / len(rows)
    assert frac0 > 0.75


def _py_weighted_walks(wedges, walk_length, walks_per_vertex, seed):
    """weighted_walks contract: inverse integer CDF over out-edges in
    dst order; zero-weight edges never traversable."""
    adj: dict[int, list[tuple[int, int]]] = {}
    verts = set()
    for s, d, w in wedges:
        verts.update((s, d))
        if w > 0:
            adj.setdefault(s, []).append((d, w))
    for v in adj:
        adj[v].sort()
    out = []
    for v in sorted(verts):
        for wk in range(walks_per_vertex):
            wid = v * walks_per_vertex + wk
            cur = v
            out.append((v, wk, 0, v))
            for t in range(1, walk_length + 1):
                cand = adj.get(cur)
                if not cand:
                    break
                r = _hash(cur, t, wid, seed) % sum(w for _, w in cand)
                acc = 0
                for d, w in cand:
                    acc += w
                    if acc > r:
                        cur = d
                        break
                out.append((v, wk, t, cur))
    return sorted(out)


def _wgraph(spark, wedges):
    return EdgeTable.from_df(
        spark.createDataFrame(wedges, "src long, dst long, weight double"),
        weight="weight",
    )


def test_weighted_walks_match_python_oracle(spark):
    from gunrock_spark.algorithms.walks import weighted_walks

    rng = random.Random(17)
    wedges = [(s, d, float(rng.randrange(0, 5))) for s, d in _rand_edges(seed=17)]
    g = _wgraph(spark, wedges)
    got = sorted(
        (r["start"], r["walk"], r["step"], r["v"])
        for r in weighted_walks(g, walk_length=3, walks_per_vertex=2, seed=9).collect()
    )
    want = _py_weighted_walks(
        [(s, d, int(w)) for s, d, w in wedges], 3, 2, 9
    )
    assert got == want


def test_weighted_walks_unit_weights_equal_uniform(spark):
    from gunrock_spark.algorithms.walks import weighted_walks

    edges = _rand_edges(seed=23)
    wedges = [(s, d, 1.0) for s, d in edges]
    got = sorted(
        (r["start"], r["walk"], r["step"], r["v"])
        for r in weighted_walks(
            _wgraph(spark, wedges), walk_length=3, walks_per_vertex=2, seed=5
        ).collect()
    )
    want = sorted(
        (r["start"], r["walk"], r["step"], r["v"])
        for r in random_walks(
            _graph(spark, edges), walk_length=3, walks_per_vertex=2, seed=5
        ).collect()
    )
    assert got == want


def test_weighted_walks_requires_weighted_graph(spark):
    from gunrock_spark.algorithms.walks import weighted_walks

    with pytest.raises(ValueError):
        weighted_walks(_graph(spark, _rand_edges()), walk_length=2)


def test_weighted_walks_heavy_edge_dominates(spark):
    # 0 -> 1 (w 1000) vs 0 -> 2 (w 1): nearly every draw lands on 1
    from gunrock_spark.algorithms.walks import weighted_walks

    wedges = [(0, 1, 1000.0), (0, 2, 1.0)]
    g = _wgraph(spark, wedges)
    hops = [
        r["v"]
        for r in weighted_walks(g, walk_length=1, walks_per_vertex=20, seed=1)
        .where("start = 0 AND step = 1")
        .collect()
    ]
    assert len(hops) == 20 and hops.count(1) >= 19


def test_khop_in_direction_is_reverse_contract(spark):
    """direction='in' == the out-contract over the reversed edges."""
    from gunrock_spark.algorithms.walks import khop_neighbor_sample

    edges = _rand_edges(n_v=40, n_e=300, seed=17)
    rev = [(d, s) for s, d in edges]
    got = sorted(
        (r.hop, r.src, r.dst)
        for r in khop_neighbor_sample(
            _graph(spark, edges), [2, 2], seed=3, direction="in"
        ).collect()
    )
    assert got == _py_khop(rev, [2, 2], 3)
