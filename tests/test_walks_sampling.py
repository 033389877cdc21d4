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
    random_walks,
)
from gunrock_spark.graph.edge_table import EdgeTable
from gunrock_spark.pipeline.sampling import hash_sample, stratified_sample


def _rand_edges(n_v=60, n_e=300, seed=3):
    rng = random.Random(seed)
    es = {(rng.randrange(n_v), rng.randrange(n_v)) for _ in range(n_e)}
    return sorted((s, d) for s, d in es if s != d)


def _py_walks(edges, walk_length, walks_per_vertex, seed):
    """The documented contract, straight-line Python."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        verts.update((s, d))
    for v in adj:
        adj[v].sort()
    out = []
    for v in sorted(verts):
        for w in range(walks_per_vertex):
            cur = v
            out.append((v, w, 0, v))
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = ((cur % HASH_P) * HASH_A + t * HASH_STEP + w * HASH_WALK + seed) % HASH_P
                cur = nbrs[h % len(nbrs)]
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
