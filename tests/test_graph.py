"""Connected components (operators/graph.py): correctness vs a
pure-Python union-find oracle, and the round-compression property that
justifies the algorithm's existence next to q73's label propagation."""

import math
import random

import pytest
from pyspark.sql import functions as F


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id, only for nodes touching an edge
    touched = sorted({x for e in edges for x in e})
    return {x: find(x) for x in touched}


def _spark_components(spark, edges, **kw):
    from harmony_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 80
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(60)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    assert _spark_components(spark, edges) == _uf_components(n, edges)


def test_chain_converges_in_log_rounds(spark):
    # a 64-node path has diameter 63: label propagation needs ~63
    # rounds, the star algorithm must stay logarithmic
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    stats = {}
    got = _spark_components(spark, edges, stats=stats)
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 2 * int(math.log2(n)) + 2, stats


def test_string_ids_and_orientation(spark):
    # ids are any orderable type; input orientation is irrelevant
    from harmony_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [("d9", "d2"), ("d2", "d5"), ("zz", "aa")], "src string, dst string"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {"d2": "d2", "d5": "d2", "d9": "d2", "aa": "aa", "zz": "aa"}


def test_star_matches_label_propagation_on_corpus(spark, sf_dir):
    # q73 and q75 must produce the identical clustering of the real
    # LSH candidate graph
    from harmony_spark.registry import load_all

    qs = load_all()
    a = sorted(
        map(tuple, qs["q73_dedup_components"].fn(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, qs["q75_dedup_components_star"].fn(spark, sf_dir).collect())
    )
    assert a == b


def test_nonconvergence_raises_not_partial(spark):
    # a round budget too small must fail loudly, never emit partial labels
    from harmony_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(chain, max_iter=2)


def test_pagerank_matches_numpy_power_method(spark):
    """Cross-oracle: the distributed power method must match a dense
    NumPy transition-matrix iteration on an asymmetric digraph
    (directed edges exercise the outdeg weighting and the no-in-edge
    sink path that the symmetric LSH graph of q115 never hits)."""
    import numpy as np

    from harmony_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=5).collect()}

    nodes = sorted({u for u, _ in edges})  # nodes with outdeg >= 1
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        nxt = np.full(n, 0.15 / n)
        for u, v in edges:
            if v in idx:
                nxt[idx[v]] += 0.85 * r[idx[u]] / outdeg[idx[u]]
        r = nxt
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-12
