"""Connected components (dedup clustering) vs a driver-side union-find."""

import random

import pytest
from pyspark.sql import functions as F

from kfts_insar_spark.operators.concomp import connected_components


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node in component
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns + [r]) for r, ns in comp.items() for n in ns}


def _spark_labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    out = connected_components(df, "a", "b", **kw)
    return {r.node: r.component for r in out.collect()}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(17)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150 + 40 * trial)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        assert _spark_labels(spark, edges) == _union_find_labels(edges)


def test_path_graph_needs_log_rounds(spark):
    # a 64-node path is the adversarial diameter case for naive propagation;
    # the star algorithm contracts it in O(log n) rounds
    edges = [(i, i + 1) for i in range(63)]
    labels = _spark_labels(spark, edges)
    assert set(labels.values()) == {0}
    assert len(labels) == 64


def test_disjoint_cliques_and_singleton_edges(spark):
    edges = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]  # clique 0-4
        + [(10, 11), (11, 12)]  # chain
        + [(20, 21)]  # pair
    )
    labels = _spark_labels(spark, edges)
    assert {labels[i] for i in range(5)} == {0}
    assert labels[10] == labels[11] == labels[12] == 10
    assert labels[20] == labels[21] == 20


def test_string_node_ids(spark):
    edges = [("docB", "docA"), ("docC", "docB"), ("docX", "docY")]
    df = spark.createDataFrame(edges, "a string, b string")
    out = {r.node: r.component for r in connected_components(df, "a", "b").collect()}
    assert out == {
        "docA": "docA",
        "docB": "docA",
        "docC": "docA",
        "docX": "docX",
        "docY": "docX",
    }
