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


def test_fixpoint_probe_cheaper_than_exceptall(spark):
    """The convergence probe must cost fewer driver jobs than the
    two-sided exceptAll form it replaced: on the same pair of
    checkpointed edge frames, the (count, hash-sum) signature runs ONE
    aggregate job; the old probe ran two sort-based set differences."""
    import pandas as pd
    from pyspark.sql import functions as F

    a = spark.createDataFrame(
        pd.DataFrame({"u": list(range(50)), "v": list(range(1, 51))})
    ).localCheckpoint(eager=True)
    b = spark.createDataFrame(
        pd.DataFrame({"u": list(range(50)), "v": [0] * 50})
    ).localCheckpoint(eager=True)
    st = spark.sparkContext.statusTracker()

    j0 = len(st.getJobIdsForGroup(None))
    b.agg(F.count(F.lit(1)), F.sum(F.xxhash64("u", "v"))).first()
    new_jobs = len(st.getJobIdsForGroup(None)) - j0

    j0 = len(st.getJobIdsForGroup(None))
    b.exceptAll(a).limit(1).count()
    a.exceptAll(b).limit(1).count()
    old_jobs = len(st.getJobIdsForGroup(None)) - j0

    assert new_jobs < old_jobs, (new_jobs, old_jobs)
    assert new_jobs <= 2  # one aggregate (AQE may add a final stage job)


def test_signature_probe_converges_path_graph(spark):
    """A worst-case path graph still converges to one component under the
    signature fixpoint (no early stop, no infinite loop)."""
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame({"a": list(range(63)), "b": list(range(1, 64))})
    )
    out = connected_components(pairs, "a", "b")
    got = {r.node: r.component for r in out.collect()}
    assert set(got.values()) == {0} and len(got) == 64


def test_pairs_islands_diagnostic(spark):
    """The reference's ingest-time network sanity gate
    (prepare_input.py:568-576): the segmented pair network must report
    exactly 3 islands, each epoch labeled with its segment's smallest
    epoch, sizes matching the segment widths."""
    from kfts_insar_spark.plans.advanced_queries import (
        NET_BREAKS,
        N_NET_EPOCHS,
        q_pairs_islands,
    )

    out = q_pairs_islands(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == N_NET_EPOCHS
    assert out["n_islands"].nunique() == 1 and out["n_islands"].iloc[0] == 3
    b0, b1 = NET_BREAKS
    want = {0: (0, b0), b0: (b0, b1), b1: (b1, N_NET_EPOCHS)}
    for iid, (lo, hi) in want.items():
        grp = out[out["island_id"] == iid]
        assert sorted(grp["epoch"]) == list(range(lo, hi))
        assert (grp["island_size"] == hi - lo).all()
