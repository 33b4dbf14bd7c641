"""Distributed connected components — the dedup-clustering operator.

Near-duplicate detection (MinHash/LSH, SimHash, embedding-cosine — all in
``plans/text_queries.py``) produces candidate PAIRS; an actual dedup
decision needs the transitive closure of those pairs: one cluster per group
of mutually-near documents, one canonical survivor per cluster. The
reference has no graph machinery (its closest analogue is the network
connectivity diagnostic over the interferogram graph,
/root/reference/prepare_input.py:568-576, computed densely at the driver);
at 10^12 documents the pair graph must be clustered distributedly.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-bounded CC method:

- ``large_star``: every node points its *larger* neighbors at its smallest
  neighbor (or itself);
- ``small_star``: every node points its *smaller-or-equal* neighbors at
  their collective minimum.

Each round is two shuffles on the node key (a ``groupBy(u).agg(min)`` plus
an equi-join — never a ``collect_list``, so a hot node with millions of
neighbors stays a streaming aggregate, not an in-memory array), and the
edge set contracts toward a star forest in O(log n) rounds. Per-round
``localCheckpoint`` truncates the lineage — without it the plan doubles
every iteration and analysis cost explodes.

Convergence is detected by an edge-set SIGNATURE fixpoint — one aggregate
job per round computing (count, sum of xxhash64(u, v)) over the (distinct)
edge set and comparing with the previous round's signature. The signature
is order-independent and equal edge sets always produce equal signatures;
a false positive needs a 64-bit hash-sum collision between *different*
consecutive edge sets (~2⁻⁶⁴ per round — and the groupBy-min labeling
below degrades gracefully even then). This replaces the earlier two
``exceptAll().limit(1).count()`` probes, halving the per-round bookkeeping
jobs and removing their sort-based set-difference shuffles; ``max_iter``
bounds the loop defensively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every edge (u, v) with v > u, m = min(N(u) ∪ {u})."""
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u")).alias("_m")
    return (
        sym.join(mins, "u")
        .select("u", "v", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge (big ← small); point every small neighbor — and the
    big node itself — at the minimum of the small neighborhood."""
    ori = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = ori.groupBy("u").agg(F.min("v").alias("_m"))
    with_m = ori.join(mins, "u")
    pts = with_m.filter(F.col("v") != F.col("_m")).select(
        F.col("v").alias("u"), F.col("_m").alias("v")
    )
    self_pts = mins.select("u", F.col("_m").alias("v"))
    return pts.union(self_pts).distinct()


def connected_components(
    pairs: DataFrame, src: str, dst: str, max_iter: int = 20
) -> DataFrame:
    """Cluster an undirected pair graph; returns ``(node, component)`` for
    every node present in ``pairs``, with ``component`` = the smallest node
    id in its connected component (the canonical-survivor convention of
    exact dedup, ``min(doc_id)`` per group).

    ``src``/``dst`` name the pair columns (any orderable type). Rounds are
    O(log n); dedup graphs (near-cliques of duplicates) typically converge
    in 2-3.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = edges.select("u").union(edges.select("v")).distinct()

    prev = edges
    prev_sig = None
    for _ in range(max_iter):
        nxt = _small_star(_large_star(prev)).localCheckpoint(eager=True)
        # fixpoint via order-independent signature: ONE aggregate job over
        # the checkpointed (memory-resident) edges — vs two sort-shuffle
        # exceptAll probes per round previously
        row = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v")).alias("h"),
        ).first()
        sig = (row.n, row.h)
        prev = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    # star forest: (node → root) edges; roots appear only on the v side.
    # groupBy-min instead of a bare join: robust even if max_iter stopped
    # the loop one round short of the exact fixpoint.
    labels = prev.groupBy("u").agg(F.min("v").alias("component"))
    return nodes.join(labels, ["u"], "left").select(
        F.col("u").alias("node"),
        F.coalesce("component", "u").alias("component"),
    )
