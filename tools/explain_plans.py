#!/usr/bin/env python
"""Dump formatted physical plans for the flagship queries into PLANS.md and
assert plan-shape properties (pushdown reached the scan, small sides
broadcast, partial aggregation present, no Python in JVM-only pipelines).

Run after operator changes: a correct-but-wrongly-planned query is a bug at
100 TB even when the values match.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

CHECKS = {
    # query name → (must-contain regexes, must-NOT-contain regexes)
    "lineitem_pricing_summary": (
        [r"PushedFilters: \[.*LessThanOrEqual", r"HashAggregate", r"partial_"],
        [r"InMemoryTableScan"],
    ),
    "revenue_by_nation": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    "topk_orders_per_segment": ([r"BroadcastHashJoin", r"RunningWindowFunction|Window"], []),
    "shipping_priority": (
        [r"PushedFilters", r"TakeOrderedAndProject|Sort"],
        [],
    ),
    "seq_rollup_1d": ([r"HashAggregate", r"partial_"], [r"BatchEvalPython|ArrowEvalPython"]),
    "events_hourly_rollup": (
        [r"HashAggregate", r"ReadSchema: struct<ts:timestamp_ntz,event_type:string,value:double>"],
        [r"BatchEvalPython"],
    ),
    "doc_ngram_jaccard_pairs": ([r"HashAggregate"], [r"CartesianProduct"]),
    "emb_topk_cosine": ([r"BroadcastNestedLoopJoin|BroadcastHashJoin"], []),
    # full basis DSL on a dyadic grid: pure Catalyst expressions, no Python
    "model_basis_spline": ([r"Project|Range"], [r"BatchEvalPython|ArrowEvalPython"]),
    # IVF: broadcast centroid fan-out + windows; never a non-broadcast cartesian
    "emb_ivf_topk": ([r"BroadcastNestedLoopJoin|BroadcastHashJoin", r"Window"], [r"CartesianProduct"]),
    # near-dup: bucket equi-join (shuffle join), never all-pairs
    "emb_cosine_neardup": ([r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"], [r"CartesianProduct|BroadcastNestedLoopJoin"]),
    # band predicates are column-vs-column (not literal-pushable) but must
    # evaluate in a codegen Filter at the scan stage, pre-shuffle, no Python
    "geometric_band_filter": (
        [r"Filter", r"HashAggregate", r"partial_"],
        [r"BatchEvalPython|ArrowEvalPython"],
    ),
    # indicator avg: single partial+final agg chain, JVM-only
    "mask_fraction": ([r"HashAggregate", r"partial_"], [r"BatchEvalPython"]),
    # per-obs grouping over the reconstruction joins: hash joins + partial agg
    "per_obs_rms": ([r"HashAggregate", r"partial_"], [r"CartesianProduct"]),
    # deterministic sampling is a pure scan→filter→project: NO exchange at
    # all — the property that makes it free at 100 TB
    "doc_stratified_sample": (
        [r"Filter"],
        [r"Exchange|BatchEvalPython|ArrowEvalPython"],
    ),
    # contamination screen: eval shingle set broadcast against the exploded
    # corpus stream, then partial+final agg — never a shuffle join on shingle
    "doc_contamination": (
        [r"BroadcastHashJoin", r"HashAggregate", r"partial_"],
        [r"SortMergeJoin|CartesianProduct"],
    ),
    # vocab top-k: partial agg before the exchange (shuffle carries vocab-
    # bounded partials, not exploded rows), single final top-k
    "tok_vocab_topk": (
        [r"HashAggregate", r"partial_", r"Window|TakeOrderedAndProject"],
        [r"BatchEvalPython|ArrowEvalPython"],
    ),
    # tiered read-through: three grouped aggs + union, all JVM-side
    "seq_tiered_readthrough": (
        [r"HashAggregate", r"partial_", r"Union"],
        [r"BatchEvalPython|ArrowEvalPython|CartesianProduct"],
    ),
    # two-level distributed scan: local windows on (source, part) keys +
    # broadcast of the tiny per-part offset table — never a per-source
    # global window (5-task ceiling), never a shuffle join
    "seq_pack_bins": (
        [r"Window", r"BroadcastHashJoin"],
        [r"SortMergeJoin|BatchEvalPython|ArrowEvalPython"],
    ),
    # rarity scoring: vocab-bounded rank table broadcast against the
    # exploded stream — never a shuffle join on the token key
    "tok_rarity_score": (
        [r"BroadcastHashJoin", r"HashAggregate", r"partial_"],
        [r"SortMergeJoin|BatchEvalPython|ArrowEvalPython"],
    ),
    # repetition screen: doc-local two-level agg, JVM-only
    "doc_repetition": (
        [r"HashAggregate", r"partial_", r"Generate"],
        [r"BatchEvalPython|ArrowEvalPython"],
    ),
    # PII screen: pure regex projection — NO exchange, no Python
    "doc_pii_screen": (
        [r"Project"],
        [r"Exchange|BatchEvalPython|ArrowEvalPython"],
    ),
    # gaps/islands: one window pass + one grouped agg, all JVM-side
    "seq_gaps_islands": (
        [r"Window", r"HashAggregate"],
        [r"BatchEvalPython|ArrowEvalPython|CartesianProduct"],
    ),
    # interpolation fill: lattice explode + running IGNORE NULLS windows —
    # no Python, no cartesian (lattice joins raw on an equi-key)
    "seq_interp_fill": (
        [r"Window", r"Generate"],
        [r"BatchEvalPython|ArrowEvalPython|CartesianProduct"],
    ),
    # M4 decimation: pure algebraic agg (partial before the exchange)
    "seq_minmax_decimate": (
        [r"HashAggregate", r"partial_"],
        [r"BatchEvalPython|ArrowEvalPython|Window"],
    ),
    # EWMA: fixed-frame window over the tier, single window pass — now
    # SHARD-KEYED: the window partition spec must carry the shard key
    # (parallelism grows with history, not the 5-value source key).
    # The r4 sparse-shard halo exchange adds BROADCAST joins against the
    # per-(key, shard) counts table (metadata-scale); shuffle joins and
    # Python eval stay forbidden.
    "seq_ewma": (
        [r"Window", r"shard", r"BroadcastHashJoin"],
        [r"BatchEvalPython|ArrowEvalPython|SortMergeJoin|ShuffledHashJoin|CartesianProduct"],
    ),
    # Hampel: two rolling-median window passes, JVM percentile only,
    # shard-keyed like EWMA (same broadcast halo mapping)
    "seq_hampel": (
        [r"Window", r"shard", r"BroadcastHashJoin"],
        [r"BatchEvalPython|ArrowEvalPython|SortMergeJoin|ShuffledHashJoin|CartesianProduct"],
    ),
    # counter rate: (source, day) running sum + shard-keyed sampled lag
    "seq_counter_rate": (
        [r"Window", r"shard", r"BroadcastHashJoin"],
        [r"BatchEvalPython|ArrowEvalPython|SortMergeJoin|ShuffledHashJoin|CartesianProduct"],
    ),
    # check_fit surface: the kernel and the dense oracle are BOTH grouped
    # pandas ops (that is the operator); the join between them is on the
    # tiny per-doc frames
    "kf_check_fit": (
        [r"FlatMapGroupsInPandas"],
        [r"CartesianProduct"],
    ),
    # deep read path: three bands unioned; the oldest band decodes via
    # mapInPandas AFTER a chunk-level filter on the compressed rows
    "seq_compressed_readthrough": (
        [r"Union", r"MapInPandas|FlatMapGroupsInPandas"],
        [r"CartesianProduct"],
    ),
    # LISEG P0 vector: pure Column arithmetic over a range — no exchange
    "liseg_p0_patch": (
        [r"Project|Range"],
        [r"Exchange|BatchEvalPython|ArrowEvalPython"],
    ),
    # grouped exact percentiles: one shuffle, JVM percentile agg
    "seq_daily_quantiles": (
        [r"HashAggregate|ObjectHashAggregate|SortAggregate"],
        [r"BatchEvalPython|ArrowEvalPython|Join"],
    ),
    # cohort enrichment: bucket-grid tier BROADCAST against the doc
    # stream — never a shuffle join on the fact side
    "seq_bucket_zscore": (
        [r"BroadcastHashJoin"],
        [r"SortMergeJoin|BatchEvalPython|ArrowEvalPython"],
    ),
}


def main() -> int:
    import __spark_entry__ as entry
    from kfts_insar_spark.session import get_spark

    spark = get_spark(app_name="explain", cores=8, shuffle_partitions=8)
    qs = entry.queries()
    failures = 0
    out = ["# Physical plans (sf0.01) — generated by tools/explain_plans.py\n"]
    for name, (must, must_not) in CHECKS.items():
        df = qs[name](spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        problems = []
        for rx in must:
            if not re.search(rx, plan):
                problems.append(f"MISSING /{rx}/")
        for rx in must_not:
            if re.search(rx, plan):
                problems.append(f"FORBIDDEN /{rx}/ present")
        status = "OK" if not problems else "FAIL: " + "; ".join(problems)
        print(f"{name}: {status}")
        failures += bool(problems)
        out.append(f"\n## {name} — {status}\n\n```\n{plan}\n```\n")
    with open("PLANS.md", "w") as f:
        f.writelines(out)
    spark.stop()
    print(f"\n{len(CHECKS) - failures}/{len(CHECKS)} plan checks pass → PLANS.md")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
