"""Executed-plan audit for registry queries — the PLANS.md evidence,
reproducible on demand.

For each named query (default: a representative set), runs the build at
the given sf dir, materializes it, and prints the post-AQE executed
plan plus the load-bearing properties the repo optimizes for:

- pushed filters / read schemas per parquet scan (pruning),
- exchange count and kinds (shuffle discipline),
- broadcast exchanges (small-side placement),
- cartesian products (should be none outside labeled baselines),
- whole-stage-codegen span count,
- partitionless windows (should be none — see PLANS.md round 6).

Usage:
    PYTHONPATH=/root/repo python tools/plan_audit.py [--sf DIR] [name ...]
    PYTHONPATH=/root/repo python tools/plan_audit.py --full  # plan text too
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SET = [
    "ref_scan_filter_project",
    "tpch_q3_shipping_priority",
    "dedup_minhash_lsh",
    "embedding_ivfpq_topk",
    "bloom_prefilter_join",
    "bpe_pair_counts",
    "unpivot_measures",
    "pipeline_pack_sequences",
    # round-7 additions
    "embedding_ivf_sq_topk",
    "bpe_train_loop",
    "dedup_substring_passages",
    "pipeline_epoch_shuffle",
    # round-8 additions
    "embedding_ivf_sq_prebuilt_topk",
    "join_fuzzy_part_names",
    "embedding_hard_negatives",
]


def audit(plan: str) -> dict:
    final = plan.split("== Initial Plan ==")[0]
    return {
        "scans": len(re.findall(r"FileScan parquet", final)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", final),
        "exchanges": len(re.findall(r"Exchange ", final)),
        "single_partition_exchanges": len(
            re.findall(r"Exchange SinglePartition", final)
        ),
        # count JOIN nodes, not exchange nodes: Spark truncates long
        # plan strings (SparkStringUtils), which silently drops
        # Broadcast{Exchange,QueryStage} subtrees — the join operator
        # line always survives and names its strategy
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", final))
        + len(re.findall(r"BroadcastNestedLoopJoin", final)),
        "shuffle_joins": len(re.findall(r"ShuffledHashJoin", final))
        + len(re.findall(r"SortMergeJoin", final)),
        "cartesian": len(re.findall(r"CartesianProduct", final)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", final))),
        "windows": len(re.findall(r"\bWindow\b", final)),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--full", action="store_true", help="print plan text")
    args = ap.parse_args()

    from chapterhouseqe_spark.queries.registry import get_queries
    from chapterhouseqe_spark.session import get_spark

    spark = get_spark("plan-audit")
    queries = get_queries()
    names = args.names or DEFAULT_SET
    for name in names:
        if name not in queries:
            print(f"?? {name}: not registered")
            continue
        df = queries[name](spark, args.sf)
        # collect() (not a noop write) so THIS DataFrame's own
        # QueryExecution runs and AQE finalizes — a write executes a
        # separate QueryExecution and leaves this plan isFinalPlan=false
        # (same pattern as tests/test_plan_pipeline.py::_executed_plan)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        props = audit(plan)
        flags = []
        if props["cartesian"]:
            flags.append("CARTESIAN")
        if props["single_partition_exchanges"]:
            flags.append("SINGLE-PARTITION-EXCHANGE")
        flag_s = f"  << {' '.join(flags)}" if flags else ""
        print(
            f"{name}: scans={props['scans']} exchanges={props['exchanges']} "
            f"bcast_joins={props['broadcast_joins']} "
            f"shuffle_joins={props['shuffle_joins']} "
            f"codegen={props['codegen_spans']} "
            f"windows={props['windows']}{flag_s}"
        )
        for pf in props["pushed_filters"]:
            if pf:
                print(f"    pushed: {pf}")
        if args.full:
            print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
