"""Declarative data-quality checks: one scan, one report.

Training-data pipelines gate every ingest on constraint checks
(not-null, ranges, enums, patterns, referential counts). The naive
implementation runs one job per rule — N scans of a 100 TB table. This
module evaluates ALL rules in a single aggregation pass: each rule is a
boolean Column folded into one `sum(when(...))` per rule inside the
same map-side-combinable agg, then the one-row wide result is unpivoted
to a (rule, n_total, n_fail) report. Cost = one column-pruned scan
regardless of rule count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate boolean pass-conditions in ONE aggregation pass.

    ``rules`` maps rule name -> Column that is true when the row PASSES;
    a NULL condition counts as a failure (the conservative read — an
    unevaluable constraint is not a pass). Returns one row per rule:
    ``(rule, n_total, n_fail)``, sorted by rule name for stable output.
    """
    if not rules:
        raise ValueError("check_rules requires at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(cond, 0).otherwise(1)).cast("long").alias(f"__f_{name}")
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col("__n").alias("n_total"),
                    F.col(f"__f_{name}").alias("n_fail"),
                )
                for name in sorted(rules)
            ]
        )
    ).alias("r")
    return wide.select(report).select("r.rule", "r.n_total", "r.n_fail")
