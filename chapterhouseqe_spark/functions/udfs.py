"""User-defined function registration (reference README "Functions:
UDFs" — declared, never built; SURVEY §2.10).

The engine's UDF story is Spark's: ``spark.udf.register`` for scalar
functions usable from SQL, Arrow-batched ``pandas_udf`` for the
vectorized path (10-100× over row-at-a-time Python), and Python UDTFs
for table functions. These registrations make UDFs available to BOTH
engine modes via ``spark.sql``.

Hot-path guidance (PLANS.md): built-in functions first — a UDF is the
escape hatch, and when needed it should be a pandas_udf like the ones
here, never a row-at-a-time ``F.udf`` in a scan-sized pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def chqe_charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized charge: price * (1 - disc) * (1 + tax) — elementwise
    double ops in the same order as the SQL expression, so results are
    bit-identical to the JVM/DuckDB computation."""
    return price * (1 - disc) * (1 + tax)


@pandas_udf("long")
def chqe_word_count(text: pd.Series) -> pd.Series:
    """Vectorized whitespace token count."""
    return text.str.split().str.len().astype("int64")


def register_default_udfs(spark: SparkSession) -> list[str]:
    """Register the engine's built-in UDFs; returns the registered names."""
    spark.udf.register("chqe_charge", chqe_charge)
    spark.udf.register("chqe_word_count", chqe_word_count)
    return ["chqe_charge", "chqe_word_count"]
