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


def register_default_udtfs(spark: SparkSession) -> list[str]:
    """Register the engine's built-in Python UDTFs; returns the names.

    ``chqe_ngrams`` (SURVEY §2.10's table-function mapping): one row per
    word n-gram of the input text, with its position. Usable from SQL as
    a lateral table function —
    ``SELECT d.doc_id, g.ngram FROM docs d, LATERAL chqe_ngrams(d.text, 2) g``.

    The class is defined inside this function ON PURPOSE: a module-level
    class pickles by reference, and importing this module on an executor
    re-runs the module-level ``@pandas_udf`` decorators, which need an
    active session the Python worker doesn't have. A local class is
    serialized by value instead.
    """
    from pyspark.sql.functions import udtf

    class ChqeNgrams:
        def eval(self, text: str, n: int):
            toks = (text or "").split()
            for i in range(len(toks) - n + 1):
                yield " ".join(toks[i : i + n]), i

    spark.udtf.register(
        "chqe_ngrams", udtf(ChqeNgrams, returnType="ngram string, pos int")
    )
    return ["chqe_ngrams"]


def make_grouped_median():
    """Grouped-aggregate pandas UDF (the UDAF surface of SURVEY §2.10):
    exact median per group.

    Median is chosen deliberately: it is ORDER-INDEPENDENT (a rank
    statistic over the sorted group), so the result is deterministic
    and oracle-checkable, unlike a float sum-based custom aggregate
    whose accumulation order Spark does not fix. Arrives Arrow-batched
    per group — the whole group's column as one pandas Series (the
    GROUPED_AGG execution shape; groups must fit an executor, which is
    the standard contract for unbounded-window UDAFs).

    Defined inside a factory for the same pickle-by-value reason as
    the UDTFs in :func:`register_default_udtfs`.
    """
    from pyspark.sql.functions import pandas_udf as _pudf

    # Series -> scalar type hints mark this as a GROUPED_AGG UDF
    # (SPARK-28264 — the modern replacement for PandasUDFType).
    @_pudf("double")
    def chqe_median(v: pd.Series) -> float:
        import numpy as np

        # np.median of an even-sized group is (a+b)/2 of the two middle
        # elements — the same interpolation DuckDB's median() uses, so
        # the doubles agree bit-for-bit.
        return float(np.median(v.to_numpy()))

    return chqe_median
