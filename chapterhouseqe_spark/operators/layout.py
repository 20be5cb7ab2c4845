"""Data-layout control for scan-efficient parquet at 100 TB.

The single biggest lever for petabyte scans is never reading the data:
partition pruning handles coarse dimensions (date, region), but point
and range predicates on high-cardinality keys (customer id, document
id) need *file- and row-group-level* skipping, which parquet gives for
free via min/max column statistics — IF the writer clustered rows so
each file covers a narrow key range. A randomly-partitioned write puts
every key range in every file and min/max filters skip nothing.

``cluster_write`` is the Spark-native way to get that layout (the same
effect Delta's OPTIMIZE ZORDER or Iceberg's sort orders provide, built
from primitives available on any vanilla cluster): range-repartition on
the cluster key so each output task owns a contiguous, disjoint slice
of the key space, then sort within partitions so row groups inside each
file are narrow too. One shuffle at write time buys every subsequent
scan row-group skipping on the cluster key — the standard write-once /
read-many trade of analytics storage.

The reference engine materializes results as plain unordered parquet
(ref: src/operators/materialize_files.rs — no layout control); this
module is the scale path beyond that.

``file_key_ranges`` reads back per-file min/max from parquet footers
(pyarrow, metadata-only — no data IO) so tests and operators can verify
a layout is actually skippable instead of assuming it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``.

    ``repartitionByRange`` samples the key distribution and assigns each
    task a contiguous key slice (ties between equal keys stay together),
    so files are disjoint in key space even under skew;
    ``sortWithinPartitions`` then orders rows inside each file so
    row-group min/max stats are narrow as well. ``num_files`` defaults
    to the session shuffle partitioning — at real scale set it from
    target file size (total bytes / ~512 MB), not from core count.
    """
    parts = [F.col(c) for c in cluster_cols]
    out = (
        df.repartitionByRange(num_files, *parts)
        if num_files
        else df.repartitionByRange(*parts)
    )
    out.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


def file_key_ranges(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) for ``column`` from parquet footers.

    Metadata-only: reads each footer's row-group statistics (the same
    stats scan engines consult for skipping) and folds them to file
    level. Sorted by min so disjointness is a zip-with-next check.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        schema_names = md.schema.to_arrow_schema().names
        ci = schema_names.index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                continue
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out.append((os.path.basename(f), min(mins), max(maxs)))
    out.sort(key=lambda t: t[1])
    return out
