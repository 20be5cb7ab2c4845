"""Generate the reference's sample datasets with the same shapes.

Mirrors src/bin/create_sample_data.rs:100-235: four datasets of
(id Int32 sequential, value1 Utf8 random a-z, value2 Float32 uniform
[0,100)), written as part_<i>.parquet files of ``rows_per_file`` rows:

    simple              100 rows, 8-char strings,  33 rows/file
    simple_wide_string  100 rows, 100-char strings, 33 rows/file
    large_simple        10,000 rows, 8-char strings, 1,000 rows/file
    huge_simple         1,000,000 rows, 8-char strings, 10,000 rows/file

Divergence from the reference: values come from a SEEDED PRNG (the
reference uses thread_rng — nondeterministic), so re-generation is
reproducible; the query-semantics parity the datasets exercise doesn't
depend on the random values.

Usage:
    PYTHONPATH=. python tools/create_sample_data.py [--out DIR] [--skip-huge]
"""

from __future__ import annotations

import argparse
import os
import random
import string

import pyarrow as pa
import pyarrow.parquet as pq

DATASETS = {
    # name: (rows, string_size, rows_per_file)  (create_sample_data.rs:113-155)
    "simple": (100, 8, 33),
    "simple_wide_string": (100, 100, 33),
    "large_simple": (10_000, 8, 1_000),
    "huge_simple": (1_000_000, 8, 10_000),
}


def simple_data(out_dir: str, size: int, string_size: int, rows_per_file: int, seed: int = 42) -> None:
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    ids = list(range(size))
    value1 = [
        "".join(rng.choices(string.ascii_lowercase, k=string_size)) for _ in range(size)
    ]
    value2 = [rng.uniform(0.0, 100.0) for _ in range(size)]
    table = pa.table(
        {
            "id": pa.array(ids, pa.int32()),
            "value1": pa.array(value1, pa.utf8()),
            "value2": pa.array(value2, pa.float32()),
        }
    )
    n_files = -(-size // rows_per_file)
    for i in range(n_files):
        start = i * rows_per_file
        sliced = table.slice(start, min(rows_per_file, size - start))
        pq.write_table(sliced, os.path.join(out_dir, f"part_{i + 1}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/chqe_sample_data/sample_data")
    ap.add_argument("--skip-huge", action="store_true")
    args = ap.parse_args()
    for name, (rows, ssize, per_file) in DATASETS.items():
        if args.skip_huge and name == "huge_simple":
            continue
        simple_data(os.path.join(args.out, name), rows, ssize, per_file)
        print(f"wrote {name}: {rows} rows")


if __name__ == "__main__":
    main()
