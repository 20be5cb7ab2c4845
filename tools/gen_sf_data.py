"""Generate the bench star schema at an arbitrary scale factor.

The driver ships deterministic synthetic tables at sf0.001/0.01/0.1
(TESTDATA.md) but nothing larger, and /root/testdata is read-only —
so scale evidence above sf0.1 needs a local generator. This one
reproduces the SAME schema and value distributions as the driver's
tables (measured from sf0.1: key ranges, dictionary values, timestamp
spans, the 31-word document vocabulary, unit-norm 64-dim embeddings in
10 label clusters) at ``sf`` times the sf1 row counts, seeded — so an
sf1 bench run measures the same query plans on 10x the sf0.1 data, not
a different workload.

Values are NOT bit-identical to the driver's (its generator is not
published); that is fine for the bench tier, which times plans — the
correctness gate stays on the driver's own sf0.01 data.

Row counts at sf=1: customer 150k, supplier 10k, part 200k, orders
1.5M, lineitem 6M, events 1M, documents 50k, embeddings 20k
(region 5 / nation 25 fixed), matching 10x the sf0.1 counts.

Usage::

    PYTHONPATH=. python tools/gen_sf_data.py --sf 1 --out testdata_sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["O", "F", "P"]
PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]
PART_ADJ = ["large", "small", "hot", "cold", "dim", "bright", "plated", "burnished"]
PART_NOUN = ["ring", "bolt", "washer", "anchor", "gear", "cam", "rod", "wheel"]
PART_TYPES = ["LARGE", "SMALL", "MEDIUM", "ECONOMY", "PROMO", "STANDARD"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.55, 0.12, 0.11, 0.11, 0.11]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

DAY = np.timedelta64(1, "D").astype("timedelta64[us]").astype(np.int64)


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_col(base: str, offsets_us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype(np.int64)
    return pa.array(base_us + offsets_us, pa.timestamp("us"))


def generate(out: str, sf: float, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    }))
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PART_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + np.arange(n_part) % 1000 / 10.0, 2)),
    }))

    o_date = rng.integers(0, 2404, n_ord) * DAY  # 1995-01-01 .. 2001-08
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])]
        ),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 400_000, n_ord), 2)),
        "o_orderdate": _ts_col("1995-01-01", o_date),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    l_ship = rng.integers(1, 2500, n_li) * DAY
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105_000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(
            np.array(["R", "A", "N"])[rng.choice(3, n_li, p=[0.25, 0.25, 0.5])]
        ),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col("1995-01-01", l_ship),
    }))

    ev_ts = np.sort(rng.integers(0, 30 * DAY, n_ev))  # 30 days, ordered
    n_users = max(int(15_000 * sf), 100)
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_col("2024-01-01", ev_ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(60.0, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: word soup over the 31-token vocab, ~10% near-dup pairs
    # (the dedup operators need true positives at every scale)
    lengths = rng.integers(8, 110, n_doc)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i % 10 == 9 and i > 0:
            texts.append(texts[i - 1])  # exact/near-dup partner
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lengths[i])]))
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: 10 unit-norm cluster centroids + gaussian noise,
    # renormalized (driver's are unit-norm; intra-label cosine >
    # inter-label, so IVF/label-aware queries behave realistically)
    labels = rng.integers(0, 10, n_emb)
    cents = rng.normal(size=(10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = cents[labels] * 0.25 + rng.normal(size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="testdata_sf1")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(f"generating sf={args.sf} into {args.out}")
    generate(args.out, args.sf, args.seed)


if __name__ == "__main__":
    main()
