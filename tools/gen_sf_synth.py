"""Generate a synthetic sf-scaled dataset mirroring the driver fixtures.

The driver's round-end measurement may run at a larger, driver-generated
scale factor (BENCH_r05 ran at sf=1.0) whose data does not persist
between sessions.  This tool regenerates a statistically matched dataset
at an arbitrary scale so optimization before/after numbers can be taken
at the scale the driver actually measures.  Distributions are fitted to
/root/testdata/sf0.1 (empirical vocab, word-count range, lang/source
mixes, unit-norm 64-dim embeddings, 30-day event stream, TPC-H-ish
lineitem star) and each table is written as ONE parquet file with ONE
row group, matching the driver fixtures' layout (that layout is itself
load-bearing for the scan-parallelism optimizations).

Usage: python tools/gen_sf_synth.py /tmp/sf1.0_synth 10
  (second arg = multiplier over sf0.1 row counts)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.151, 0.149, 0.148, 0.14]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    # mirror the driver fixtures' physical layout: one file per table,
    # a single row group for the small/medium tables, ~1M-row groups
    # for the TPC-H fact tables (the driver's sf1.0 lineitem had 6 row
    # groups; row-group count bounds scan parallelism, so it is
    # load-bearing for measurement fidelity)
    rg = 1_000_000 if name in ("lineitem", "orders") else 1 << 31
    pq.write_table(table, path, row_group_size=rg, compression="snappy")
    print(f"wrote {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    wc = rng.integers(10, 101, n)
    flat = rng.integers(0, len(VOCAB), int(wc.sum()))
    words = np.array(VOCAB, dtype=object)[flat]
    offs = np.concatenate([[0], np.cumsum(wc)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n)]
    lang = rng.choice(LANGS, n, p=LANG_P)
    ids = np.arange(n)
    return pa.table({
        "doc_id": ids,
        "text": texts,
        "lang": lang,
        "source": np.char.add("src", (ids % 20).astype(str)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    v = rng.normal(size=(n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": np.arange(n),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n),
    })


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    span_us = 30 * 86400 * 1_000_000
    gaps = rng.exponential(span_us / n, n)
    ts = np.datetime64("2024-01-01", "us") + np.cumsum(gaps).astype("timedelta64[us]")
    return pa.table({
        "event_id": np.arange(n),
        "ts": ts,
        "user_id": rng.integers(0, n_users, n),
        "event_type": rng.choice(["signup", "purchase", "view", "click", "error"], n),
        "value": np.round(np.minimum(rng.exponential(50.0, n), 560.0), 2),
        "props": np.char.add(np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)), "}"),
    })


def gen_star(rng: np.random.Generator, out: str, mult: float) -> None:
    n_li = int(600_000 * mult)
    n_ord = int(150_000 * mult)
    n_cust = int(15_000 * mult)
    n_part = int(20_000 * mult)
    n_supp = int(1_000 * mult)

    _write(out, "region", pa.table({
        "r_regionkey": np.arange(5),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": np.arange(25),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": np.arange(25) % 5,
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"], n_cust),
    }))
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part),
        "p_name": [f"part name {i}" for i in range(n_part)],
        "p_brand": np.char.add("Brand#", rng.integers(11, 56, n_part).astype(str)),
        "p_type": rng.choice(
            ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"], n_part),
        "p_size": rng.integers(1, 51, n_part),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))
    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2400, n_ord).astype("timedelta64[D]"))
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_ord, p=[0.49, 0.49, 0.02]),
        "o_totalprice": np.round(rng.uniform(850, 500000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_ord),
    }))
    sdate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2500, n_li).astype("timedelta64[D]"))
    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": pa.array(sdate, type=pa.timestamp("us")),
    }))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0_synth"
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    _write(out, "documents", gen_documents(rng, int(5_000 * mult)))
    _write(out, "embeddings", gen_embeddings(rng, int(2_000 * mult)))
    _write(out, "events", gen_events(rng, int(100_000 * mult), int(1_500 * mult)))
    gen_star(rng, out, mult)
    open(os.path.join(out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
