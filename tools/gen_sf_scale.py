"""Measurement-only scale-factor data generator (guide §1).

The driver measures BENCH at an escalated scale factor (sf1.0 in r05) using
its own generated data, which is not retained between sessions. This tool
synthesizes a dataset with the SAME schemas and closely matched
distributions as /root/testdata/sf0.1 (inspected via DuckDB: row counts,
value ranges, category frequencies, doc word/vocab stats) at an arbitrary
scale, so optimization A/Bs can run at the graded scale.

STRICTLY for timing: correctness gates always run against the driver's
read-only /root/testdata dirs; nothing here feeds an oracle or a committed
artifact. Output dir defaults to .data/sfX (gitignored).

Usage: python tools/gen_sf_scale.py [sf] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 420


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts(days_start: str, spread_days: float, n: int, rng) -> np.ndarray:
    base = np.datetime64(days_start)
    off = (rng.random(n) * spread_days * 86400.0 * 1e6).astype("timedelta64[us]")
    return base + off


def main(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    scale = sf / 0.1  # sf0.1 row counts are the reference point

    # region / nation: fixed dimension tables, identical to sf0.1
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(15000 * scale)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(
            ["MACHINERY", "HOUSEHOLD", "BUILDING", "AUTOMOBILE", "FURNITURE"]
        )[rng.integers(0, 5, n_cust)],
    }))

    n_supp = int(1000 * scale)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    n_part = int(20000 * scale)
    adjs = np.array(["large", "small", "red", "green", "steel", "brushed"])
    nouns = np.array(["ring", "plate", "bolt", "gear", "panel", "tube"])
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adjs[rng.integers(0, 6, n_part)], " "),
                              nouns[rng.integers(0, 6, n_part)]),
        "p_brand": np.array([f"Brand#{i}" for i in range(25)])[rng.integers(0, 25, n_part)],
        "p_type": np.array(["SMALL", "MEDIUM", "LARGE", "ECONOMY", "STANDARD", "PROMO"])[
            rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    n_ord = int(150000 * scale)
    odate = _ts("1995-01-01", 2404, n_ord, rng)  # 1995-01-01 .. 2001-08-01
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: ~4 lines per order (sf0.1 avg 4.08, max 7)
    lines_per = rng.integers(1, 8, n_ord)
    l_ok = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_ok)
    l_ln = np.concatenate([np.arange(1, k + 1) for k in lines_per]).astype(np.int32)
    ship = (np.repeat(odate, lines_per)
            + (rng.integers(1, 96, n_li) * np.int64(86400_000_000)).astype("timedelta64[us]"))
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_ln, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ship,
    }))
    print(f"  (lineitem lines/order avg {n_li / n_ord:.2f})")

    n_ev = int(100000 * scale)
    n_users = int(1500 * scale)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts("2024-01-01", 30, n_ev, rng),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(["click", "view", "purchase", "signup", "error"])[
            rng.integers(0, 5, n_ev)],
        "value": np.round(np.clip(rng.exponential(50.0, n_ev), 0, 560.21), 2),
        "props": np.char.add(np.char.add("{\"k\": ",
                             rng.integers(0, 100, n_ev).astype(str)), "}"),
    }))

    # documents: 10-100 words from the sf0.1 30-word vocab (+ rare 'dup'),
    # tiny vocab => heavy natural near-duplication, matching the real
    # corpus's LSH candidate-space shape
    n_doc = int(5000 * scale)
    vocab = np.array([
        "spark", "window", "merge", "table", "column", "vector", "stream",
        "value", "data", "small", "join", "filter", "big", "group", "hash",
        "customer", "sort", "order", "slow", "line", "part", "fast", "the",
        "row", "agg", "key", "query", "a", "scan", "batch",
    ])
    nw = rng.integers(10, 101, n_doc)
    total_w = int(nw.sum())
    widx = rng.integers(0, 30, total_w)
    words = vocab[widx]
    # ~5% of docs get a 'dup' marker word somewhere (sf0.1: 250/5000 docs)
    starts = np.concatenate(([0], np.cumsum(nw)[:-1]))
    dup_docs = rng.random(n_doc) < 0.05
    dup_pos = starts[dup_docs] + rng.integers(0, nw[dup_docs])
    words[dup_pos] = "dup"
    texts = [" ".join(words[s:s + k]) for s, k in zip(starts, nw)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(["en", "de", "zh", "fr", "es"])[
            rng.choice(5, n_doc, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])],
        "source": np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = int(2000 * scale)
    labels = rng.integers(0, 10, n_emb)
    cents = rng.normal(0, 1, (10, 64))
    vecs = cents[labels] + rng.normal(0, 0.6, (n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", f"sf{sf}")
    print(f"generating sf{sf} -> {out}")
    main(sf, out)
