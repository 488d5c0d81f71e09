#!/usr/bin/env python3
"""Generate scale-trend testdata beyond the driver-shipped sf0.1.

The driver ships deterministic synthetic tables at sf in {0.001, 0.01,
0.1} (TESTDATA.md; read-only). Measuring how query cost GROWS with data
needs at least one more decade, so this tool regenerates the same
star-schema + events/documents/embeddings shape at an arbitrary sf,
matching the shipped tables' schemas, key relationships, value ranges,
and duplicate structure (measured from /root/testdata/sf0.1 — see the
inline notes). It is NOT bit-identical to the driver's generator and is
never used for correctness gating — only for bench trend points
(BASELINE.md "scale trend" section).

Row counts follow the shipped scaling laws:
    lineitem 6M*sf   orders 1.5M*sf   customer 150k*sf   part 200k*sf
    supplier 10k*sf  events 1M*sf     documents max(500, 50k*sf)
    embeddings max(500, 20k*sf)       events users ~ 15k*sf

Usage: python tools/gen_scale_data.py SF OUTDIR   (e.g. 1 .localdata/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
SRC = "/root/testdata/sf0.1"

MKTSEGMENTS = ["AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "MACHINERY", "BUILDING"]
ORDERSTATUS = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = ["en", "es", "fr", "de", "zh"]          # en ~40%, rest ~15% each
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
# the shipped documents' full 31-word vocabulary
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
PART_ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "dim"]
PART_NOUN = ["ring", "bolt", "case", "gear", "disk", "plate", "tube", "cap"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def _write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _copy_fixed(outdir, name):
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    _write(outdir, name, t)


def gen(sf: float, outdir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_users = max(15, int(15_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_vec = max(500, int(20_000 * sf))

    # region/nation are fixed 5/25-row dims at every sf
    _copy_fixed(outdir, "region")
    _copy_fixed(outdir, "nation")

    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, -1000, 10_000, n_cust),
        "c_mktsegment": np.array(MKTSEGMENTS)[
            rng.integers(0, len(MKTSEGMENTS), n_cust)
        ],
    }))

    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, -1000, 10_000, n_supp),
    }))

    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]
        ),
        "p_type": np.array(PART_TYPES)[
            rng.integers(0, len(PART_TYPES), n_part)
        ],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": _money(rng, 900, 1000, n_part),
    }))

    # orders over 1995-01-01 .. 2001-08-01 (shipped range), day-aligned
    day_us = 86_400_000_000
    o_epoch0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    o_days = rng.integers(0, 2404, n_ord)  # 1995-01-01..2001-08-01
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(ORDERSTATUS)[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, 1000, 500_000, n_ord),
        "o_orderdate": pa.array(
            o_epoch0 + o_days * day_us, pa.timestamp("us")
        ),
        "o_orderpriority": np.array(PRIORITIES)[
            rng.integers(0, len(PRIORITIES), n_ord)
        ],
    }))

    # lineitem: ~4 lines/order (uniform orderkey draw -> Poisson counts,
    # matching the shipped 1..17 spread), linenumber sequential per order
    l_ok = np.sort(rng.integers(0, n_ord, n_line))
    first = np.ones(n_line, dtype=bool)
    first[1:] = l_ok[1:] != l_ok[:-1]
    idx = np.arange(n_line)
    l_ln = idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1
    l_days = rng.integers(0, 2499, n_line)  # shipdate thru 2001-11-04
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
        "l_linenumber": pa.array(l_ln, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
        "l_extendedprice": _money(rng, 900, 105_000, n_line),
        "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_line)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_line)],
        "l_shipdate": pa.array(o_epoch0 + l_days * day_us, pa.timestamp("us")),
    }))

    # events: 30 days of Jan-2024 microsecond timestamps, 2-dp values
    e_epoch0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    e_us = np.sort(rng.integers(0, 30 * day_us, n_evt))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(e_epoch0 + e_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[
            rng.integers(0, len(EVENT_TYPES), n_evt)
        ],
        "value": np.round(rng.uniform(0, 1, n_evt) ** 2 * 560, 2),
        "props": np.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]
        ),
    }))

    # documents: 8..60-word sequences from the 31-word vocabulary;
    # ~10% near-duplicates (1-3 word edits of an earlier doc) and a few
    # exact duplicates — the shipped corpus has both (5000 docs, 4992
    # distinct texts, 228 shared 60-char prefixes at sf0.1)
    vocab = np.array(VOCAB)
    lens = rng.integers(8, 61, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:                      # exact dup
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.10:                       # near dup
            words = texts[rng.integers(0, i)].split(" ")
            for _ in range(rng.integers(1, 4)):
                words[rng.integers(0, len(words))] = vocab[
                    rng.integers(0, len(vocab))
                ]
            texts.append(" ".join(words))
            continue
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)
        ],
        "source": np.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": pa.array(
            np.array([len(t) for t in texts]), pa.int64()
        ),
    }))

    # embeddings: unit-norm 64-dim float32 with 10 label clusters so
    # ANN queries see real neighbor structure
    cents = rng.normal(0, 1, (10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vec)
    vecs = cents[labels] + rng.normal(0, 0.35, (n_vec, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(
            list(vecs.astype(np.float32)), pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else f".localdata/sf{sys.argv[1]}"
    gen(sf, outdir)
    print(f"wrote sf={sf} to {outdir}")
