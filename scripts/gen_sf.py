#!/usr/bin/env python3
"""Generate an sf tier with the SAME schema + distribution shape as the
driver-generated /root/testdata tiers (TESTDATA.md), at any scale factor.

The driver's own generator is not in the repo and /root/testdata is
read-only, so this re-implements the observed shape (schemas, value
domains, cardinality ratios, duplicate-document rate, clustered
embeddings) with a DIFFERENT seed — the oracle gate is self-consistent
(Spark vs DuckDB over the same files), so correctness holds on any tier
generated here. Used for the sf1 (10x sf0.1) constant-factor-cliff run
recorded in BASELINE.md.

Usage: python3 scripts/gen_sf.py <sf> <outDir>   e.g. gen_sf.py 1 /tmp/sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pathlib import Path

SF = float(sys.argv[1])
OUT = Path(sys.argv[2])
OUT.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(4242)

# row counts: linear in sf, matching the observed sf0.1 counts x (sf/0.1)
S = SF / 0.1
N_CUST = int(15000 * S)
N_SUPP = int(1000 * S)
N_PART = int(20000 * S)
N_ORD = int(150000 * S)
N_LINE = int(600000 * S)
N_EVT = int(100000 * S)
N_DOC = int(5000 * S)
N_EMB = int(2000 * S)


def w(name, table):
    pq.write_table(table, OUT / f"{name}.parquet")
    print(name, table.num_rows)


# region / nation: fixed dims (not scaled)
w("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
w("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
w("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, N_CUST)])}))

w("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_SUPP), 2)}))

adjs = ["large", "hot", "blue", "small", "red", "green", "dim", "shiny"]
nouns = ["ring", "bolt", "nut", "washer", "gear", "cog", "pin", "cap"]
types = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
w("part", pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(N_PART)],
    "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, N_PART)],
    "p_type": pa.array(np.array(types)[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900 + np.arange(N_PART) * 0.1, 1)}))

statuses = np.array(["F", "O", "P"])
prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
base95 = np.datetime64("1995-01-01")
w("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": pa.array(statuses[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": np.round(rng.uniform(900, 500000, N_ORD), 2),
    "o_orderdate": pa.array(base95 + rng.integers(0, 2556, N_ORD).astype("timedelta64[D]")),
    "o_orderpriority": pa.array(prios[rng.integers(0, 5, N_ORD)])}))

rf = np.array(["A", "N", "R"])
ls = np.array(["F", "O"])
w("lineitem", pa.table({
    "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LINE), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LINE), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LINE), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LINE), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LINE).astype("float64"),
    "l_extendedprice": np.round(rng.uniform(900, 100000, N_LINE), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LINE) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LINE) * 0.01, 2),
    "l_returnflag": pa.array(rf[rng.integers(0, 3, N_LINE)]),
    "l_linestatus": pa.array(ls[rng.integers(0, 2, N_LINE)]),
    "l_shipdate": pa.array(base95 + rng.integers(0, 2556, N_LINE).astype("timedelta64[D]"))}))

etypes = np.array(["view", "click", "purchase", "signup", "error"])
base24 = np.datetime64("2024-01-01T00:00:00.000000")
ts_us = np.sort(rng.integers(0, 30 * 86400 * 1_000_000, N_EVT))
w("events", pa.table({
    "event_id": pa.array(range(N_EVT), pa.int64()),
    "ts": pa.array(base24 + ts_us.astype("timedelta64[us]")),
    "user_id": pa.array(rng.integers(0, int(1500 * S), N_EVT), pa.int64()),
    "event_type": pa.array(etypes[rng.integers(0, 5, N_EVT)]),
    "value": np.round(rng.uniform(0, 500, N_EVT), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)]}))

# documents: bag-of-words over the same small vocab (near-dup-rich by
# construction, like the driver tier), ~0.3% exact-duplicate clones
vocab = np.array(("spark line column order small sort fast value scan hash slow group batch "
                  "query merge stream agg data row big a the vector customer window join part "
                  "filter table key").split())
langs = np.array(["en", "en", "en", "en", "de", "zh", "fr", "es"])  # en-heavy like sf0.1
texts, n_words = [], rng.integers(8, 105, N_DOC)
for i in range(N_DOC):
    texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words[i])]))
# exact-dup clones: distinct (a, b) with every doc touching at most ONE
# clone pair (targets AND sources tracked — a source picked later as a
# target would overwrite its text and silently break the earlier pair),
# so the realized dup rate matches the claimed ~0.3%
cloned, used = set(), set()
while len(cloned) < max(1, int(N_DOC * 0.003)):
    a, b = rng.choice(N_DOC, 2, replace=False)
    if a in used or b in used:
        continue
    texts[a] = texts[b]
    cloned.add(a)
    used.update((a, b))
w("documents", pa.table({
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": texts,
    "lang": pa.array(langs[rng.integers(0, len(langs), N_DOC)]),
    "source": [f"src{i % 20}" for i in rng.integers(0, 20, N_DOC)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# embeddings: 10 gaussian clusters on the 64-sphere (IVF/LSH structure)
centers = rng.normal(0, 1, (10, 64))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, 10, N_EMB)
vecs = centers[labels] + rng.normal(0, 0.35, (N_EMB, 64))
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
w("embeddings", pa.table({
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array([v for v in vecs.astype(np.float32)], pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32())}))

print("done:", OUT)
