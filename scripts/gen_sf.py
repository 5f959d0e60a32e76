#!/usr/bin/env python3
"""Dev-only local generator for LARGER scale factors (the r10 sf1 scaling
audit — PERF.md). NOT part of the engine, and NOT a replacement for the
driver's read-only /root/testdata: it bootstraps value distributions from
sf0.1 and regenerates keys at N x cardinality, so per-key scaling ratios are
measured on data with the same shape (domains, skew, dup rate) at 10x rows.

Usage: python3 scripts/gen_sf.py /tmp/sf1 10
"""
import sys, os, json, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(777)
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def boot(table, col, n):
    """Bootstrap n values from the empirical distribution of SRC col."""
    vals = con.sql(f"SELECT {col} FROM '{SRC}/{table}.parquet'").df()[col].to_numpy()
    return vals[rng.integers(0, len(vals), n)]

def write(name, cols, schema=None):
    t = pa.table(cols, schema=schema)
    pq.write_table(t, f"{OUT}/{name}.parquet")
    print(name, t.num_rows)

# region / nation: fixed dimensions — copy verbatim
for t in ("region", "nation"):
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(t, "copied")

nCust, nSupp, nPart, nOrd, nEvt, nDoc, nVec = (
    15000 * MULT, 1000 * MULT, 20000 * MULT, 150000 * MULT,
    100000 * MULT, 5000 * MULT, 2000 * MULT)

# customer
write("customer", {
    "c_custkey": pa.array(np.arange(nCust), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(nCust)],
    "c_nationkey": pa.array(rng.integers(0, 25, nCust), pa.int32()),
    "c_acctbal": np.round(boot("customer", "c_acctbal", nCust) + rng.normal(0, 1, nCust), 2),
    "c_mktsegment": boot("customer", "c_mktsegment", nCust),
})

# supplier
write("supplier", {
    "s_suppkey": pa.array(np.arange(nSupp), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(nSupp)],
    "s_nationkey": pa.array(rng.integers(0, 25, nSupp), pa.int32()),
    "s_acctbal": np.round(boot("supplier", "s_acctbal", nSupp) + rng.normal(0, 1, nSupp), 2),
})

# part
brands = con.sql(f"SELECT DISTINCT p_brand FROM '{SRC}/part.parquet'").df().p_brand.to_numpy()
types = con.sql(f"SELECT DISTINCT p_type FROM '{SRC}/part.parquet'").df().p_type.to_numpy()
vocab_df = con.sql(
    f"SELECT w, count(*) c FROM (SELECT unnest(string_split(p_name,' ')) w "
    f"FROM '{SRC}/part.parquet') GROUP BY w").df()
pnames = [" ".join(rng.choice(vocab_df.w.to_numpy(), 3, p=vocab_df.c / vocab_df.c.sum()))
          for _ in range(nPart)]
write("part", {
    "p_partkey": pa.array(np.arange(nPart), pa.int64()),
    "p_name": pnames,
    "p_brand": brands[rng.integers(0, len(brands), nPart)],
    "p_type": types[rng.integers(0, len(types), nPart)],
    "p_size": pa.array(rng.integers(1, 51, nPart), pa.int32()),
    "p_retailprice": np.round(boot("part", "p_retailprice", nPart) + rng.normal(0, 1, nPart), 2),
})

# orders
odates = (np.datetime64("1995-01-01") +
          rng.integers(0, 2404, nOrd).astype("timedelta64[D]")).astype("datetime64[us]")
write("orders", {
    "o_orderkey": pa.array(np.arange(nOrd), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, nCust, nOrd), pa.int64()),
    "o_orderstatus": boot("orders", "o_orderstatus", nOrd),
    "o_totalprice": np.round(boot("orders", "o_totalprice", nOrd) + rng.normal(0, 1, nOrd), 2),
    "o_orderdate": pa.array(odates, pa.timestamp("us")),
    "o_orderpriority": boot("orders", "o_orderpriority", nOrd),
})

# lineitem: ~4 lines per order
nLine = 600000 * MULT
lok = rng.integers(0, nOrd, nLine)
lok.sort()
ship = (odates[lok] + rng.integers(1, 90, nLine).astype("timedelta64[D]").astype(
    "timedelta64[us]"))
write("lineitem", {
    "l_orderkey": pa.array(lok, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, nPart, nLine), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, nSupp, nLine), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, nLine), pa.int32()),
    "l_quantity": rng.integers(1, 51, nLine).astype(float),
    "l_extendedprice": np.round(boot("lineitem", "l_extendedprice", nLine) + rng.normal(0, 1, nLine), 2),
    "l_discount": np.round(rng.integers(0, 11, nLine) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, nLine) / 100.0, 2),
    "l_returnflag": boot("lineitem", "l_returnflag", nLine),
    "l_linestatus": boot("lineitem", "l_linestatus", nLine),
    "l_shipdate": pa.array(ship, pa.timestamp("us")),
})

# events: same 30-day window, 10x users, 10x rows
ets = (np.datetime64("2024-01-01T00:00:00") +
       rng.integers(0, 30 * 86400 * 1000000, nEvt).astype("timedelta64[us]"))
ets.sort()
write("events", {
    "event_id": pa.array(np.arange(nEvt), pa.int64()),
    "ts": pa.array(ets, pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, 1500 * MULT, nEvt), pa.int64()),
    "event_type": boot("events", "event_type", nEvt),
    "value": np.round(boot("events", "value", nEvt) * np.exp(rng.normal(0, 0.05, nEvt)), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, nEvt)],
})

# documents: same vocab, empirical word distribution + length distribution,
# same ~0.16% exact-dup rate (the dedup keys' candidate density must scale
# with corpus size, not artificially explode)
wdf = con.sql(f"SELECT w, count(*) c FROM (SELECT unnest(string_split(text,' ')) w "
              f"FROM '{SRC}/documents.parquet') GROUP BY w").df()
words, wp = wdf.w.to_numpy(), (wdf.c / wdf.c.sum()).to_numpy()
lens = con.sql(f"SELECT len(string_split(text,' ')) l FROM '{SRC}/documents.parquet'").df().l.to_numpy()
lens = lens[rng.integers(0, len(lens), nDoc)]
flat = rng.choice(words, int(lens.sum()), p=wp)
texts, off = [], 0
for L in lens:
    texts.append(" ".join(flat[off:off + L])); off += L
ndup = max(1, nDoc // 600)
dup_to = rng.integers(0, nDoc, ndup); dup_from = rng.integers(0, nDoc, ndup)
for a, b in zip(dup_to, dup_from):
    texts[a] = texts[b]
langs = boot("documents", "lang", nDoc)
write("documents", {
    "doc_id": pa.array(np.arange(nDoc), pa.int64()),
    "text": texts,
    "lang": langs,
    "source": np.array([f"src{i}" for i in rng.integers(0, 20, nDoc)]),
    "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
})

# embeddings: elementwise bootstrap keeps the marginal distribution
pool = con.sql(f"SELECT unnest(embedding) x FROM '{SRC}/embeddings.parquet'").df().x.to_numpy()
emb = pool[rng.integers(0, len(pool), nVec * 64)].astype(np.float32).reshape(nVec, 64)
write("embeddings", {
    "vec_id": pa.array(np.arange(nVec), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, nVec), pa.int32()),
})
print("done ->", OUT)
