#!/usr/bin/env python3
"""Build a ~sf1 bench corpus by replicating sf0.1 10x with key offsets.

Bench-only data (correctness still gates on the driver's sf0.01): the
goal is a 10x-larger input with REALISTIC output scaling, so:
- all join keys (order/cust/part/supp/event/doc/vec) shift by i*10M per
  replica, keeping every join relation intact and q46's %10/%1000 chain
  arithmetic pattern-identical per replica;
- document words get a per-replica suffix (replica 0 untouched), so
  near-dup relations replicate within replicas instead of multiplying
  quadratically across them (a real 10x corpus has ~10x the dup pairs,
  not 100x);
- embedding labels shift per replica for the same reason (d25 blocks
  stay constant-size, 10x the count); the label step is derived from
  max(label)+1 of the source table so replicas can never share a label
  regardless of the source label domain (ADVICE r4);
- dims fixed at every SF (nation/region) are copied as-is.

Caveat (bench-only): documents.lang ground truth is NOT updated after
per-replica word suffixing, so t28's `correct` column is meaningless on
replicas > 0 — t28 bench times remain representative (same work), but
accuracy read-offs on this corpus are not.

pyarrow preserves physical parquet types (events.ts stays TIMESTAMP_NS,
the type the Spark loaders and oracles are written against).
"""
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("GRAFT_SF_DST", "/root/repo/benchdata/sf1")
R = int(os.environ.get("GRAFT_SF_REPLICAS", "10"))
OFF = 10_000_000

os.makedirs(DST, exist_ok=True)


def shift(t, col, i, step=OFF):
    idx = t.schema.get_field_index(col)
    f = t.schema.field(col)
    shifted = pc.add(t.column(col), i * step).cast(f.type)
    return t.set_column(idx, f, shifted)


def rep(name, keycols, custom=None):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    outs = []
    for i in range(R):
        tt = t
        for c in keycols:
            tt = shift(tt, c, i)
        if custom:
            tt = custom(tt, i)
        outs.append(tt)
    out = pa.concat_tables(outs)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def doc_text(t, i):
    if i == 0:
        return t
    texts = [" ".join(f"{w}~{i}" for w in s.split(" ")) if s is not None else None
             for s in t.column("text").to_pylist()]
    arr = pa.array(texts, type=pa.string())
    t = t.set_column(t.schema.get_field_index("text"), t.schema.field("text"), arr)
    n = pa.array([len(s) if s is not None else None for s in texts], type=pa.int64())
    return t.set_column(t.schema.get_field_index("n_chars"), t.schema.field("n_chars"), n)


_label_step = None


def emb_label(t, i):
    # step = max(label)+1 of the SOURCE table, so replica label spaces are
    # disjoint for any label domain (a hardcoded step silently merged
    # blocks across replicas when the domain grew — ADVICE r4)
    global _label_step
    if _label_step is None:
        _label_step = pc.max(t.column("label")).as_py() + 1
    return shift(t, "label", i, step=_label_step)


rep("orders", ["o_orderkey", "o_custkey"])
rep("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
rep("customer", ["c_custkey"])
rep("part", ["p_partkey"])
rep("supplier", ["s_suppkey"])
rep("events", ["event_id", "user_id"])
rep("documents", ["doc_id"], custom=doc_text)
rep("embeddings", ["vec_id"], custom=emb_label)
for dim in ("nation", "region"):
    pq.write_table(pq.read_table(f"{SRC}/{dim}.parquet"), f"{DST}/{dim}.parquet")
    print(f"{dim}: copied")
