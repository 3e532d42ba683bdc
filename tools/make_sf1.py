#!/usr/bin/env python3
"""Synthesize a ~10x fixture from sf0.1 by unioning key-shifted copies.

Writes /tmp/graft_sf1/*.parquet (outside the repo; a local stress
fixture only — the driver's correctness gate stays on the provided
fixtures). Keys are shifted per copy so FK joins stay valid; document
text gets a per-copy suffix so exact-dup structure doesn't collapse.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies]
"""
import sys
import os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def copy_table(t, select_k):
    parts = " UNION ALL ".join(select_k(k) for k in range(K))
    con.execute(
        f"COPY ({parts}) TO '{DST}/{t}.parquet' (FORMAT PARQUET, "
        "COMPRESSION SNAPPY)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")


def plain(t):
    con.execute(
        f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' "
        "(FORMAT PARQUET, COMPRESSION SNAPPY)")
    print(f"{t}: copied")


O = con.execute(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()[0]
C = con.execute(f"SELECT max(c_custkey)+1 FROM {src('customer')}").fetchone()[0]
E = con.execute(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]
U = con.execute(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()[0]
D = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
V = con.execute(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]

for t in ("region", "nation", "supplier", "part"):
    plain(t)

copy_table("customer", lambda k:
    f"SELECT c_custkey + {k*C} AS c_custkey, * EXCLUDE (c_custkey) "
    f"FROM {src('customer')}")
copy_table("orders", lambda k:
    f"SELECT o_orderkey + {k*O} AS o_orderkey, "
    f"o_custkey + {k*C} AS o_custkey, "
    f"* EXCLUDE (o_orderkey, o_custkey) FROM {src('orders')}")
copy_table("lineitem", lambda k:
    f"SELECT l_orderkey + {k*O} AS l_orderkey, "
    f"* EXCLUDE (l_orderkey) FROM {src('lineitem')}")
copy_table("events", lambda k:
    f"SELECT event_id + {k*E} AS event_id, "
    f"user_id + {k*U} AS user_id, "
    f"* EXCLUDE (event_id, user_id) FROM {src('events')}")
copy_table("documents", lambda k:
    f"SELECT doc_id + {k*D} AS doc_id, "
    f"text || ' c{k}' AS text, "
    f"* EXCLUDE (doc_id, text) FROM {src('documents')}")
copy_table("embeddings", lambda k:
    f"SELECT vec_id + {k*V} AS vec_id, "
    f"* EXCLUDE (vec_id) FROM {src('embeddings')}")
print("done ->", DST)
