#!/usr/bin/env python3
"""Synthesize a scale fixture from sf0.1 by unioning key-shifted copies.

Writes /tmp/graft_sf1/*.parquet (outside the repo; a local stress
fixture only — the driver's correctness gate stays on the provided
fixtures). Keys are shifted per copy so FK joins stay valid; document
text gets a per-copy suffix so exact-dup structure doesn't collapse.

Near-dup structure is BOUNDED: copies are grouped into dup-groups of
GROUP (=10) copies. Within a group, a doc's copies differ only by the
suffix (near-dups, same as the original 10x fixture); across groups,
text is Caesar-shifted per group and embedding signs are flipped by a
seeded per-(group,dim) pattern, so cross-group similarity collapses.
Without this, scaling K scales every dup CLUSTER to size K and pair
volume grows K^2 — a corpus where every document has K-1 near-twins,
which no real corpus resembles (real dup RATE is scale-invariant; a
100x corpus has 100x the clusters, not 100x-bigger clusters). Group 0
is unperturbed, so K<=10 output is identical to the pre-grouping
generator.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies] [--only=t1,t2]
(--only resumes an interrupted run by regenerating just those tables.)
"""
import sys
import os
import duckdb

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))
SRC = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.1"
DST = ARGS[1] if len(ARGS) > 1 else "/tmp/graft_sf1"
K = int(ARGS[2]) if len(ARGS) > 2 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
# A K-part UNION ALL nests K-deep in the parser; the default depth cap
# (1000) rejects K>=1000. Raise it — the union itself streams fine.
con.execute(f"SET max_expression_depth TO {max(2000, K * 2 + 100)}")
# Without these, COPY of a K=1000 union buffers output to preserve
# insertion order and balloons to ~100 GB RSS (observed OOM kill).
# Fixture row order is irrelevant: every consumer is order-agnostic
# and the oracle compares are order-free.
con.execute("SET preserve_insertion_order = false")
con.execute("SET memory_limit = '24GB'")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def copy_table(t, select_k):
    if ONLY is not None and t not in ONLY:
        print(f"{t}: skipped (--only)")
        return
    parts = " UNION ALL ".join(select_k(k) for k in range(K))
    con.execute(
        f"COPY ({parts}) TO '{DST}/{t}.parquet' (FORMAT PARQUET, "
        "COMPRESSION SNAPPY)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")


def plain(t):
    if ONLY is not None and t not in ONLY:
        print(f"{t}: skipped (--only)")
        return
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
GROUP = 10
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def shift_text(k):
    g = k // GROUP
    if g == 0:
        return f"text || ' c{k}'"
    lo = LOWER[g % 26:] + LOWER[:g % 26]
    up = lo.upper()
    return (f"translate(text, '{LOWER}{UPPER}', '{lo}{up}') || ' c{k}'")


PERM_PRIMES = [29, 31, 37, 41, 43, 47, 53, 59, 61]


def shift_vec(k):
    g = k // GROUP
    if g == 0:
        return "embedding"
    # Per-group dim permutation (i -> i*p mod D, p coprime to D) plus a
    # seeded +-1 sign flip per (group, dim). Sign flip alone leaves
    # cosine up to ~0.5 when vector energy concentrates in few dims
    # (measured on the sf0.1 embeddings); the permutation decorrelates
    # the energy profile so cross-group cosine collapses toward 0,
    # while within-group vectors stay exact duplicates.
    p = PERM_PRIMES[(g - 1) % len(PERM_PRIMES)]
    return ("list_transform(generate_series(1, len(embedding)), "
            f"i -> CAST(embedding[((i - 1) * {p}) % len(embedding) + 1]"
            f" * (CASE WHEN hash(i + {g} * 1000003)"
            " % 2 = 0 THEN 1 ELSE -1 END) AS FLOAT))")


copy_table("documents", lambda k:
    f"SELECT doc_id + {k*D} AS doc_id, "
    f"{shift_text(k)} AS text, "
    f"* EXCLUDE (doc_id, text) FROM {src('documents')}")
copy_table("embeddings", lambda k:
    f"SELECT vec_id + {k*V} AS vec_id, "
    f"{shift_vec(k)} AS embedding, "
    f"* EXCLUDE (vec_id, embedding) FROM {src('embeddings')}")
print("done ->", DST)
