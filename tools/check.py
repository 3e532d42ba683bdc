#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each SparkEntry query's parquet dump (produced by `graft.Verify`)
against its DuckDB oracle on the same fixture tables, comparing like the
driver does: columns sorted by name, rows sorted, values hashed.

Usage:
  python3 tools/check.py [sfdir] [--skip-verify] [--only q01,q02]
                         [--out /tmp/graft_verify]
"""
import json
import sys
import glob
import os
import subprocess

import duckdb
import pandas as pd
import numpy as np

SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify"
ONLY = None
TIMEOUT = None  # per-oracle wall seconds (--timeout=N); None = unbounded
for i, a in enumerate(sys.argv):
    if a.startswith("--only="):
        ONLY = a.split("=", 1)[1].split(",")
    elif a == "--only" and i + 1 < len(sys.argv):
        ONLY = sys.argv[i + 1].split(",")
    elif a.startswith("--out="):
        OUT = a.split("=", 1)[1]
    elif a.startswith("--timeout="):
        TIMEOUT = float(a.split("=", 1)[1])

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

con = duckdb.connect()
# Stress-fixture oracles (combinatorial CTEs at the 100x fixture) can
# otherwise spill unboundedly: one d12 run filled the disk through
# DuckDB's cwd-relative .tmp and took the box (and the concurrently
# running test JVM) down with it. Cap memory, point spill at a
# dedicated dir, and let the per-oracle --timeout do the rest.
os.makedirs("/tmp/duckdb_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
# Row order is irrelevant (canon() sorts before hashing), and order
# preservation is not free: with an ORDER BY + corpus-sized string
# aggregates (t29's 500 MB token_ids column at the 100x fixture) this
# DuckDB build wedged HARD mid-materialization — zero CPU for 45+
# minutes, con.interrupt() ineffective — while the identical query
# with preserve_insertion_order=false completes in 43 s.
con.execute("SET preserve_insertion_order=false")
con.execute(
    f"SET memory_limit='{os.environ.get('GRAFT_ORACLE_MEM', '32GB')}'")
# Optional thread cap: fewer threads = less concurrent operator state
# (the t29 decade oracle OOMs at full width under a 100 GB limit), and
# it also lets a long oracle coexist with a JVM run without contending
# for every core.
if os.environ.get("GRAFT_ORACLE_THREADS"):
    con.execute(
        f"SET threads={int(os.environ['GRAFT_ORACLE_THREADS'])}")
for f in glob.glob(f"{SFDIR}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# Per-query comparator modes (SparkEntry.comparators, dumped by Verify
# as comparators.json; absent for older dumps). Supported modes:
#   "hashsum" — compare COUNT + an order-free SUM(hash(row))::HUGEINT
#     computed INSIDE DuckDB on both sides, never materializing either
#     result into pandas. This is the giant-string-output comparator:
#     t29's 500 MB token_ids column at the 100x fixture segfaults the
#     pandas leg (no-swap box, Arrow copies) while the hash-sum compare
#     runs in seconds. Strength: exact row multiset equality up to
#     64-bit hash collisions — strictly stronger than rowcount, and in
#     practice equivalent to the full compare (both engines must
#     produce bit-identical values for the sums to agree).
# CLI override: --hashsum q1,q2 adds modes without a redump.
COMPARATORS = {}
if os.path.exists(f"{OUT}/comparators.json"):
    COMPARATORS.update(json.load(open(f"{OUT}/comparators.json")))
for i, a in enumerate(sys.argv):
    if a.startswith("--hashsum="):
        for qn in a.split("=", 1)[1].split(","):
            COMPARATORS[qn] = "hashsum"


def compare_hashsum(name: str):
    """count + sum(hash(*))::HUGEINT on both sides, inside DuckDB."""
    files = f"{OUT}/{name}/*.parquet"
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{files}')").fetchall()]
    dcols = [r[0] for r in con.execute(
        f"DESCRIBE {oracle[name]}").fetchall()]
    if sorted(cols) != sorted(dcols):
        return ("SCHEMA-MISMATCH",
                f"spark={sorted(cols)} duck={sorted(dcols)}")
    collist = ", ".join(f'"{c}"' for c in sorted(cols))
    agg = (f"SELECT count(*) AS n, "
           f"coalesce(sum(hash({collist})::HUGEINT), 0) AS h")
    sn, sh = con.execute(
        f"{agg} FROM read_parquet('{files}')").fetchone()
    dn, dh = con.execute(f"{agg} FROM ({oracle[name]})").fetchone()
    if sn != dn:
        return ("ROWCOUNT-MISMATCH", f"spark={sn} duck={dn}")
    if sh != dh:
        return ("HASHSUM-MISMATCH", f"spark={sh} duck={dh}")
    return ("OK-HASHSUM", f"{sn} rows, hash-sums equal")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str):
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        return ("MISSING-SPARK", "no parquet written")
    if name in oracle and COMPARATORS.get(name) == "hashsum":
        try:
            if TIMEOUT:
                import threading
                timer = threading.Timer(TIMEOUT, con.interrupt)
                timer.start()
                try:
                    return compare_hashsum(name)
                finally:
                    timer.cancel()
            return compare_hashsum(name)
        except KeyboardInterrupt:
            return ("ORACLE-TIMEOUT", f">{TIMEOUT}s")
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            if "INTERRUPT" in msg.upper():
                return ("ORACLE-TIMEOUT", f">{TIMEOUT}s")
            return ("ORACLE-ERROR", msg)
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files],
                    ignore_index=True)
    if name not in oracle:
        return ("ROWS-ONLY", f"{len(sdf)} rows (no oracle)")
    try:
        if TIMEOUT:
            # Combinatorial oracles on big stress fixtures must not hang
            # the sweep: a watchdog interrupts DuckDB mid-query.
            import threading
            timer = threading.Timer(TIMEOUT, con.interrupt)
            timer.start()
            try:
                ddf = con.execute(oracle[name]).df()
            finally:
                timer.cancel()
        else:
            ddf = con.execute(oracle[name]).df()
    except KeyboardInterrupt:
        return ("ORACLE-TIMEOUT", f">{TIMEOUT}s")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        if "INTERRUPT" in msg.upper():
            return ("ORACLE-TIMEOUT", f">{TIMEOUT}s")
        return ("ORACLE-ERROR", msg)
    s, d = canon(sdf), canon(ddf)
    if list(s.columns) != list(d.columns):
        return ("SCHEMA-MISMATCH", f"spark={list(s.columns)} duck={list(d.columns)}")
    if len(s) != len(d):
        return ("ROWCOUNT-MISMATCH", f"spark={len(s)} duck={len(d)}")
    exact = True
    for c in s.columns:
        a, b = s[c].values, d[c].values
        # DuckDB HUGEINT (sum/`//` over ints) lands as float64 while
        # Spark emits int64; the driver stringifies them differently
        # ("3.0" vs "3") -> hash mismatch even with equal values. Flag
        # any int-vs-float column pairing as a type gap.
        if {a.dtype.kind, b.dtype.kind} & {"i", "u"} and \
                {a.dtype.kind, b.dtype.kind} & {"f"}:
            return ("TYPE-MISMATCH",
                    f"col {c}: spark={a.dtype} duck={b.dtype} "
                    "(HUGEINT? cast oracle ::BIGINT)")
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(float)
            bf = b.astype(float)
            both_nan = pd.isna(af) & pd.isna(bf)
            eq = np.isclose(af, bf, rtol=0, atol=0, equal_nan=True)
            if not (eq | both_nan).all():
                close = np.isclose(af, bf, rtol=1e-9, equal_nan=True)
                if (close | both_nan).all():
                    return ("FLOAT-DRIFT", f"col {c} close but not exact")
                i = int(np.argmin(eq | both_nan))
                return ("VALUE-MISMATCH",
                        f"col {c} row {i}: spark={af[i]!r} duck={bf[i]!r}")
        else:
            av = pd.Series(a).astype(str).values
            bv = pd.Series(b).astype(str).values
            if not (av == bv).all():
                i = int(np.argmin(av == bv))
                return ("VALUE-MISMATCH",
                        f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}")
    return ("OK", f"{len(s)} rows")


names = set(json.load(open(f"{OUT}/oracle_sql.json")).keys()) \
    | {os.path.basename(p) for p in glob.glob(f"{OUT}/*")
       if os.path.isdir(p)}
qlist = f"{OUT}/queries.json"
if os.path.exists(qlist):
    names |= set(json.load(open(qlist)))
names = sorted(names)
fails = 0
import time
for name in names:
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    status, detail = compare(name)
    dt = time.time() - t0
    flag = "✓" if status in ("OK", "OK-HASHSUM", "ROWS-ONLY") else "✗"
    if flag == "✗":
        fails += 1
    print(f"{flag} {name:24s} {status:18s} {detail}  [{dt:.1f}s]",
          flush=True)
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
