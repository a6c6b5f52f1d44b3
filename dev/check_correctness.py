#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 dev/check_correctness.py [sfdir] [outdir]

Runs each oracle_sql.json entry in DuckDB over the same parquet tables and
compares with the Verify parquet dumps: schema (column names), row count, and
a hash over column-name-sorted, row-sorted values. Run graft.Verify first:

  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        # repr of float64 is exact; bitwise equality expected
        return repr(v)
    return repr(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # A query that crashed in Verify leaves its PREVIOUS run's dump behind
    # when outdir is reused — the compare would then "pass" on stale data
    # (observed: 59 crashed queries masked by a warm outdir). _errors.json
    # is authoritative for crashes; count every entry as a failure.
    err_path = f"{outdir}/_errors.json"
    if os.path.exists(err_path):
        errs = json.load(open(err_path))
        for name, msg in sorted(errs.items()):
            print(f"FAIL {name}: crashed in Verify: {msg[:120]}")
            n_fail += 1
            oracles.pop(name, None)
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            tb = pq.read_table(files[0])
            scols = [c.lower() for c in tb.column_names]
            srows = [tuple(r.values()) for r in tb.to_pylist()]
            res = con.sql(sql)
            ocols = [c.lower() for c in res.columns]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        msgs = []
        if sorted(scols) != sorted(ocols):
            msgs.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            msgs.append(f"rows {len(srows)} vs {len(orows)}")
        if not msgs and table_hash(scols, srows) != table_hash(ocols, orows):
            msgs.append("hash mismatch")
            # show a sample diff
            sset = {tuple(map(norm_cell, r)) for r in srows}
            oset = {tuple(map(norm_cell, r)) for r in orows}
            only_s = list(sset - oset)[:2]
            only_o = list(oset - sset)[:2]
            msgs.append(f"spark-only={only_s} oracle-only={only_o}")
        if msgs:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
