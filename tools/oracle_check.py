#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only, not
part of the shipped library): run graft.Verify at a given SF, then run
each oracle SQL in DuckDB over the same parquet tables and compare
row-count, schema (column names), and a hash of the value matrix with
columns sorted by name.

Usage: python3 tools/oracle_check.py [sfDir] [outDir]
"""
import sys, os, json, glob, hashlib, subprocess

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

import duckdb


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v == 0:
            v = 0.0  # -0.0 and 0.0 must hash identically
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(norm_cell(r[i]) for i in order).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def fresh_con():
    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    # DuckDB 1.0 leaks buffer-pool RESERVATION (not memory) across
    # repeated query executions on one connection; a 300+-oracle run
    # can spuriously hit the process memory_limit hundreds of queries
    # in. A fresh connection every 50 queries resets the accounting.
    con = fresh_con()
    n_run = 0

    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    for qdir in sorted(glob.glob(f"{OUT}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        n_run += 1
        if n_run % 50 == 0:
            con.close()
            con = fresh_con()
        sp = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        sp_cols = [d[0] for d in con.description]
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(sp)}"
            continue
        try:
            du = con.execute(oracles[name]).fetchall()
            du_cols = [d[0] for d in con.description]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        # The driver hashes pandas-stringified cells, so an int64 column on
        # one side vs float64 on the other ("1791" vs "1791.0") is a FAIL
        # even when values agree. DuckDB HUGEINT (sum of ints, count_if)
        # becomes float64 via pandas — oracles must CAST(... AS BIGINT).
        sp_pdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        du_pdf = con.execute(oracles[name]).df()
        kind = lambda df: {c: ("f" if str(df[c].dtype).startswith("float")
                               else "i" if str(df[c].dtype).startswith("int")
                               else "o") for c in df.columns}
        ks, kd = kind(sp_pdf), kind(du_pdf)
        numeric_kind_diff = [c for c in ks if c in kd and ks[c] != kd[c]
                             and "o" not in (ks[c], kd[c])]
        if sorted(sp_cols) != sorted(du_cols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(sp_cols)} duck={sorted(du_cols)}"
        elif numeric_kind_diff:
            results[name] = f"DTYPE_MISMATCH {[(c, ks[c], kd[c]) for c in numeric_kind_diff]}"
        elif len(sp) != len(du):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sp)} duck={len(du)}"
        elif frame_hash(sp_cols, sp) != frame_hash(du_cols, du):
            results[name] = "HASH_MISMATCH"
            # print first differing row for debugging
            order_s = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
            order_d = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
            for i, (a, b) in enumerate(zip(sp, du)):
                ra = [norm_cell(a[j]) for j in order_s]
                rb = [norm_cell(b[j]) for j in order_d]
                if ra != rb:
                    print(f"  [{name}] first diff row {i}:\n    spark={ra}\n    duck ={rb}")
                    break
        else:
            results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {n_ok}/{len([k for k in results if not results[k].startswith('ROWS_ONLY')])} oracled queries OK")


if __name__ == "__main__":
    main()
