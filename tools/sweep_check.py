#!/usr/bin/env python3
"""Whole-surface replay sweep with per-row isolation — the SCALE10
harness behind the sf1 hash-replay tables.

Same comparison as tools/check.py (row count, sorted column names,
sorted-rows value hash with floats via repr(round(.., 9))), but each
row's oracle runs in its OWN child process under a wall-clock budget,
so one expensive DuckDB reconstruction can neither stall the sweep nor
take the parent down with an OOM. Emits one JSON line per row and a
final summary.

Usage: python3 tools/sweep_check.py <sfDir> <outDir> [timeoutSec] [names...]
"""
import json
import math
import multiprocessing as mp
import os
import sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def table_hash(cols, rows):
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def check_one(sf_dir, out_dir, name, sql, q):
    import duckdb
    try:
        con = duckdb.connect()
        con.execute("SET temp_directory='/tmp/duck_spill'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        g_rows, g_cols = got.fetchall(), [c[0] for c in got.description]
        rel = con.sql(sql)
        # same exotic-type discipline as check.py: HUGEINT/DECIMAL
        # stringify differently under the driver's comparator
        exotic = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                  if str(t) in ("HUGEINT", "UHUGEINT")
                  or str(t).startswith("DECIMAL")]
        exp = con.execute(sql)
        w_rows, w_cols = exp.fetchall(), [c[0] for c in exp.description]
        res = {
            "name": name,
            "rows_match": len(g_rows) == len(w_rows),
            "schema_match": sorted(g_cols) == sorted(w_cols),
            "hash_match": not exotic and
                table_hash(g_cols, g_rows) == table_hash(w_cols, w_rows),
            "spark_rows": len(g_rows), "oracle_rows": len(w_rows),
        }
        if exotic:
            res["err"] = f"exotic oracle column types {exotic}"
    except Exception as e:
        res = {"name": name, "rows_match": False, "schema_match": False,
               "hash_match": False, "err": str(e)[:200]}
    q.put(res)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sys.argv[4:] or sorted(
        d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    ok = fail = 0
    failures = []
    for name in names:
        if name not in oracle:
            print(json.dumps({"name": name, "skipped": "no oracle"}))
            continue
        q = mp.Queue()
        p = mp.Process(target=check_one,
                       args=(sf_dir, out_dir, name, oracle[name], q))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            res = {"name": name, "hash_match": False,
                   "err": f"oracle exceeded {budget}s budget"}
        else:
            res = q.get() if not q.empty() else {
                "name": name, "hash_match": False, "err": "child died"}
        print(json.dumps(res), flush=True)
        if res.get("hash_match"):
            ok += 1
        else:
            fail += 1
            failures.append(name)
    print(f"SUMMARY: {ok} ok, {fail} failed", flush=True)
    if failures:
        print("FAILED: " + " ".join(failures), flush=True)
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
