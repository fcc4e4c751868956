#!/usr/bin/env python3
"""Local dev-loop mirror of the driver's correctness gate (t2).

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"` has dumped each
declared query's result to parquet + oracle_sql.json. For every query:
run the oracle SQL in DuckDB over the same parquet tables, then compare
row count, sorted column names, and a hash of all values with columns
sorted by name and rows sorted by all columns (stringified, floats via
repr of round(.., 9)).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, hashlib, math, os

import duckdb

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
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    declared = [d for d in sorted(os.listdir(out_dir))
                if os.path.isdir(f"{out_dir}/{d}")]
    ok = fail = 0
    for name in declared:
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        g_rows, g_cols = got.fetchall(), [c[0] for c in got.description]
        if name not in oracle:
            print(f"  {name}: rows-only check, {len(g_rows)} rows "
                  f"{'OK' if g_rows else 'EMPTY (suspicious)'}")
            continue
        try:
            rel = con.sql(oracle[name])
            # Exotic DuckDB types (HUGEINT from sum(BIGINT), DECIMAL from
            # numeric literals) stringify differently from Spark's BIGINT/
            # DOUBLE under the driver's comparator even when values are
            # equal — treat them as failures so they never reach the driver.
            exotic = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                      if str(t) in ("HUGEINT", "UHUGEINT")
                      or str(t).startswith("DECIMAL")]
            exp = con.execute(oracle[name])
            e_rows, e_cols = exp.fetchall(), [c[0] for c in exp.description]
        except Exception as ex:
            print(f"✗ {name}: oracle SQL failed: {ex}")
            fail += 1
            continue
        problems = []
        if exotic:
            problems.append(f"exotic oracle column types {exotic} — "
                            "CAST to BIGINT/DOUBLE in the oracle SQL")
        if sorted(g_cols) != sorted(e_cols):
            problems.append(f"schema spark={sorted(g_cols)} duck={sorted(e_cols)}")
        if len(g_rows) != len(e_rows):
            problems.append(f"rowcount spark={len(g_rows)} duck={len(e_rows)}")
        if not problems and table_hash(g_cols, g_rows) != table_hash(e_cols, e_rows):
            problems.append("value-hash mismatch")
            gl = sorted("|".join(norm_cell(r[i]) for i in
                        sorted(range(len(g_cols)), key=lambda i: g_cols[i]))
                        for r in g_rows)
            el = sorted("|".join(norm_cell(r[i]) for i in
                        sorted(range(len(e_cols)), key=lambda i: e_cols[i]))
                        for r in e_rows)
            diffs = [(a, b) for a, b in zip(gl, el) if a != b][:3]
            for a, b in diffs:
                problems.append(f"  spark: {a[:120]}\n   duck: {b[:120]}")
        if problems:
            print(f"✗ {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"✓ {name}: {len(g_rows)} rows match")
            ok += 1
    missing = set(oracle) - set(declared)
    if missing:
        print(f"! oracle entries with no parquet output: {missing}")
    print(f"{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
