#!/usr/bin/env python3
"""Generate tier-bound literal-pin oracles from an engine dump.

Reads `graft.Verify` output dirs (one parquet dir per query) and emits
each result as a `SELECT ... FROM (VALUES ...)` DuckDB oracle — the
same reproducibility-pin pattern as GeneratedOracles.scala, but bound
to whatever tier the dump was produced at. Output is a tab-separated
resource (`name\\tbase64(sql)` per line) so the Scala side needs no
JSON parser and the SQL needs no escaping.

Usage: python3 tools/gen_pins.py <dumpDir> <outResource> <name> [name..]
"""
import base64
import math
import sys

import duckdb

TYPE_CAST = {
    "BIGINT": "BIGINT", "INTEGER": "INT", "SMALLINT": "INT",
    "DOUBLE": "DOUBLE", "FLOAT": "DOUBLE",
    "BOOLEAN": "BOOLEAN", "VARCHAR": "VARCHAR",
}


def render(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        # string round-trip keeps the exact double (a bare numeric
        # literal would parse as DECIMAL first)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise SystemExit(f"unsupported value type: {type(v)} ({v!r})")


def pin_sql(con, path):
    desc = con.execute(f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()
    cols = [(c[0], c[1]) for c in desc]
    for name, typ in cols:
        if typ not in TYPE_CAST:
            raise SystemExit(f"{path}: unsupported column type {typ}")
    rows = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchall()
    if not rows:
        raise SystemExit(f"{path}: empty result, refusing to pin")
    tuples = ", ".join(
        "(" + ", ".join(render(v) for v in r) + ")" for r in rows)
    sel = ", ".join(
        f'CAST("{n}" AS {TYPE_CAST[t]}) AS "{n}"' for n, t in cols)
    names = ", ".join(f'"{n}"' for n, _ in cols)
    return f"SELECT {sel} FROM (VALUES {tuples}) AS t({names})"


def main():
    dump, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    lines = []
    for name in sorted(names):
        sql = pin_sql(con, f"{dump}/{name}")
        b64 = base64.b64encode(sql.encode()).decode()
        lines.append(f"{name}\t{b64}")
        print(f"  pinned {name}: {len(sql)} chars")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} pins to {out}")


if __name__ == "__main__":
    main()
